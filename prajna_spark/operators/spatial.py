"""Grid-bucketed spatial (2-D range) join.

The 2-D generalization of :mod:`prajna_spark.operators.rangejoin`'s
bin-quantized 1-D interval join: find all point pairs within radius
``r`` WITHOUT the all-pairs cross join. Each point hashes to a square
grid cell of side ``r``; a pair within ``r`` must then lie in the same
or an adjacent cell, so ONE side expands to its 3x3 cell neighborhood
(a 9-row explode — constant fan-out) and the candidate join is a plain
equi-join on the cell id. Candidates per point are bounded by local
density, never by corpus size, and the shuffle key is the narrow cell
id — the standard scalable decomposition for spatial joins.

Determinism/portability: distances use a PLANAR small-region metric —
x = dlon * KM_PER_DEG_LON, y = dlat * KM_PER_DEG_LAT with fixed literal
constants — i.e. pure IEEE multiply/add/compare (plus one correctly-
rounded sqrt for the reported km), so Spark and DuckDB agree BIT-FOR-BIT
including at the radius boundary. (Haversine's sin/cos are NOT
correctly-rounded in either engine's libm, which could flip boundary
pairs across engines; at city scale the planar metric is the standard
approximation anyway.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import pround

#: km per degree of latitude, and of longitude at ~38N (fixed literals —
#: part of the metric's definition, not computed).
KM_PER_DEG_LAT = 111.32
KM_PER_DEG_LON = 87.62


def within_radius_pairs(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    dec: int = 6,
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (planar metric).

    Returns (id_i, id_j, dist_km) with id_i < id_j. Left side expands
    to its 3x3 neighbor cells; right side keeps its home cell; each
    near pair is found exactly once (a point has ONE home cell), so no
    post-join dedup is needed.
    """
    r = float(radius_km)
    x = F.col(lon_col) * F.lit(KM_PER_DEG_LON)
    y = F.col(lat_col) * F.lit(KM_PER_DEG_LAT)
    # Cells come from per-point scaled coords (any association is fine —
    # cells only gate candidates); the DISTANCE below is computed as
    # (lat_i - lat_j) * K so its association matches the oracle exactly
    # (lat_i*K - lat_j*K would NOT be bit-identical: fp distributivity).
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
        F.floor(x / F.lit(r)).cast("long").alias("_cx"),
        F.floor(y / F.lit(r)).cast("long").alias("_cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = base.select(
        F.col("_id").alias("id_i"),
        F.col("_lat").alias("_lati"),
        F.col("_lon").alias("_loni"),
        F.explode(offsets).alias("_o"),
        "_cx",
        "_cy",
    ).select(
        "id_i",
        "_lati",
        "_loni",
        (F.col("_cx") + F.col("_o.dx")).alias("_jcx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_jcy"),
    )
    right = base.select(
        F.col("_id").alias("id_j"),
        F.col("_lat").alias("_latj"),
        F.col("_lon").alias("_lonj"),
        F.col("_cx").alias("_jcx"),
        F.col("_cy").alias("_jcy"),
    )
    dx = (F.col("_loni") - F.col("_lonj")) * F.lit(KM_PER_DEG_LON)
    dy = (F.col("_lati") - F.col("_latj")) * F.lit(KM_PER_DEG_LAT)
    d2 = dx * dx + dy * dy
    return (
        left.join(right, ["_jcx", "_jcy"])
        .where(F.col("id_i") < F.col("id_j"))
        .where(d2 <= F.lit(r * r))
        .select(
            "id_i",
            "id_j",
            pround(F.sqrt(d2), dec).alias("dist_km"),
        )
    )


def planar_pairs_sql(
    points_rel: str, radius_km: float, dec: int = 6
) -> str:
    """Oracle twin over a relation producing (id, lat, lon): the naive
    all-pairs spelling of the SAME metric (different plan, same result —
    which is exactly what an oracle should be)."""
    from prajna_spark.functions.rounding import R

    r2 = f"{float(radius_km) * float(radius_km)!r}e0"
    kx, ky = f"{KM_PER_DEG_LON!r}e0", f"{KM_PER_DEG_LAT!r}e0"
    dx = f"((a.lon - b.lon) * {kx})"
    dy = f"((a.lat - b.lat) * {ky})"
    d2 = f"({dx} * {dx} + {dy} * {dy})"
    return f"""(
      SELECT a.id AS id_i, b.id AS id_j,
             {R(f"sqrt({d2})", dec)} AS dist_km
      FROM {points_rel} a JOIN {points_rel} b ON a.id < b.id
      WHERE {d2} <= {r2}
    )"""
