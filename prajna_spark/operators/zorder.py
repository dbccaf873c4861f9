"""Z-order (Morton) clustering — multi-dimensional data-skipping layout.

A parquet scan skips row groups whose min/max stats exclude the filter.
Sorting by ONE column localizes that column only; interleaving the bits
of SEVERAL columns' bucket ranks (the Morton curve) localizes ALL of
them at once, so point/range filters on ANY clustered column prune
files — the layout optimization behind Delta/Iceberg's OPTIMIZE ZORDER,
provided here as a plain-DataFrame operator.

Everything is JVM column expressions: per-column linear bucketing from a
one-row min/max aggregate (broadcast), bit interleaving as a sum of
shift/mask terms (constant-folded expression tree, ~bits×cols terms),
then ``repartitionByRange`` + ``sortWithinPartitions`` on the key so
each output file covers a compact Morton range. Cost: one tiny stats
job + one range shuffle — same as any global sort, amortized over every
future scan.

No reference equivalent (Prajna's binSort is single-key,
`src/CoreLib/DKV.fs` bin-sort tier); this is a storage-layout upgrade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _surrogate(col: Column, dtype: str) -> Column:
    """A double-valued, order-preserving stand-in for any clusterable
    column type — the min/max bucketing below needs subtraction and
    division, which raw string/date/timestamp columns reject at analysis
    time:

    - numerics pass through (cast to double);
    - date -> days since epoch; timestamp(/_ntz) -> micros since epoch;
    - string -> the first 8 bytes as a big-endian integer, left-padded
      to fixed width with NUL so shorter strings order exactly like
      byte-wise comparison of their padded prefix (variable-width
      prefixes would NOT preserve order: 'ab' > 'b' numerically). Values
      sharing an 8-byte prefix land in the same bucket — locality, not
      total order, which is all a Z-curve needs.

    NULLs stay NULL; _bucket coalesces them to the curve origin."""
    if dtype == "date":
        return F.unix_date(col).cast("double")
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if dtype == "string":
        return F.conv(F.hex(F.rpad(col, 8, "\x00")), 16, 10).cast("double")
    return col.cast("double")


def _bucket(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Linear rank bucket in [0, 2^bits): floor((v-min)/(max-min+eps)*2^bits),
    null -> 0 (nulls cluster together at the curve origin)."""
    n = F.lit(float(2**bits))
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    b = F.floor(frac * n).cast("long")
    return F.coalesce(F.least(b, F.lit(2**bits - 1)), F.lit(0))


def morton_key(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each bucket column into one long.
    Bit i of column j lands at position i*len(buckets)+j — a pure
    shift/mask expression sum, no UDF."""
    ncols = len(buckets)
    terms = []
    for j, b in enumerate(buckets):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Return ``df`` clustered on the Morton curve of ``cols`` — write
    the result with ``.write.parquet`` and every clustered column's
    min/max tightens per file. ``bits`` bounds curve resolution
    (bits*len(cols) <= 62); ``num_files`` sets the range-partition count
    (default: current shuffle partitions). Numeric, string, date, and
    timestamp columns are all clusterable (non-numerics go through an
    order-preserving numeric surrogate — see :func:`_surrogate`)."""
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a long (<= 62)")
    dtypes = dict(df.dtypes)
    surr = {c: _surrogate(F.col(c), dtypes[c]) for c in cols}
    stats = df.agg(
        *[F.min(surr[c]).alias(f"__min_{c}") for c in cols],
        *[F.max(surr[c]).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.join(F.broadcast(stats))
    buckets = [
        _bucket(
            _surrogate(F.col(c), dtypes[c]),
            F.col(f"__min_{c}"),
            F.col(f"__max_{c}"),
            bits,
        )
        for c in cols
    ]
    keyed = with_stats.withColumn("__z", morton_key(buckets, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    parts = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
