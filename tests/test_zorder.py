"""operators.zorder — Morton clustering tightens per-file min/max on
EVERY clustered column (the data-skipping property), unlike a
single-column sort."""

from __future__ import annotations

import glob
import statistics

from pyspark.sql import functions as F

from prajna_spark.operators.zorder import morton_key, zorder


def _rel_spans(spark, path, gspan):
    out = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min("l_partkey"), F.max("l_partkey"),
            F.min("l_suppkey"), F.max("l_suppkey"),
        ).first()
        out.append(((r[1] - r[0]) / gspan[0], (r[3] - r[2]) / gspan[1]))
    return out


def test_zorder_localizes_all_columns(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    g = li.agg(
        F.max("l_partkey") - F.min("l_partkey"),
        F.max("l_suppkey") - F.min("l_suppkey"),
    ).first()

    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    zorder(li, ["l_partkey", "l_suppkey"], bits=8, num_files=8).write.parquet(zpath)
    li.repartitionByRange(8, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(spath)

    z = _rel_spans(spark, zpath, g)
    s = _rel_spans(spark, spath, g)
    # measured at sf0.01: zorder ~(0.50, 0.32); partkey-sort ~(0.13, 1.0)
    assert statistics.median(a for a, _ in z) <= 0.7
    assert statistics.median(b for _, b in z) <= 0.7
    assert statistics.median(b for _, b in s) >= 0.9  # single sort can't

    # layout only — row multiset unchanged
    assert sorted(map(tuple, spark.read.parquet(zpath).collect())) == sorted(
        map(tuple, li.collect())
    )


def test_morton_key_interleaves(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(
        morton_key([F.col("a"), F.col("b")], bits=3).alias("z")
    ).first()["z"]
    # a bits -> even positions (j=0), b bits -> odd: a=101, b=011
    # z = sum: a0<<0, b0<<1, a1<<2, b1<<3, a2<<4, b2<<5
    want = (1 << 0) + (1 << 1) + (0 << 2) + (1 << 3) + (1 << 4) + (0 << 5)
    assert got == want


def test_zorder_rejects_overflow(spark):
    import pytest

    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        zorder(df, ["a", "b"], bits=32)


def test_zorder_skips_files_on_either_column(spark, sf_dir, tmp_path):
    """The payoff test: a point-range filter on EITHER clustered column
    touches a fraction of the z-ordered files (files producing rows,
    via input_file_name), while a random layout touches ~all of them."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    zorder(li, ["l_partkey", "l_suppkey"], bits=8, num_files=8).write.parquet(zpath)
    li.repartition(8).write.parquet(rpath)

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .where(cond)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    # ~2-5% slices of each key's observed range (data-size independent)
    pk_hi = b[0] + max(1, (b[1] - b[0]) // 50)
    sk_hi = b[2] + max(1, (b[3] - b[2]) // 20)
    for cond in [
        f"l_partkey BETWEEN {b[0]} AND {pk_hi}",
        f"l_suppkey BETWEEN {b[2]} AND {sk_hi}",
    ]:
        z = files_touched(zpath, cond)
        r = files_touched(rpath, cond)
        assert r >= 7, (cond, r)  # random layout: essentially all files
        # z-order: materially fewer on EITHER column (exact count varies
        # with range-sampler quantization at tiny fixtures; 8-file 2-d
        # curve ideal is ~3)
        assert z <= 5 and z <= r - 3, (cond, z, r)


def test_zorder_supports_string_date_timestamp_columns(spark):
    """Non-numeric clustered columns go through order-preserving numeric
    surrogates — previously (cmax - cmin) rejected them at analysis time."""
    from pyspark.sql import functions as F

    from prajna_spark.operators.zorder import zorder

    df = spark.createDataFrame(
        [
            ("de", "2026-01-0%d" % (i % 9 + 1), i)
            for i in range(20)
        ],
        "country string, day string, v long",
    ).withColumn("day", F.to_date("day")).withColumn(
        "ts", F.to_timestamp("day")
    )
    out = zorder(df, ["country", "day"], bits=4)
    assert out.count() == 20
    out2 = zorder(df, ["ts", "v"], bits=4)
    assert out2.count() == 20


def test_zorder_string_surrogate_preserves_prefix_order(spark):
    """The fixed-width 8-byte big-endian surrogate must order exactly
    like byte-wise string comparison on the padded prefix ('ab' < 'b'
    — a variable-width numeric prefix would invert it)."""
    from pyspark.sql import functions as F

    from prajna_spark.operators.zorder import _surrogate

    vals = ["", "a", "ab", "aba", "b", "ba", "zz", "zzzzzzzzz"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", _surrogate(F.col("s"), "string").alias("x")).collect()
    by_str = [r.x for r in sorted(rows, key=lambda r: r.s)]
    assert by_str == sorted(by_str)
