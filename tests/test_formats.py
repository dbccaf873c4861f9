"""File-format source/sink roundtrips (sources.formats)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from prajna_spark.sources import formats


def test_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "csv")
    data = [(1, "a,b", 1.5), (2, None, -0.25), (3, "x\"y", 0.0)]
    df = spark.createDataFrame(data, "k int, s string, v double")
    formats.write_csv(df, path)
    back = formats.read_csv(spark, path, "k int, s string, v double")
    assert Counter(tuple(r) for r in back.collect()) == Counter(data)


def test_json_roundtrip_with_nesting(spark, tmp_path):
    path = str(tmp_path / "json")
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": [1, 2]}), (2, {"a": 5, "b": []})],
        "k int, obj struct<a int, b array<int>>",
    )
    formats.write_json(df, path)
    back = formats.read_json(spark, path, "k int, obj struct<a int, b array<int>>")
    got = {r.k: (r.obj.a, r.obj.b) for r in back.collect()}
    assert got == {1: (1, [1, 2]), 2: (5, [])}


def test_folder_bytes_recursive_with_glob(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload-a")
    (tmp_path / "sub" / "b.bin").write_bytes(b"payload-b")
    (tmp_path / "sub" / "skip.txt").write_text("nope")

    df = formats.read_folder_bytes(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert rows == {"a.bin": b"\x00\x01payload-a", "b.bin": b"payload-b"}
    assert dict(df.dtypes)["content"] == "binary"


def test_folder_bytes_write_twin(spark, tmp_path):
    src, dst = tmp_path / "src", str(tmp_path / "dst")
    src.mkdir()
    (src / "x.bin").write_bytes(b"xxxx")
    df = formats.read_folder_bytes(spark, str(src)).select("path", "content")
    formats.write_folder_bytes(df, dst)
    back = spark.read.parquet(dst)
    assert bytes(back.collect()[0].content) == b"xxxx"


def test_csv_schema_is_mandatory(spark, tmp_path):
    import pytest

    with pytest.raises(TypeError):
        formats.read_csv(spark, str(tmp_path))  # no schema -> hard error


def test_register_views_sql_front_door(spark, sf_dir):
    from prajna_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    row = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT r_regionkey) AS k FROM region"
    ).collect()[0]
    assert row.n == 5 and row.k == 5
    joined = spark.sql(
        """SELECT r.r_name, count(*) AS n
           FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY r.r_name"""
    )
    assert joined.count() == 5


def test_schema_evolution_read_unions_columns(spark, tmp_path):
    """A store that gained a column mid-life: mergeSchema reads the union
    schema, old files yield NULL for the new column, and filters on the
    new column still push down."""
    from prajna_spark.sources.formats import read_parquet_evolving

    path = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.mode("append").parquet(path)
    spark.range(3, 6).selectExpr(
        "id", "id * 2 AS a", "concat('v', id) AS b"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in df.collect()}
    assert rows[1] == (2, None)      # pre-evolution file: NULL new column
    assert rows[4] == (8, "v4")      # post-evolution file: populated
    assert df.where("b IS NOT NULL").count() == 3


def test_orc_roundtrip(spark, tmp_path):
    from prajna_spark.sources.formats import read_orc, write_orc

    df = spark.range(100).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v")
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_gated_with_actionable_error(spark, tmp_path):
    import pytest

    from prajna_spark.sources.formats import read_avro

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope"))


def test_json_permissive_quarantines_bad_rows(spark, tmp_path):
    from prajna_spark.sources.formats import read_json_permissive, split_quarantine

    p = tmp_path / "j"
    p.mkdir()
    (p / "x.json").write_text(
        '{"a": 1, "s": "ok"}\n'
        '{"a": oops}\n'
        '{"a": 3, "s": "fine"}\n'
        "not json at all\n"
    )
    df = read_json_permissive(spark, str(p), "a long, s string")
    good, bad = split_quarantine(df)
    assert sorted(r["a"] for r in good.collect()) == [1, 3]
    raw = set(r["_corrupt_record"] for r in bad.collect())
    assert raw == {'{"a": oops}', "not json at all"}


def test_committed_store_exists_ignores_staging_residue(spark, tmp_path):
    """Both '_' and '.' prefixes are hidden/in-flight in the Spark and
    Hadoop conventions: _temporary and .spark-staging-* residue must
    read as 'no committed store' so a bootstrap can safely overwrite;
    a _SUCCESS marker or any visible entry means committed."""
    import os

    from prajna_spark.sources.formats import committed_store_exists

    p = tmp_path / "store"
    assert not committed_store_exists(spark, str(p))  # missing
    os.makedirs(p / "_temporary" / "0")
    assert not committed_store_exists(spark, str(p))
    os.makedirs(p / ".spark-staging-123")
    assert not committed_store_exists(spark, str(p))
    (p / "_SUCCESS").write_text("")
    assert committed_store_exists(spark, str(p))
