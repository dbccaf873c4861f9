"""GraySort-analog sort benchmark: correctness of the generate → range-
sort → valsort-verify pipeline (operators/graysort.py; reference
workload samples/SortBenchmark — 2.5 TB gensort sort, ReadMe.txt:2,
SortBenchmark.fs:145-160, verified there by valsort.exe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.graysort import (
    KEY_LEN,
    PAYLOAD_LEN,
    _multiset_fingerprint,
    gen_records,
    gray_sort,
    validate_sorted,
    validate_sorted_files,
)

N = 20_000
NUMP = 8


def test_gen_records_shape_and_determinism(spark):
    df = gen_records(spark, N, num_partitions=4)
    assert df.count() == N
    row = df.agg(
        F.min(F.length("key")).alias("klo"),
        F.max(F.length("key")).alias("khi"),
        F.min(F.length("payload")).alias("plo"),
        F.max(F.length("payload")).alias("phi"),
        F.count_distinct("id").alias("ids"),
    ).first()
    assert (row["klo"], row["khi"]) == (KEY_LEN, KEY_LEN)
    assert (row["plo"], row["phi"]) == (PAYLOAD_LEN, PAYLOAD_LEN)
    assert row["ids"] == N
    # deterministic across invocations (seeded hash chain, no rand())
    a = gen_records(spark, 100).orderBy("id").collect()
    b = gen_records(spark, 100).orderBy("id").collect()
    assert a == b


def test_gray_sort_is_globally_sorted_multiset_preserving(spark):
    records = gen_records(spark, N, num_partitions=4)
    v = validate_sorted(records, gray_sort(records, NUMP))
    assert v.ok, v
    assert v.in_count == N


def test_validator_catches_unsorted_and_mutated_output(spark):
    records = gen_records(spark, N, num_partitions=4)
    # unsorted "output": same multiset, no sort -> sortedness violations
    v_unsorted = validate_sorted(records, records.repartition(NUMP))
    assert not v_unsorted.ok
    assert v_unsorted.intra_partition_violations > 0
    assert v_unsorted.in_checksum == v_unsorted.out_checksum
    # lost row -> count+checksum mismatch even though output is sorted
    v_lost = validate_sorted(
        records, gray_sort(records.where(F.col("id") != 0), NUMP)
    )
    assert not v_lost.ok
    assert v_lost.out_count == N - 1
    assert v_lost.in_checksum != v_lost.out_checksum
    # corrupted payload -> checksum mismatch at equal count
    v_mut = validate_sorted(
        records,
        gray_sort(
            records.withColumn(
                "payload",
                F.when(F.col("id") == 0, F.lit("x" * PAYLOAD_LEN)).otherwise(
                    F.col("payload")
                ),
            ),
            NUMP,
        ),
    )
    assert not v_mut.ok
    assert v_mut.in_count == v_mut.out_count
    assert v_mut.in_checksum != v_mut.out_checksum


def test_gray_sort_output_partition_count_is_the_nump_knob(spark):
    # the reference's -nump: stage-2 partition count is caller-owned
    out = gray_sort(gen_records(spark, 5_000, num_partitions=4), NUMP)
    assert out.rdd.getNumPartitions() == NUMP


def test_validate_sorted_files_disk_protocol(spark, tmp_path):
    # the disk-backed harness path: fingerprint input, sort, WRITE, then
    # validate the written files (partition identity recovered from the
    # part-NNNNN file names, not the validating scan's partitioning)
    records = gen_records(spark, N, num_partitions=4)
    in_fp = _multiset_fingerprint(records, "key", "payload")
    out_dir = str(tmp_path / "sorted")
    gray_sort(records, NUMP).write.mode("overwrite").parquet(out_dir)
    v = validate_sorted_files(spark, out_dir, in_fp)
    assert v.ok, v
    assert v.in_count == N
    # a mutated write must fail the fingerprint over the SAME files path
    bad_dir = str(tmp_path / "sorted_bad")
    gray_sort(
        records.withColumn(
            "payload",
            F.when(F.col("id") == 1, F.lit("y" * PAYLOAD_LEN)).otherwise(
                F.col("payload")
            ),
        ),
        NUMP,
    ).write.mode("overwrite").parquet(bad_dir)
    v_bad = validate_sorted_files(spark, bad_dir, in_fp)
    assert not v_bad.ok
    assert v_bad.in_checksum != v_bad.out_checksum
    # conf restored after validation
    assert spark.conf.get("spark.sql.files.maxPartitionBytes", None) != str(
        4 * 1024**3
    )


def test_validate_sorted_files_path_with_part_dir_component(spark, tmp_path):
    # r9 ADVICE: a directory component matching part-<digits> in out_path
    # must not be captured as the file's partition id — the extractor is
    # anchored to the basename. Before the fix this collapsed every file
    # to pid=2 and reported spurious boundary violations.
    records = gen_records(spark, 5_000, num_partitions=4)
    in_fp = _multiset_fingerprint(records, "key", "payload")
    out_dir = str(tmp_path / "part-2" / "sorted")
    gray_sort(records, NUMP).write.mode("overwrite").parquet(out_dir)
    v = validate_sorted_files(spark, out_dir, in_fp)
    assert v.ok, v
