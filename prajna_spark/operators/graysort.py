"""GraySort-analog distributed sort — the reference's flagship scale
workload, re-expressed Spark-first.

Prajna's only published large-scale benchmark is a 2.5 TB gensort sort
(25e9 x 100-byte records, 10-byte key;
``samples/SortBenchmark/ReadMe.txt:2``). Its pipeline is a TWO-STAGE
static repartition — 65536 leading-key bins, then ``-nump`` stage-2
partitions — followed by a per-partition native qsort
(``samples/SortBenchmark/SortBenchmark.fs:145-160``, ``qsort/``), and
its README notes the missing piece: "I don't have code to determine
partition boundary yet" (``ReadMe.txt:33-35``) — boundaries are static
byte-prefix bins, so a skewed key distribution unbalances stage 2.

The Spark expression is ONE operator: ``repartitionByRange`` reservoir-
samples the key distribution and computes balanced boundaries (the
exact component the reference lacks), and ``sortWithinPartitions`` runs
Tungsten's cache-aware external sort — the same two-stage shape
(range-partition shuffle, then partition-local sort), JVM-side,
spill-safe, with whole-stage codegen. ``DSet.bin_sort`` (dset.py) is
the operator surface; this module adds the benchmark harness:
gensort-shaped record generation and a valsort-analog verification
(``valsort.exe`` in the reference's tool list), both fully distributed.

Scale posture: generation is a map-only ``spark.range`` projection (no
driver loop, no Python), the sort shuffle moves each record exactly
once, and verification re-reads the (persisted) sorted output three
ways — per-partition lag check, per-partition min/max boundary
aggregate (``num_partitions`` rows), and a count+checksum fingerprint;
persist the sorted frame before validating or each pass re-runs the
sort. At 100 TB the only knob is
``num_partitions`` — size it so each partition's slice fits an
executor's sort buffer; boundaries stay balanced by sampling no matter
how skewed the keys.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KEY_LEN = 10
PAYLOAD_LEN = 90
RECORD_BYTES = KEY_LEN + PAYLOAD_LEN  # gensort: 100-byte records


def gen_records(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Deterministic gensort-shaped corpus: 10-char key + 90-char payload
    per record, uniform over the hex alphabet, from seeded md5 chains —
    pure JVM expressions over ``spark.range`` (distributed, no driver
    data). gensort's records are uniform random bytes with the record
    number recoverable from the payload; here ``id`` plays that role."""
    rng = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    sid = F.col("id").cast("string")
    return rng.select(
        F.col("id"),
        F.substring(F.md5(sid), 1, KEY_LEN).alias("key"),
        F.substring(
            F.concat(
                F.md5(F.concat(sid, F.lit("a"))),
                F.md5(F.concat(sid, F.lit("b"))),
                F.md5(F.concat(sid, F.lit("c"))),
            ),
            1,
            PAYLOAD_LEN,
        ).alias("payload"),
    )


def gray_sort(df: DataFrame, num_partitions: int, key: str = "key") -> DataFrame:
    """Globally sort ``df`` by ``key``: sampled range partition + partition-
    local sort. Delegates to ``DSet.bin_sort`` (dset.py) — the benchmark
    drives THE operator, so any future bin_sort fix (null ordering,
    sampling config) reaches the benchmark path automatically. The
    explicit ``num_partitions`` is the one scale knob (the reference's
    ``-nump``); AQE does not override a user repartition count."""
    from prajna_spark.dset import DSet

    return DSet(df).bin_sort(key, num_partitions=num_partitions).df


@dataclass(frozen=True)
class SortValidation:
    """valsort-analog report; all-distributed computation."""

    in_count: int
    out_count: int
    in_checksum: tuple[int, int]  # (decimal-summed xxhash64, bit_xor of xxhash64)
    out_checksum: tuple[int, int]
    intra_partition_violations: int
    boundary_violations: int

    @property
    def ok(self) -> bool:
        return (
            self.in_count == self.out_count
            and self.in_checksum == self.out_checksum
            and self.intra_partition_violations == 0
            and self.boundary_violations == 0
        )


def _multiset_fingerprint(df: DataFrame, key: str, payload: str) -> tuple[int, tuple[int, int]]:
    # Per-record xxhash64, combined two commutative ways: an additive sum
    # accumulated in decimal(38,0) (an int64 sum would overflow — and under
    # ANSI mode throw — at ~1e9s of records, far below the 25e9-record
    # GraySort target; same ANSI-safe pattern as operators/stats.py), and a
    # bitwise XOR. The (sum, xor) pair is a far stronger duplicate/loss
    # check than a single additive hash: compensating mutations that cancel
    # in the sum almost surely break the XOR and vice versa.
    h = F.xxhash64(F.concat_ws("\x00", F.col(key), F.col(payload)))
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("cksum"),
        F.bit_xor(h).alias("ckxor"),
    ).first()
    return int(row["n"]), (int(row["cksum"] or 0), int(row["ckxor"] or 0))


def _order_violations(tagged: DataFrame, key: str) -> tuple[int, int]:
    """Intra-partition + boundary violations over a (key, __pid, __ord)
    frame where __ord replays physical row order within each __pid."""
    w = Window.partitionBy("__pid").orderBy("__ord")
    intra = (
        tagged.withColumn("__prev", F.lag(key).over(w))
        .where(F.col("__prev").isNotNull() & (F.col(key) < F.col("__prev")))
        .count()
    )
    bounds = tagged.groupBy("__pid").agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    )
    wb = Window.orderBy("__pid")
    boundary = (
        bounds.withColumn("__prev_hi", F.lag("hi").over(wb))
        .where(F.col("__prev_hi").isNotNull() & (F.col("lo") < F.col("__prev_hi")))
        .count()
    )
    return int(intra), int(boundary)


def validate_sorted(
    df_in: DataFrame,
    df_sorted: DataFrame,
    key: str = "key",
    payload: str = "payload",
    in_fingerprint: tuple[int, tuple[int, int]] | None = None,
) -> SortValidation:
    """The reference ships ``valsort.exe`` to check its output; this is
    the distributed equivalent:

    - intra-partition sortedness: ``lag`` over the PHYSICAL row order
      (monotonically_increasing_id is ordinal within a partition, so
      ordering the window by it replays row order rather than re-sorting
      by key — a re-sort would vacuously pass);
    - boundary ordering: each partition's max(key) <= the next non-empty
      partition's min(key), checked over num_partitions rows;
    - multiset equality: count + order-insensitive (sum, xor) xxhash64
      fingerprint of the full records, in vs out (valsort's duplicate/loss
      check); the sum accumulates in decimal(38,0) so it is exact — and
      ANSI-safe — at the 25e9-record reference scale.

    ``in_fingerprint`` accepts a pre-computed input fingerprint (from
    :func:`_multiset_fingerprint`) so a disk-backed harness can
    fingerprint the input once and delete it before validation — the
    25 GB rung doesn't fit input + shuffle + output + a second input
    pass on this VM's disk.
    """
    tagged = df_sorted.select(
        F.col(key),
        F.col(payload),
        F.spark_partition_id().alias("__pid"),
        F.monotonically_increasing_id().alias("__ord"),
    )
    intra, boundary = _order_violations(tagged, key)
    n_in, ck_in = in_fingerprint or _multiset_fingerprint(df_in, key, payload)
    n_out, ck_out = _multiset_fingerprint(df_sorted, key, payload)
    return SortValidation(
        in_count=n_in,
        out_count=n_out,
        in_checksum=ck_in,
        out_checksum=ck_out,
        intra_partition_violations=int(intra),
        boundary_violations=int(boundary),
    )


def validate_sorted_files(
    spark: SparkSession,
    out_path: str,
    in_fingerprint: tuple[int, tuple[int, int]],
    key: str = "key",
    payload: str = "payload",
) -> SortValidation:
    """valsort-analog over WRITTEN sorted output (the true GraySort
    protocol: output must rest on disk). Partition identity is recovered
    from the file name (``part-NNNNN`` carries the range-partition
    ordinal — one file per sort partition), not ``spark_partition_id()``:
    the validating scan's partitioning is a read-time packing decision
    (splits are size-ordered, then bin-packed) with no relation to sort
    order.

    Precondition enforced here: each output file must land in ONE read
    split, so physical row order within a file is replayed by
    ``monotonically_increasing_id`` — the scan conf pins
    ``maxPartitionBytes`` above the LARGEST output file (checked by a
    cheap driver-side listing; a file bigger than the pin would split
    across read partitions and produce false order violations with no
    diagnostic). Boundary ordering across files follows the part-number
    ordering, which repartitionByRange guarantees is the range order.
    """
    # One-file-one-split precondition: list the output files (metadata
    # only, via the Hadoop FS the path actually lives on) and pin the
    # split size above the largest file, with a 4 GiB floor.
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = jpath.getFileSystem(hconf)
    max_file = 0
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("part-"):
            max_file = max(max_file, int(status.getLen()))
    pin = max(4 * 1024**3, max_file + 1)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(pin))
    try:
        out = spark.read.parquet(out_path)
        tagged = out.select(
            F.col(key),
            F.col(payload),
            # Anchored to the basename: a directory component matching
            # part-<digits> anywhere in out_path must not be captured.
            F.regexp_extract(F.input_file_name(), r"/part-(\d+)[^/]*$", 1)
            .cast("int")
            .alias("__pid"),
            F.monotonically_increasing_id().alias("__ord"),
        )
        intra, boundary = _order_violations(tagged, key)
        n_in, ck_in = in_fingerprint
        n_out, ck_out = _multiset_fingerprint(out, key, payload)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    return SortValidation(
        in_count=n_in,
        out_count=n_out,
        in_checksum=ck_in,
        out_checksum=ck_out,
        intra_partition_violations=int(intra),
        boundary_violations=int(boundary),
    )
