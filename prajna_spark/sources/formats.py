"""File-format sources/sinks beyond parquet.

Reference parity: Prajna's only on-disk format is its own length-prefixed
blob stream (/root/reference/src/CoreLib/storage.fs:76-90, file.fs); text
formats are parsed by hand inside closures (samples/DistributedLogAnalysis/
DistributedLogAnalysis.fs:104-117), and raw folders are exposed as
``seq<string*byte[]>`` via ``FolderRecursiveSeq`` / ``RetrieveFolderRecursive``
(/root/reference/src/CoreLib/DSet.fs:2936-2983). Spark-first, each becomes a
declarative reader with pushdown where the format supports it:

- CSV/JSON: schema-explicit readers (never inferSchema at scale — schema
  inference is a full extra pass over 100 TB);
- folder-of-bytes: ``binaryFile`` source == FolderRecursiveSeq, giving
  (path, modificationTime, length, content) with partition-parallel reads
  and pathGlobFilter/recursiveFileLookup pushed to the listing;
- the blob-stream format itself is NOT ported: parquet is the storage
  format (columnar, splittable, predicate pushdown — everything the
  reference's format lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from prajna_spark.session import tune


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, **options
) -> DataFrame:
    """Schema-explicit CSV scan. ``schema`` is required by design: on a
    large cluster inferSchema is a second full read of the input."""
    tune(spark)
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: str, **options) -> DataFrame:
    """Schema-explicit JSON-lines scan (one object per line — splittable;
    multiline JSON is not, and is deliberately not defaulted)."""
    tune(spark)
    return spark.read.options(**options).schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_folder_bytes(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Prajna ``FolderRecursiveSeq`` (DSet.fs:2936-2983): a folder tree as
    (path, modificationTime, length, content binary). File listing happens
    driver-side but reads are partition-parallel; ``glob`` pushes the file
    filter into the listing itself."""
    tune(spark)
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", str(recursive).lower()
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_folder_bytes(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Prajna ``RetrieveFolderRecursive``'s write twin: persist (path,
    content) pairs. Spark has no binary-file WRITER; the scalable spelling
    is parquet with the binary column intact (splittable, columnar
    metadata, no small-file explosion at 100 TB)."""
    df.write.mode(mode).parquet(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with schema merging — the read mode a long-lived
    store needs once columns start being added: the returned schema is
    the UNION of every file's schema, files missing a column yield NULLs.

    mergeSchema costs a footer read per file at planning (why it is not
    Spark's default); on a 100 TB store prefer declaring the current
    schema explicitly (``spark.read.schema(...)``) and reserve this
    reader for exploration / migration jobs."""
    tune(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/column-pruning story as parquet (built
    into Spark; useful when upstream systems hand over ORC)."""
    tune(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — gated: the spark-avro module is EXTERNAL (not bundled
    in this environment). Raises with the exact fix rather than failing
    deep inside a job."""
    tune(spark)
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "Avro needs the external spark-avro package "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
            "it is not bundled in this environment"
        ) from exc


def read_json_permissive(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """JSON-lines scan that QUARANTINES malformed rows instead of
    nulling them silently (PERMISSIVE + ``_corrupt_record``): good rows
    parse into the declared schema, bad rows surface whole in
    ``_corrupt_record`` for the dead-letter path. At 100 TB a malformed
    delivery is a certainty; dropping it silently (DROPMALFORMED) or
    failing the job (FAILFAST) are both wrong defaults for ingest."""
    tune(spark)
    full = schema.rstrip() + ", _corrupt_record string"
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split of a permissive read: bad rows carry the raw
    line for replay after the producer is fixed.

    The parsed frame is cached here: Spark disallows referencing ONLY
    ``_corrupt_record`` against the raw scan (the parser would need a
    second pass to know what failed) — caching materializes the parse
    once for both branches, which the dead-letter pattern wants anyway.
    Caller unpersists when done (or lets it age out)."""
    from pyspark.sql import functions as F

    df = df.cache()
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad


def committed_store_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds COMMITTED datasource output.

    The streaming sinks bootstrap their stores on first batch, so they
    need "does the store exist yet?" answered robustly. Probing with
    ``spark.read.parquet(path)`` under ``try/except`` conflates three
    distinct states: missing (bootstrap), crashed-mid-first-write
    (directory exists but holds only in-flight ``_temporary`` output —
    a plain errorIfExists bootstrap then wedges the stream forever), and
    a transient FS error while the store EXISTS (silently treated as
    missing → duplicates or data loss). This check uses the Hadoop
    FileSystem API directly (any supported FS, not just local):
    committed content = a ``_SUCCESS`` marker or any entry not starting
    with ``_`` or ``.`` (partition directories, part files) — Spark and
    Hadoop hide BOTH prefixes, and dot-prefixed residue
    (``.spark-staging-*``, ``.hive-staging*``, ``.*.crc``) is in-flight
    or auxiliary, never committed data. ``_temporary``-only residue
    reports False so a bootstrap writer may safely ``mode("overwrite")``
    it; genuine FS errors PROPAGATE and fail the batch for retry instead
    of masquerading as absence."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name == "_SUCCESS" or not name.startswith(("_", ".")):
            return True
    return False
