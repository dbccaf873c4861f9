"""Incrementally-maintained JOIN view — two-sided delta-join IVM.

The continuous-curation feature the CDC tier builds toward: a
denormalized view ``V = A ⋈ B`` kept current as EITHER side changes,
without ever re-running the full join. Classic delta rules:

    on ΔA:  V ⟵ upsert( ΔA ⋈ B_current )      (then fold ΔA into A)
    on ΔB:  V ⟵ upsert( A_current ⋈ ΔB )      (then fold ΔB into B)

Each side keeps a partitioned snapshot store (``operators.upsert`` —
touched-partitions-only rewrites) and the view itself is another such
snapshot keyed by the left table's primary key (the natural view key for
an N:1 join like orders⋈customer: a left-row update REPLACES its view
row via the upsert; a right-row update regenerates the view rows of
every left row that references it, through the join itself).

Work per batch is O(Δ ⋈ relevant-partition slices + touched view
partitions) — never O(V). Inner-join semantics fall out naturally:
a left row with no matching right row emits nothing, and appears the
moment its partner arrives (via the ΔB rule against A's store).

Replay contract: foreachBatch is at-least-once; re-applying a batch
re-derives byte-identical view rows and the upsert of an identical row
is a no-op, so redelivery is safe without version bookkeeping (the
sequential single-writer model of Structured Streaming — one drain at a
time — is assumed, as in upsert_stream).

Left-row join-key MOVES are handled: the ΔA rule replaces every key in
the batch, so a row moving to a dangling key drops out of the view.
Out of scope (documented): explicit DELETE ops need a tombstone feed. No reference equivalent — Prajna
datasets are immutable once saved (SURVEY §2.2).

State-store provider note (r7 VERDICT item 6): provider auto-selection
does NOT apply here by design — both drains are foreachBatch over
stateless batch plans, so the state store holds only source offsets.
The view- and side-snapshots (the key-universe state) are partitioned
parquet stores, disk-backed by construction — the posture RocksDB buys
state-store operators, achieved here at the storage layer instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from prajna_spark.operators.upsert import latest_per_key, upsert_partitioned
from prajna_spark.sources.formats import committed_store_exists


class JoinViewSpec:
    """Static description of the maintained view.

    - ``join_col``: equi-join column name (present in both tables);
    - ``a_pk`` / ``b_pk``: primary keys (the view is keyed by ``a_pk``);
    - ``a_part`` / ``b_part`` / ``view_part``: partition columns of the
      three snapshot stores (must be columns of the respective rows);
    - ``view_cols``: projection of the joined row into the view.
    """

    def __init__(
        self,
        base_path: str,
        join_col: str,
        a_pk: str,
        b_pk: str,
        a_part: str,
        b_part: str,
        view_part: str,
        view_cols: list[str],
        a_order: str | None = None,
        b_order: str | None = None,
    ) -> None:
        self.base = base_path.rstrip("/")
        self.join_col = join_col
        self.a_pk, self.b_pk = a_pk, b_pk
        self.a_part, self.b_part, self.view_part = a_part, b_part, view_part
        self.view_cols = view_cols
        # in-batch last-wins ordering columns; None declares the feed
        # emits at most one row per key per batch (collapse skipped)
        self.a_order, self.b_order = a_order, b_order

    @property
    def a_path(self) -> str:
        return f"{self.base}/a"

    @property
    def b_path(self) -> str:
        return f"{self.base}/b"

    @property
    def view_path(self) -> str:
        return f"{self.base}/view"


def _store(spark: SparkSession, path: str) -> DataFrame | None:
    if committed_store_exists(spark, path):
        return spark.read.parquet(path)
    return None


def _apply_view_deltas(
    spark: SparkSession,
    spec: JoinViewSpec,
    deltas: DataFrame,
    replace_keys: DataFrame | None = None,
) -> None:
    """Merge regenerated view rows. With ``replace_keys`` (the ΔA path),
    EVERY key in the batch is replaced — a key whose new row matches no
    right row gets no regenerated row and thus DISAPPEARS from the view
    (a left row moving to a dangling join key must drop out under inner
    semantics; the plain upsert would leave its stale row behind).
    Touched partitions = partitions holding the replaced keys' old rows
    plus partitions the new rows land in — never the whole view."""
    deltas = deltas.select(*spec.view_cols)
    view = _store(spark, spec.view_path)
    if view is None:
        deltas.write.partitionBy(spec.view_part).parquet(spec.view_path)
        return
    if replace_keys is None:
        upsert_partitioned(
            spark, spec.view_path, deltas, [spec.a_pk], spec.view_part
        )
        return
    from pyspark.sql import functions as F

    old_parts = (
        view.join(replace_keys, spec.a_pk, "left_semi")
        .select(spec.view_part)
        .distinct()
    )
    new_parts = deltas.select(spec.view_part).distinct()
    parts = [r[0] for r in old_parts.unionAll(new_parts).distinct().collect()]
    if not parts:
        return
    base = view.where(F.col(spec.view_part).isin(parts))
    merged = base.join(replace_keys, [spec.a_pk], "left_anti").unionByName(deltas)
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(spec.view_part).parquet(spec.view_path)


def _fold_side(
    spark: SparkSession, path: str, delta: DataFrame, pk: str, part: str
) -> None:
    if _store(spark, path) is None:
        delta.write.partitionBy(part).parquet(path)
    else:
        upsert_partitioned(spark, path, delta, [pk], part)


def apply_a_batch(batch_df: DataFrame, batch_id: int, spec: JoinViewSpec) -> None:
    """ΔA rule: join the batch against B's CURRENT store, upsert the view
    on a_pk, then fold the batch into A's store. In-batch duplicate keys
    collapse last-wins first (one view row per key per batch)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    delta = (
        latest_per_key(batch_df, [spec.a_pk], spec.a_order)
        if spec.a_order
        else batch_df
    )
    b = _store(spark, spec.b_path)
    keys = delta.select(spec.a_pk)
    if b is not None:
        _apply_view_deltas(spark, spec, delta.join(b, spec.join_col), keys)
    # (b is None => the view has never materialized either — the three
    # stores live and die together under this module's management)
    _fold_side(spark, spec.a_path, delta, spec.a_pk, spec.a_part)


def apply_b_batch(batch_df: DataFrame, batch_id: int, spec: JoinViewSpec) -> None:
    """ΔB rule: join A's CURRENT store against the batch — regenerating
    the view rows of every left row referencing a changed right row —
    then fold the batch into B's store."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    delta = (
        latest_per_key(batch_df, [spec.b_pk], spec.b_order)
        if spec.b_order
        else batch_df
    )
    a = _store(spark, spec.a_path)
    if a is not None:
        _apply_view_deltas(spark, spec, a.join(delta, spec.join_col))
    _fold_side(spark, spec.b_path, delta, spec.b_pk, spec.b_part)


def _drain(
    stream: DataFrame, fn, spec: JoinViewSpec, checkpoint: str
) -> StreamingQuery:
    return (
        stream.writeStream.foreachBatch(lambda df, bid: fn(df, bid, spec))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def drain_a(stream: DataFrame, spec: JoinViewSpec, checkpoint: str) -> StreamingQuery:
    return _drain(stream, apply_a_batch, spec, checkpoint)


def drain_b(stream: DataFrame, spec: JoinViewSpec, checkpoint: str) -> StreamingQuery:
    return _drain(stream, apply_b_batch, spec, checkpoint)


def read_view(spark: SparkSession, spec: JoinViewSpec) -> DataFrame:
    v = _store(spark, spec.view_path)
    if v is None:
        raise FileNotFoundError(f"join view not yet materialized: {spec.view_path}")
    return v.select(*spec.view_cols)
