"""DSet facade operator tests.

Mirrors the reference's NUnit operator-per-test strategy
(/root/reference/tests/CoreLib/DSet.fs, DKV.fs): build small inputs, run the
distributed operator, assert multiset equality with the locally computed
expected value (plus partition-count assertions where the reference makes
them). See SURVEY.md §5.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from prajna_spark.dset import DSet


def rows_multiset(ds: DSet) -> Counter:
    return Counter(tuple(r) for r in ds.collect())


# ---------------------------------------------------------------- sources


def test_distribute_roundtrip(spark):
    data = [(i, f"s{i}") for i in range(100)]
    ds = DSet.distribute(spark, data, "k int, v string")
    assert rows_multiset(ds) == Counter(data)


def test_source_i_partitions_and_rows(spark):
    ds = DSet.source_i(spark, num_partitions=4, rows_per_partition=25)
    assert ds.num_partitions() == 4
    got = Counter((r.i, r.j) for r in ds.collect())
    assert got == Counter((i, j) for i in range(4) for j in range(25))


def test_init_n_sizes(spark):
    sizes = [3, 0, 5, 1]
    ds = DSet.init_n(spark, sizes)
    per_part = Counter(r.i for r in ds.collect())
    assert per_part == Counter({0: 3, 2: 5, 3: 1})


def test_save_load_roundtrip(spark, tmp_path):
    path = str(tmp_path / "saved")
    data = [(i, i * 2.5) for i in range(50)]
    DSet.distribute(spark, data, "k int, v double").save(path)
    back = DSet.load(spark, path)
    assert rows_multiset(back) == Counter(data)


def test_lazy_save_is_deferred(spark, tmp_path):
    path = str(tmp_path / "lazy")
    ds = DSet.distribute(spark, [(1,), (2,)], "k int")
    thunk = ds.lazy_save(path)
    import os

    assert not os.path.exists(path)  # nothing materialized yet
    thunk()
    assert rows_multiset(DSet.load(spark, path)) == Counter([(1,), (2,)])


# ------------------------------------------------------------- narrow ops


def test_map_filter_choose_flatmap(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(20)], "x int")
    mapped = ds.map((F.col("x") * 2).alias("y"))
    assert sorted(r.y for r in mapped.collect()) == [2 * i for i in range(20)]

    filtered = ds.filter(F.col("x") % 2 == 0)
    assert sorted(r.x for r in filtered.collect()) == list(range(0, 20, 2))

    # choose: map to Option, drop None (evens -> x*10, odds -> None)
    chosen = ds.choose(F.when(F.col("x") % 2 == 0, F.col("x") * 10), "v")
    assert sorted(r.v for r in chosen.collect()) == [10 * i for i in range(0, 20, 2)]

    flat = ds.flat_map(F.array(F.col("x"), F.col("x") + 100), "v")
    assert Counter(r.v for r in flat.collect()) == Counter(
        list(range(20)) + list(range(100, 120))
    )


def test_identity_and_with_column(spark):
    ds = DSet.distribute(spark, [(1, "a"), (2, "b")], "k int, v string")
    assert rows_multiset(ds.identity()) == rows_multiset(ds)
    aug = ds.with_column("w", F.col("k") + 10)
    assert sorted((r.k, r.w) for r in aug.collect()) == [(1, 11), (2, 12)]


def test_mapi_deterministic_global_index(spark):
    data = [(i, f"v{i}") for i in range(200)]
    ds = DSet.distribute(spark, list(reversed(data)), "k int, v string")
    indexed = ds.mapi(order_by=["k"], index_col="idx")
    got = {r.k: r.idx for r in indexed.collect()}
    assert got == {i: i for i in range(200)}  # idx follows the k total order


def test_map_by_collection_arrow_batches(spark):
    ds = DSet.distribute(spark, [(float(i),) for i in range(100)], "x double")

    def batch_double(batches):
        for pdf in batches:
            pdf["x"] = pdf["x"] * 2
            yield pdf

    out = ds.map_by_collection(batch_double, "x double")
    assert sorted(r.x for r in out.collect()) == [2.0 * i for i in range(100)]


def test_execute_side_effects(spark):
    acc = spark.sparkContext.accumulator(0)
    ds = DSet.distribute(spark, [(i,) for i in range(30)], "x int")

    def visit(rows):
        for _ in rows:
            acc.add(1)

    ds.execute(visit)
    assert acc.value == 30


# ----------------------------------------------------------- aggregations


def test_count_fold_reduce(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(1, 101)], "x int")
    assert ds.count() == 100
    # fold: arbitrary-state path (sum + count in a tuple)
    s, n = ds.fold((0, 0), lambda st, row: (st[0] + row.x, st[1] + 1),
                   lambda a, b: (a[0] + b[0], a[1] + b[1]))
    assert (s, n) == (5050, 100)
    assert ds.reduce(lambda a, b: (a[0] + b[0],)) == (5050,)
    # DataFrame fast path agrees
    assert ds.agg(F.sum("x").alias("s")).collect()[0].s == 5050


def test_group_by_key_and_reduce_by_key(spark):
    data = [(i % 3, i) for i in range(30)]
    ds = DSet.distribute(spark, data, "k int, v int").by_key("k")
    grouped = {r.k: r.v_list for r in ds.group_by_key().collect()}
    expected = {k: sorted(v for kk, v in data if kk == k) for k in range(3)}
    assert grouped == expected
    reduced = {r.k: r.s for r in ds.reduce_by_key(F.sum("v").alias("s")).collect()}
    assert reduced == {k: sum(v) for k, v in expected.items()}


def test_map_reduce_wordcount(spark):
    docs = [("the quick brown fox",), ("the lazy dog the end",)]
    ds = DSet.distribute(spark, docs, "text string")
    wc = ds.map_reduce(F.split(F.col("text"), " "), "word",
                       F.count(F.lit(1)).alias("n"))
    got = {r.word: r.n for r in wc.collect()}
    assert got["the"] == 3 and got["fox"] == 1 and len(got) == 7


def test_distinct(spark):
    ds = DSet.distribute(spark, [(1,), (1,), (2,)], "x int")
    assert rows_multiset(ds.distinct()) == Counter([(1,), (2,)])


# ------------------------------------------------------------ sort / limit


def test_bin_sort_is_globally_sorted(spark):
    import random

    rng = random.Random(7)
    vals = [(rng.randrange(10_000),) for _ in range(5_000)]
    ds = DSet.distribute(spark, vals, "x int").bin_sort("x", num_partitions=8)
    # partitions are range-disjoint and sorted within -> concatenation in
    # partition order is the global sort (the binSort contract,
    # DSetGenerics.fs:1466-1533)
    per_part = ds.df.withColumn("p", F.spark_partition_id()).collect()
    by_part: dict[int, list[int]] = {}
    for r in per_part:
        by_part.setdefault(r.p, []).append(r.x)
    flat = [x for p in sorted(by_part) for x in by_part[p]]
    assert flat == sorted(x for x, in vals)


def test_top_k(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(1000)], "x int")
    top = ds.top_k(5, F.col("x").desc())
    assert [r.x for r in top.collect()] == [999, 998, 997, 996, 995]


# ------------------------------------------------------------------ joins


def _kv(spark, pairs, schema="k int, v string"):
    return DSet.distribute(spark, pairs, schema)


def test_join_inner_left_right(spark):
    left = _kv(spark, [(1, "a"), (2, "b"), (3, "c")])
    right = _kv(spark, [(2, "x"), (3, "y"), (4, "z")], "k int, w string")
    inner = left.join(right, "k")
    assert sorted((r.k, r.v, r.w) for r in inner.collect()) == [(2, "b", "x"), (3, "c", "y")]
    lo = left.join(right, "k", "left_outer")
    assert sorted((r.k, r.w) for r in lo.collect()) == [(1, None), (2, "x"), (3, "y")]
    ro = left.join(right, "k", "right_outer")
    assert sorted((r.k, r.v) for r in ro.collect()) == [(2, "b"), (3, "c"), (4, None)]


def test_join_duplicate_keys_sql_semantics(spark):
    # documented upgrade: m x n product per duplicate key (SURVEY §2.8 caveat)
    left = _kv(spark, [(1, "a"), (1, "b")])
    right = _kv(spark, [(1, "x"), (1, "y")], "k int, w string")
    assert left.join(right, "k").count() == 4


def test_semi_anti_join(spark):
    left = _kv(spark, [(1, "a"), (2, "b"), (3, "c")])
    right = _kv(spark, [(2, "x")], "k int, w string")
    assert sorted(r.k for r in left.join(right, "k", "left_semi").collect()) == [2]
    assert sorted(r.k for r in left.join(right, "k", "left_anti").collect()) == [1, 3]


def test_broadcast_join_plan(spark):
    big = _kv(spark, [(i, "v") for i in range(100)])
    small = _kv(spark, [(1, "x"), (2, "y")], "k int, w string")
    joined = big.join(small, "k", broadcast_other=True)
    assert "BroadcastHashJoin" in joined.df._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 2


def test_cross_join_family(spark):
    a = DSet.distribute(spark, [(i,) for i in range(10)], "x int")
    b = DSet.distribute(spark, [(j,) for j in range(7)], "y int")
    assert a.cross_join(b).count() == 70
    theta = a.cross_join_choose(b, F.col("x") < F.col("y"))
    assert theta.count() == sum(1 for i in range(10) for j in range(7) if i < j)
    folded = a.cross_join_fold(b, F.sum(F.col("x") * F.col("y")).alias("s"))
    assert folded.collect()[0].s == sum(i * j for i in range(10) for j in range(7))


# ------------------------------------------------------- structural ops


def test_merge_union(spark):
    a = DSet.distribute(spark, [(1,), (2,)], "x int")
    b = DSet.distribute(spark, [(2,), (3,)], "x int")
    c = DSet.distribute(spark, [(4,)], "x int")
    assert rows_multiset(a.merge(b, c)) == Counter([(1,), (2,), (2,), (3,), (4,)])


def test_bypass_branches_share_data(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(50)], "x int")
    b1, b2 = ds.bypass(2)
    evens = b1.filter(F.col("x") % 2 == 0).count()
    odds = b2.filter(F.col("x") % 2 == 1).count()
    assert evens == 25 and odds == 25
    b1.df.unpersist()


def test_split_then_mix_roundtrip(spark):
    data = [(i, f"a{i}", float(i)) for i in range(20)]
    ds = DSet.distribute(spark, data, "k int, a string, b double")
    left, right = ds.split(["k", "a"], ["k", "b"])
    assert left.df.columns == ["k", "a"] and right.df.columns == ["k", "b"]
    remixed = left.mix(right, on=["k"])
    assert rows_multiset(remixed) == Counter(data)


def test_zip_by_order(spark):
    a = DSet.distribute(spark, [(i,) for i in range(100)], "x int")
    b = DSet.distribute(spark, [(i * 10,) for i in range(100)], "y int")
    zipped = a.zip_by_order(b, ["x"], ["y"])
    assert sorted((r.x, r.y) for r in zipped.collect()) == [(i, i * 10) for i in range(100)]


def test_multicast_broadcast_hint(spark):
    dim = DSet.distribute(spark, [(1, "x")], "k int, w string").multicast()
    fact = DSet.distribute(spark, [(1, "a"), (2, "b")], "k int, v string")
    joined = fact.join(dim, "k")
    assert "BroadcastHashJoin" in joined.df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------- cache / reorg


def test_cache_and_reorg(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(64)], "x int")
    cached = ds.cache_in_memory()
    assert cached.count() == 64
    merged = cached.rows_reorg(2)
    assert merged.num_partitions() <= 2
    assert merged.count() == 64
    cached.df.unpersist()


def test_dkv_requires_keys(spark):
    import pytest

    ds = DSet.distribute(spark, [(1, 2)], "k int, v int")
    with pytest.raises(ValueError):
        ds.reduce_by_key(F.sum("v").alias("s"))


def test_filter_by_key_and_map_by_value(spark):
    ds = DSet.distribute(spark, [(i % 4, i) for i in range(20)], "k int, v int").by_key("k")
    f = ds.filter_by_key(lambda keys: keys[0] > 1)
    assert set(r.k for r in f.collect()) == {2, 3}
    mv = ds.map_by_value("v", F.col("v") * 100)
    assert sorted(r.v for r in mv.collect()) == [i * 100 for i in range(20)]


def test_repartition_by_key(spark):
    ds = DSet.distribute(spark, [(i % 5, i) for i in range(100)], "k int, v int")
    rp = ds.by_key("k").repartition_by_key(5)
    assert rp.num_partitions() == 5
    # co-location: every key lives in exactly one partition
    part_of = rp.df.withColumn("p", F.spark_partition_id()).collect()
    keys_per_part: dict[int, set] = {}
    for r in part_of:
        keys_per_part.setdefault(r.k, set()).add(r.p)
    assert all(len(ps) == 1 for ps in keys_per_part.values())


def test_save_with_monitor(spark, tmp_path):
    path = str(tmp_path / "mon")
    ds = DSet.distribute(spark, [(i, float(i)) for i in range(40)], "k int, v double")
    stats = ds.save_with_monitor(
        path, F.count(F.lit(1)).alias("rows_written"), F.sum("v").alias("v_sum")
    )
    assert stats == {"rows_written": 40, "v_sum": sum(float(i) for i in range(40))}
    assert DSet.load(spark, path).count() == 40


def test_async_map_alias(spark):
    ds = DSet.distribute(spark, [(float(i),) for i in range(10)], "x double")

    def inc(batches):
        for pdf in batches:
            pdf["x"] = pdf["x"] + 1
            yield pdf

    assert sorted(r.x for r in ds.async_map(inc, "x double").collect()) == [
        float(i + 1) for i in range(10)
    ]
    assert ds.parallel_map is not None


def test_repartition_by_func_arbitrary_closure(spark):
    ds = DSet.distribute(spark, [(i, f"v{i}") for i in range(100)], "k int, v string")
    # arbitrary Python partitioner: digit-sum mod 3
    rp = ds.repartition_by_func(3, lambda row: sum(int(d) for d in str(row.k)) % 3)
    assert rp.num_partitions() == 3
    assert rows_multiset(rp) == rows_multiset(ds)  # content preserved
    placed = rp.df.withColumn("p", F.spark_partition_id()).collect()
    for r in placed:
        assert r.p == sum(int(d) for d in str(r.k)) % 3


def test_sample_and_take(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(10_000)], "x int")
    s = ds.sample(0.1)
    n = s.count()
    assert 700 < n < 1300  # Bernoulli around 1000
    assert s.count() == n  # seeded: deterministic on re-evaluation
    assert len(ds.take(7)) == 7


def test_try_find(spark):
    ds = DSet.distribute(spark, [(i,) for i in range(1_000)], "x int")
    hit = ds.try_find(F.col("x") == 421)
    assert hit is not None and hit.x == 421
    assert ds.try_find(F.col("x") == -1) is None


def test_connected_components_hand_graph(spark):
    from prajna_spark.pipeline.dedup import connected_components

    # components: {1,2,3,4} (chain), {5,6}, {7} (singleton)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    got = {r.id: r.component_id for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_mapi_partition_ordinals_restart_per_partition(spark):
    """The reference NUnit mapi case (tests/CoreLib/DSet.fs): fun parti
    idx -> ordinals are 0-based WITHIN each partition and the partition
    id tags where the row actually lives."""
    from prajna_spark.dset import DSet

    d = DSet(spark.range(100).repartition(7))
    rows = d.mapi_partition().collect()
    assert len(rows) == 100
    by_part = {}
    for r in rows:
        by_part.setdefault(r.parti, []).append(r.ordinal)
    assert len(by_part) == 7
    for ords in by_part.values():
        assert sorted(ords) == list(range(len(ords)))  # restart at 0, dense
    # (parti, ordinal) is a key: no duplicates across the dataset
    assert len({(r.parti, r.ordinal) for r in rows}) == 100


def test_remote_exception_propagates_to_driver(spark):
    """Reference 'Throw Remote Exception and catch locally'
    (tests/CoreLib/DSet.fs:1605): a failure inside a task surfaces at the
    driver as a catchable error carrying the original message."""
    import pytest
    from pyspark.errors import PythonException

    from prajna_spark.dset import DSet

    d = DSet(spark.range(10).toDF("id"))

    def boom(batches):
        for pdf in batches:
            raise RuntimeError("prajna remote failure 42")
            yield pdf  # pragma: no cover

    with pytest.raises(PythonException, match="prajna remote failure 42"):
        d.map_rows(boom, "id long").collect()


def test_dset_reuse_computes_source_once(spark, tmp_path):
    """Reference 'a DSet is reused' (DSet.fs:1395): a cached DSet feeds
    several downstream actions from one materialization — the source is
    not re-read."""
    from prajna_spark.dset import DSet

    src = str(tmp_path / "reuse")
    spark.range(1000).selectExpr("id", "id % 10 AS k").write.parquet(src)
    cached = DSet(spark.read.parquet(src)).cache_in_memory()
    try:
        assert cached.count() == 1000  # materializes
        a = cached.df.groupBy("k").count().count()
        b = cached.df.where("id < 100").count()
        assert (a, b) == (10, 100)
        # the shared plan reads the cache, not the files
        plan = cached.df.where("id < 500")._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        cached.df.unpersist(blocking=True)


def test_concurrent_reads_of_one_dset(spark):
    """Reference 'Concurrent read of DSet' (DSet.fs:1650): simultaneous
    actions on one DSet are safe and see identical data."""
    from concurrent.futures import ThreadPoolExecutor

    from prajna_spark.dset import DSet

    d = DSet(spark.range(20_000).selectExpr("id", "id % 7 AS k")).cache_in_memory()
    try:
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(lambda: d.df.groupBy("k").count().count()) for _ in range(4)]
            futs += [ex.submit(d.count) for _ in range(4)]
            results = [f.result() for f in futs]
        assert results[:4] == [7] * 4
        assert results[4:] == [20_000] * 4
    finally:
        d.df.unpersist(blocking=True)


def test_printfn_streams_all_rows_to_client(spark):
    """Reference printfn = LocalIter + client-side print
    (DSetGenerics.fs:498-518): every row is printed locally with the
    format function, partition-at-a-time."""
    import io

    from prajna_spark.dset import DSet

    d = DSet(spark.range(25).selectExpr("id", "id * 2 AS dbl").repartition(4))
    buf = io.StringIO()
    n = d.printfn(lambda i, dd: f"row {i}:{dd}", file=buf)
    lines = buf.getvalue().strip().split("\n")
    assert n == 25 and len(lines) == 25
    assert "row 0:0" in lines and "row 24:48" in lines


def test_connected_components_early_exit_no_count_jobs(spark):
    """The change flag is harvested via observe() during the checkpoint job
    (no per-iteration count job), and a converged path graph early-exits
    well before max_iter — pointer jumping needs O(log n) rounds."""
    from prajna_spark.pipeline.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(16)], "id long")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    got = {
        r.id: r.component_id
        for r in connected_components(edges, nodes, max_iter=50).collect()
    }
    assert got == {i: 0 for i in range(16)}
