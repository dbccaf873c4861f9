"""Round-4 TPC-H widening — the remaining canonical shapes expressible on
the synthetic schema (no commitdate/receiptdate/shipmode/partsupp columns,
so q4/q12/q16 substitute available predicates of the same relational
shape).

Registered as its own module so the rotation policy in
``queries.__init__`` can schedule these into the driver's bounded
correctness window independently of the (already multiply-recorded)
relational bulk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import R, pround
from prajna_spark.queries import query
from prajna_spark.session import tune
from prajna_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tune(spark)
    return [load_table(spark, n, sf_dir) for n in names]


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
    tags=("semi-join", "exists", "tpch-q4-shape"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with an
    equi key + inequality residual (shipped after ordering stands in for
    commit<receipt — the synthetic lineitem has no commit/receipt dates).
    The date filter prunes orders at the scan; the semi join never
    duplicates orders however many lineitems match."""
    od, li = _t(spark, sf_dir, "orders", "lineitem")
    o = od.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        o.join(li.select("l_orderkey", "l_shipdate"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           {R('sum(l.l_extendedprice * (1 - l.l_discount))', 2)} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    JOIN customer c ON c.c_custkey   = o.o_custkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
       OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    tags=("join", "multi-join", "broadcast", "tpch-q7-shape"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume. The two
    fact tables join on their keys; supplier and both nation legs are
    broadcast (sublinear dims), so the only data-sized shuffles are
    lineitem⋈orders and the customer attach. The nation-pair disjunction
    filters AFTER the broadcast attach — a row-local predicate."""
    li, od, cu, su, na = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    sn = na.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = na.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    j = (
        li.join(od.select("o_orderkey", "o_custkey"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu.select("c_custkey", "c_nationkey"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(su.select("s_suppkey", "s_nationkey")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .where(pair)
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE year(l.l_shipdate) = 1996
    GROUP BY 1
    """,
    tags=("join", "conditional-agg", "tpch-q12-shape"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-category urgent/non-urgent line counts in ONE
    conditional-aggregation pass (returnflag stands in for shipmode). Both
    counts come from the same scan+join — never two passes; partial
    aggregation collapses the counts map-side before the 3-group shuffle."""
    li, od = _t(spark, sf_dir, "lineitem", "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(F.year("l_shipdate") == 1996)
        .select("l_orderkey", "l_returnflag")
        .join(od.select("o_orderkey", "o_orderpriority"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {R("1e2 * sum(CASE WHEN p.p_type = 'PROMO' "
              "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0e0 END)"
              " / sum(l.l_extendedprice * (1 - l.l_discount))", 4)}
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE year(l.l_shipdate) = 1996 AND month(l.l_shipdate) = 9
    """,
    tags=("join", "broadcast", "ratio-agg", "tpch-q14-shape"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share. part is broadcast (fixed-size
    dim), so the month of lineitem never shuffles — the ratio's two sums
    fold in one partial-aggregated pass to a single row."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where((F.year("l_shipdate") == 1996) & (F.month("l_shipdate") == 9))
        .join(F.broadcast(pa.select("p_partkey", "p_type")),
              F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            pround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {R('sum(l.l_extendedprice * (1 - l.l_discount))', 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1  AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 60)
    """,
    tags=("join", "disjunctive-predicate", "pushdown", "tpch-q19-shape"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of (brand, size, quantity) triples.
    Catalyst extracts the common single-side conjuncts from the OR (brand
    and size only touch part; quantity only lineitem), pushing partial
    filters below the broadcast join — the scan reads less than the naive
    post-join disjunction implies."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    j = li.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(pa.select("p_partkey", "p_brand", "p_size")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    clause = lambda b, s1, s2, q1, q2: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(s1, s2)
        & (F.col("l_quantity") >= q1)
        & (F.col("l_quantity") <= q2)
    )
    return (
        j.where(
            clause("Brand#1", 1, 15, 1, 20)
            | clause("Brand#2", 10, 30, 10, 40)
            | clause("Brand#3", 20, 50, 20, 60)
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH ab AS (SELECT avg(c_acctbal) AS v FROM customer WHERE c_acctbal > 0e0)
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_customers,
           {R('sum(c.c_acctbal)', 2)} AS total_bal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.v
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
    GROUP BY 1
    """,
    tags=("anti-join", "scalar-subquery", "tpch-q22-shape"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no LARGE
    orders (mktsegment stands in for phone country codes; the price floor
    keeps the anti-join selective on this all-customers-order synthetic
    data). The scalar average is a one-row aggregate broadcast onto
    customer (never a collect), the NOT EXISTS is a LEFT ANTI join on
    custkey, and the final rollup shuffles only surviving customers."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    avg_bal = cu.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__ab"))
        .join(od.where(F.col("o_totalprice") > 300000).select("o_custkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            pround(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt,
           count(*) AS n_lines
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY 1, 2
    """,
    tags=("join", "distinct-agg", "tpch-q16-shape"),
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier variety per brand/size (the
    synthetic schema has no partsupp, so lineitem supplies the
    part-supplier pairs). Exercises the distinct-aggregate physical path:
    Catalyst plans COUNT(DISTINCT) as a two-phase Expand + partial/final
    aggregation, deduping map-side before the shuffle; part is broadcast
    and its selective filters push to the scan."""
    pa, li = _t(spark, sf_dir, "part", "lineitem")
    p = pa.where(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "profile_orders_columns",
    oracle="""
    -- one-pass long-format column profile (null/distinct/min/max per col)
    SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
    FROM orders
    """,
    tags=("profiling", "validation", "pipeline"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (pipeline.validate.profile): null counts,
    exact distinct counts, and native-type min/max for four orders
    columns in a SINGLE aggregation job — the multi-distinct Expand
    rewrite gives one shuffle for all columns, where the naive spelling
    (the oracle's UNION ALL) scans once per column. The
    delivery-inspection step a 100 TB ingest runs before accepting data."""
    from prajna_spark.pipeline.validate import profile

    (od,) = _t(spark, sf_dir, "orders")
    return profile(
        od, ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
    )


@query(
    "q8_market_share",
    oracle=f"""
    -- NATION_3 suppliers' share of revenue to ASIA customers per year
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           {R('''sum(CASE WHEN sn.n_name = 'NATION_3'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0e0 END)
              / sum(l.l_extendedprice * (1 - l.l_discount))''', 6)}
             AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey  = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey    = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
    tags=("join", "ratio-agg", "broadcast", "tpch-q8-shape"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside one region's
    demand, per year. Supplier/nation/region legs broadcast; the share is
    a conditional-sum ratio in the same aggregation pass (never two
    scans)."""
    li, od, cu, su, na, re = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation", "region",
    )
    cn = na.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = na.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(od.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu.select("c_custkey", "c_nationkey"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(re.where(F.col("r_name") == "ASIA")
                          .select("r_regionkey")),
              F.col("r_regionkey") == F.col("cn_reg"))
        .join(F.broadcast(su.select("s_suppkey", "s_nationkey")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            pround(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    -- supplier(s) with the maximum half-year revenue: aggregate view +
    -- scalar-max filter (ties all kept, deterministic)
    WITH rev AS (
      SELECT l_suppkey,
             {R('sum(l_extendedprice * (1 - l_discount))', 2)} AS total_rev
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("join", "scalar-subquery", "aggregate-view", "tpch-q15-shape"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' is computed once (scoped
    persist — both the max and the filter read the aggregated frame, not
    the raw join), the scalar max broadcasts back onto it, ties survive.
    Rounding happens BEFORE the max comparison on both engines so the
    equality is exact."""
    from prajna_spark.operators.lifecycle import scoped_persist

    li, od, su = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    rev = scoped_persist(
        li.join(
            od.where(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-07-01")
            ).select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_suppkey")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("__mx"))
        .join(F.broadcast(su.select("s_suppkey", "s_name")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q20_supplier_concentration",
    oracle=f"""
    -- suppliers shipping > 15% of any part's total shipped quantity: the
    -- share-of-group shape (partsupp availqty stands in as shipped share)
    WITH ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2
    ), tot AS (
      SELECT l_partkey, sum(qty) AS part_qty FROM ps GROUP BY 1
    )
    SELECT DISTINCT ps.l_suppkey AS s_suppkey
    FROM ps JOIN tot ON tot.l_partkey = ps.l_partkey
    WHERE ps.qty > 15e-2 * tot.part_qty
    """,
    tags=("share-of-group", "two-level-agg", "tpch-q20-shape"),
)
def q20_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: share-of-group concentration — suppliers holding
    > 15% of some part's shipped quantity. Two-level aggregation (the
    coarse level derives from the fine level's partials, the cascade
    trick) then an equi-join comparison; no window over the fact table."""
    from prajna_spark.operators.lifecycle import scoped_persist

    (li,) = _t(spark, sf_dir, "lineitem")
    ps = scoped_persist(
        li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    return (
        ps.join(tot, "l_partkey")
        .where(F.col("qty") > 0.15 * F.col("part_qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {R('sum(l_extendedprice * l_discount)', 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("scan-pushdown", "single-agg", "tpch-q6-shape"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-plus-aggregate classic. Every
    predicate reaches the parquet scan (date + discount + quantity all in
    PushedFilters), the aggregation is one map-side-combined pass to a
    single row — at 100 TB this query is I/O-bound by exactly the
    row-groups the filters can't skip, nothing else."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    -- customers-per-order-count histogram (LEFT join keeps zero-order
    -- customers in the c_count = 0 bucket)
    WITH oc AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM oc GROUP BY 1
    """,
    tags=("left-join", "two-level-agg", "histogram", "tpch-q13-shape"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution-of-counts double aggregation.
    Level 1 counts orders per customer THROUGH a left join (zero-order
    customers stay, with count 0); level 2 histograms those counts — a
    tiny shuffle keyed on the count value. The join predicate lives in
    the join condition, not a WHERE (which would silently drop the
    zero-order bucket)."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    oc = (
        cu.select("c_custkey")
        .join(
            od.where(F.col("o_orderpriority") != "1-URGENT").select(
                "o_custkey", "o_orderkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return oc.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    -- revenue from lineitems under 40% of their part's average quantity:
    -- the per-group-average threshold shape (correlated subquery
    -- decorrelated to an aggregate + join)
    WITH avgq AS (
      SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY 1
    )
    SELECT {R('sum(l.l_extendedprice) / 7e0', 2)} AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 4e-1 * a.aq
    """,
    tags=("correlated-agg", "decorrelated-join", "tpch-q17-shape"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average-quantity threshold. The
    correlated subquery decorrelates to ONE aggregate over the fact table
    joined back on the part key — the fact table is scanned twice but
    shuffled narrow both times ((partkey, avg) and the join); no window
    over the fact table."""
    from prajna_spark.operators.lifecycle import scoped_persist

    (li,) = _t(spark, sf_dir, "lineitem")
    slim = scoped_persist(
        li.select("l_partkey", "l_quantity", "l_extendedprice")
    )
    avgq = slim.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        slim.join(avgq, "l_partkey")
        .where(F.col("l_quantity") < 0.4 * F.col("aq"))
        .agg(
            pround(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    -- minimum-cost supplier per part (Q2): the synthetic schema has no
    -- partsupp, so the observed unit cost min(extendedprice/quantity)
    -- per (part, supplier) from lineitem stands in for ps_supplycost
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l GROUP BY 1, 2
    ), eligible AS (
      SELECT c.l_partkey AS p_partkey, c.unit_cost,
             s.s_name, s.s_acctbal, n.n_name
      FROM costs c
      JOIN part p ON p.p_partkey = c.l_partkey
        AND p.p_type = 'SMALL' AND p.p_size IN (5, 10, 15, 20)
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.unit_cost
    FROM eligible e
    JOIN (SELECT p_partkey, min(unit_cost) AS min_cost
          FROM eligible GROUP BY 1) m
      ON m.p_partkey = e.p_partkey AND e.unit_cost = m.min_cost
    """,
    tags=("correlated-min", "decorrelated-join", "tpch-q2-shape"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part MIN-cost supplier within a region
    (ref merge-join tier `src/CoreLib/DKV.fs:170-230` has no correlated
    form at all — this is the decorrelated upgrade). No partsupp table in
    the synthetic schema, so unit cost is derived from lineitem:
    min(l_extendedprice / l_quantity) per (partkey, suppkey) — ONE
    narrow-key shuffle over the fact table. Everything after that
    aggregate is dimension-sized: part/supplier/nation/region are
    broadcast, and the correlated `cost = (SELECT min ...)` decorrelates
    to a per-part min aggregate joined back (broadcast — eligible is
    bounded by |part|x|suppliers-per-part|). Division and min are exact
    IEEE ops, so the equality join on unit_cost is engine-portable with
    no rounding."""
    li, pa, su, na, rg = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    from prajna_spark.operators.lifecycle import scoped_persist

    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    p = pa.where(
        (F.col("p_type") == "SMALL") & F.col("p_size").isin(5, 10, 15, 20)
    ).select("p_partkey")
    sdim = (
        su.join(na, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            rg.where(F.col("r_name") == "ASIA"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = scoped_persist(
        costs.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sdim), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    mins = eligible.groupBy("p_partkey").agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eligible.join(
            F.broadcast(mins).withColumnRenamed("p_partkey", "m_partkey"),
            (F.col("m_partkey") == F.col("p_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
    )


@query(
    "q9_profit_by_nation_year",
    oracle=f"""
    -- product-type profit measure (Q9): supply cost proxied as 60% of
    -- p_retailprice (no partsupp in the synthetic schema); 'red' parts
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           {R("sum(l.l_extendedprice * (1 - l.l_discount)"
              " - 6e-1 * p.p_retailprice * l.l_quantity)", 2)} AS profit,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    tags=("star-join", "broadcast", "tpch-q9-shape"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order-year over a
    5-table join. part (LIKE-filtered, broadcast) prunes lineitem FIRST —
    ~13% selectivity before the only fact⋈fact shuffle (lineitem⋈orders
    on orderkey); supplier⋈nation is a broadcast dim. At 100x scale the
    plan's single data-sized shuffle is the orderkey join, AQE-managed;
    the rollup output is |nations|x|years| rows."""
    li, pa, su, na, od = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    p = pa.where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    sdim = su.join(na, F.col("n_nationkey") == F.col("s_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    facts = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sdim), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "l_orderkey",
            "nation",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        facts.join(
            od.select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(
            pround(F.sum("amount"), 2).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q11_important_stock",
    oracle=f"""
    -- important stock identification (Q11): parts whose traded value
    -- through NATION_3 suppliers exceeds 0.2% of that nation's total
    WITH val AS (
      SELECT l.l_partkey AS p_partkey,
             sum(l.l_extendedprice * l.l_quantity) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
        AND n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT p_partkey, {R('value', 2)} AS part_value
    FROM val WHERE value > (SELECT sum(value) * 2e-3 FROM val)
    """,
    tags=("global-scalar", "broadcast", "tpch-q11-shape"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered against a GLOBAL
    fraction-of-total threshold. The scalar subquery is a one-row
    aggregate cross-joined back as a broadcast — never a collect()
    (same spelling as q15's max-revenue scalar). One narrow shuffle
    (partkey rollup of the nation-filtered fact slice); the threshold
    re-aggregation runs over the per-part frame (|parts| rows), not the
    fact table."""
    li, su, na = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    from prajna_spark.operators.lifecycle import scoped_persist

    sdim = su.join(
        na.where(F.col("n_name") == "NATION_3"),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey")
    val = scoped_persist(
        li.join(F.broadcast(sdim), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    threshold = val.agg((F.sum("value") * F.lit(2e-3)).alias("threshold"))
    return (
        val.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("threshold"))
        .select("p_partkey", pround(F.col("value"), 2).alias("part_value"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    -- suppliers who kept orders waiting (Q21): 'late' adapted to
    -- shipped >60 days after ordering (no commit/receipt dates in the
    -- synthetic lineitem); EXISTS/NOT EXISTS pair rewritten to exact
    -- per-order distinct-supplier aggregates
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
        AND o.o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM fl GROUP BY 1
    ), culprit AS (
      SELECT DISTINCT f.l_orderkey, f.l_suppkey FROM fl f WHERE f.late = 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM culprit c
    JOIN per_order po ON po.l_orderkey = c.l_orderkey
      AND po.n_supp > 1 AND po.n_late = 1
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    GROUP BY 1
    """,
    tags=("exists", "not-exists", "decorrelated-agg", "tpch-q21-shape"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS (another supplier on the order) +
    NOT EXISTS (another LATE supplier) pair — the hardest correlated
    shape in the suite — decorrelated to ONE per-order aggregate
    (distinct suppliers, distinct late suppliers) instead of two extra
    passes over lineitem. The fact⋈fact orderkey join happens once into
    a scope-persisted slim frame feeding both the aggregate and the
    culprit side; supplier/nation/region are broadcast. 'Late' is
    shipdate > orderdate + 60 days (the synthetic schema has no
    commit/receipt dates)."""
    li, od, su, na, rg = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "region"
    )
    from prajna_spark.operators.lifecycle import scoped_persist

    fo = od.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    fl = scoped_persist(
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fo, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    per_order = fl.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    culprit = fl.where(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    sdim = (
        su.join(na, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            rg.where(F.col("r_name") == "EUROPE"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        culprit.withColumnRenamed("l_orderkey", "c_orderkey")
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("c_orderkey"),
        )
        .join(F.broadcast(sdim), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
