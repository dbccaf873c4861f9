"""Scalar-function surface (SURVEY.md §2.10) — string/date/math/JSON/
conditional, all built-in ``pyspark.sql.functions`` (JVM codegen, no UDFs).

The reference has NO scalar library — every scalar op is user .NET code
inside map/filter closures (e.g. regex in
samples/DistributedLogAnalysis/DistributedLogAnalysis.fs:104-117, string
split in samples/examples/FSharpExamples/WordCount.fs:36). The declared
rebuild surface below is the SQL-checkable equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import R, pround
from prajna_spark.queries import query
from prajna_spark.session import tune
from prajna_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, name, sf_dir)


@query(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                              AS brand_uc,
           lower(p_type)                               AS type_lc,
           substring(p_name, 1, 8)                     AS name_prefix,
           length(p_name)                              AS name_len,
           concat(p_brand, ':', p_type)                AS brand_type,
           regexp_extract(p_type, '([a-z]+)$', 1)      AS type_last_word,
           replace(p_name, ' ', '_')                   AS name_snake,
           trim(concat(' ', p_brand, ' '))             AS brand_trim
    FROM part
    WHERE p_name LIKE '%a%'
    """,
    tags=("scalar", "string"),
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: upper/lower/substr/length/concat/regexp_extract/
    replace/trim/LIKE — all codegen'd, filter pushed to scan."""
    pa = _t(spark, sf_dir, "part")
    return pa.where(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_type", "([a-z]+)$", 1).alias("type_last_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    )


@query(
    "scalar_date_orders",
    oracle="""
    SELECT o_orderkey,
           year(CAST(o_orderdate AS DATE))    AS order_year,
           month(CAST(o_orderdate AS DATE))   AS order_month,
           day(CAST(o_orderdate AS DATE))     AS order_day,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY >= TIMESTAMP '1997-01-01'
               AS recent_window,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
               AS days_to_eoy,
           CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS epoch_day
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    tags=("scalar", "date"),
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date surface: year/month/day/date_add/datediff + raw-epoch
    arithmetic (timezone-free, matching the UTC-pinned session)."""
    od = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return od.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        (
            F.date_add(d, 30).cast("timestamp") >= F.lit("1997-01-01").cast("timestamp")
        ).alias("recent_window"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias("days_to_eoy"),
        F.floor(F.col("o_orderdate").cast("timestamp_ltz").cast("long") / 86400)
        .cast("long")
        .alias("epoch_day"),
    )


@query(
    "scalar_math_lineitem",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {R('abs(l_discount - 0.05)', 4)}            AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT)           AS qty_floor,
           CAST(ceil(l_quantity / 7) AS BIGINT)        AS qty_ceil7,
           {R('pow(l_discount + 1, 2)', 6)}            AS disc_sq,
           {R('sqrt(l_extendedprice)', 4)}             AS price_sqrt,
           {R('ln(l_extendedprice + 1)', 6)}           AS price_ln,
           CAST(l_quantity AS BIGINT) % 5              AS qty_mod5
    FROM lineitem
    WHERE l_linenumber = 1 AND l_extendedprice > 0
    """,
    tags=("scalar", "math"),
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: abs/round/floor/ceil/pow/sqrt/ln/mod/cast."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where((F.col("l_linenumber") == 1) & (F.col("l_extendedprice") > 0)).select(
        "l_orderkey",
        "l_linenumber",
        pround(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        pround(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        pround(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        pround(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod5"),
    )


@query(
    "scalar_json_events",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    """,
    tags=("scalar", "json"),
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON surface: get_json_object over the events.props payload."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.where(F.col("event_type").isin("click", "view", "purchase")).select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        (k % 10).alias("k_bucket"),
    )


@query(
    "case_coalesce_customer",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_norm,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           greatest(c_acctbal, 0.0)  AS bal_clamped,
           least(CAST(c_nationkey AS BIGINT), 9) AS nation_capped
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def case_coalesce_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional surface: when/otherwise, nullif, coalesce,
    greatest/least."""
    cu = _t(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_norm"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_nationkey").cast("long"), F.lit(9)).alias("nation_capped"),
    )


@query(
    "array_ops_lineitem",
    oracle=f"""
    SELECT l_orderkey,
           len(qtys)                                    AS n_items
         , {R('list_min(qtys)', 2)}                     AS min_qty
         , {R('list_max(qtys)', 2)}                     AS max_qty
         , list_contains(qtys, 1.0)                     AS has_single
    FROM (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    """,
    tags=("scalar", "array"),
)
def array_ops_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: size/array_min/array_max/array_contains over a
    collected-and-sorted per-key array (order-canonical for hashing)."""
    li = _t(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("qtys")
    )
    return grouped.select(
        "l_orderkey",
        F.size("qtys").cast("long").alias("n_items"),
        pround(F.array_min("qtys"), 2).alias("min_qty"),
        pround(F.array_max("qtys"), 2).alias("max_qty"),
        F.array_contains("qtys", 1.0).alias("has_single"),
    )


@query(
    "percentile_order_totals",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n,
           {R('quantile_cont(o_totalprice, 0.5)', 4)}  AS p50,
           {R('quantile_cont(o_totalprice, 0.9)', 4)}  AS p90,
           {R('quantile_cont(o_totalprice, 0.99)', 4)} AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("percentile", "statistics", "upgrade"),
)
def percentile_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (F.percentile == DuckDB
    quantile_cont, both (n-1)*p linear interpolation). The VM Hub paper's
    telemetry percentiles (paper §5.2 '99.9-percentile latency'), as a
    declarative aggregate. At 100 TB prefer approx_percentile (sketch,
    mergeable map-side); exact percentile is the oracle-checkable twin."""
    od = _t(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        pround(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        pround(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "map_ops_events",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT)             AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_cat,
           CAST(props->>'$.k' AS BIGINT)                  AS k_typed,
           CAST(props->>'$.k' AS BIGINT)                  AS vals_sum
    FROM events
    WHERE event_id % 5 = 0
    """,
    tags=("scalar", "map", "from_json"),
)
def map_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/typed-JSON surface (SURVEY §2.10: map_keys/map_values/from_json):
    props parsed BOTH as map<string,long> (generic map ops) and as a typed
    struct (schema-on-read projection) — same values, two access paths."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,long>")
    typed = F.from_json("props", "k long")
    return ev.where(F.col("event_id") % 5 == 0).select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_cat"),
        typed.getField("k").alias("k_typed"),
        F.aggregate(F.map_values(m), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "vals_sum"
        ),
    )


@query(
    "stats_corr_lineitem",
    oracle=f"""
    -- statistical aggregate surface: correlation / sample covariance /
    -- sample stddev per return flag, one aggregation pass; both engines
    -- use the textbook two-pass-free formulas so values agree to ~1e-11
    -- and round identically at 6/3 decimals
    SELECT l_returnflag,
           {R('corr(l_quantity, l_extendedprice)', 6)} AS qty_price_corr,
           {R('covar_samp(l_quantity, l_extendedprice)', 3)} AS qty_price_covar,
           {R('stddev_samp(l_extendedprice)', 3)} AS price_stddev,
           count(*) AS n_lines
    FROM lineitem GROUP BY 1
    """,
    tags=("scalar", "statistics", "corr"),
)
def stats_corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (SURVEY §2.10 scalar surface: the
    moment-based tier beyond sum/avg): Pearson correlation, sample
    covariance and sample stddev per group in ONE hash-aggregation pass
    — Spark's corr/covar/stddev are single-pass co-moment partials that
    merge map-side like any algebraic aggregate (no per-group sort, no
    second scan). The profiling step that catches a broken feature
    column (constant => NULL corr, scale drift => stddev jump) before a
    100 TB training run."""
    tune(spark)
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        pround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        pround(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias(
            "qty_price_covar"
        ),
        pround(F.stddev_samp("l_extendedprice"), 3).alias("price_stddev"),
        F.count(F.lit(1)).alias("n_lines"),
    )
