"""The engine's declared query surface (driver correctness gate).

One entry per implemented operator from SURVEY §2 plus the LLM-pipeline
extensions. Each query is a ``(spark, sf_dir) -> DataFrame`` callable
built on the engine's op library; ``ORACLES`` holds the equivalent
DuckDB SQL (same column names — the driver hashes columns sorted by
name). Queries without an oracle (engine-specific hashing, approximate
ops) get a rows-only check.

Conventions for hash-stable cross-engine comparison:
- every aggregate/computed column is aliased identically on both sides;
- double aggregates are rounded (2-6 dp) on both sides — Spark and
  DuckDB accumulate floating sums in different orders;
- DuckDB integer sums/extracts are cast to match Spark's output types
  (SUM(int) is HUGEINT in DuckDB, long in Spark; year() is BIGINT in
  DuckDB, int in Spark).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nhs_data_pipeline_spark import functions as nf
from nhs_data_pipeline_spark.llm import dedup as dd
from nhs_data_pipeline_spark.llm import similarity as sim
from nhs_data_pipeline_spark.llm import text as tx
from nhs_data_pipeline_spark.ops import binned as ob
from nhs_data_pipeline_spark.ops import core as oc
from nhs_data_pipeline_spark.orgchange import adjust as oa
from nhs_data_pipeline_spark.orgchange import closure as ocl


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ===========================================================================
# Headline TPC-H-style queries (A1, J1, F13 composites; bench workload)
# ===========================================================================

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan -> partial+final hash aggregate.
    Filter and the two projected column sets push down into the parquet
    scan; no joins, one shuffle on the (tiny) group key."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> join -> agg -> top-k.
    The filtered customer side is broadcast; lineitem never shuffles
    before its filter. Top-k = sort with limit (Spark's TakeOrdered)."""
    cutoff = F.lit("1995-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with all dimension sides broadcast;
    the only large shuffle is the final group-by on n_name (25 keys —
    AQE coalesces)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate is
    parquet-pushable, zero shuffles beyond the final single-row agg."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


# ===========================================================================
# Projections / filters (P1, P2, P6, P7, P8, P9, P13, P14)
# ===========================================================================

@query(
    "p1_project_filter",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_returnflag <> 'R'
    """,
)
def p1_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P6/P7 — explicit column keep + predicate filters; both reach
    the parquet scan (PushedFilters + pruned ReadSchema)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_returnflag") != "R")
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )


@query(
    "p2_pattern_select",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_retailprice_ratio
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROUND(l_extendedprice * (1 - l_discount), 4) AS l_retailprice_ratio
      FROM lineitem
    )
    """,
)
def p2_pattern_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — regex column selection over the schema (dplyr contains())."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "l_retailprice_ratio",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
    )
    return oc.select_by_pattern(li, r"^l_(orderkey|linenumber|.*price.*)$")


@query(
    "p3_drop_all_null_columns",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
)
def p3_drop_all_null_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — drop columns that are entirely NULL (one aggregate pass).
    An injected all-NULL column disappears; partially-null survives."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("ghost", F.when(F.lit(False), F.lit(1)))
    )
    return oc.drop_all_null_columns(o)


@query(
    "p8_filter_isin",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def p8_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — set-membership row filter (%in%)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "p9_filter_year_range",
    """
    SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS order_year
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1994 AND 1996
    """,
)
def p9_filter_year_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — date-part era predicate (filter(year(d) >= ...))."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate").between(1994, 1996))
        .select("o_orderkey", F.year("o_orderdate").alias("order_year"))
    )


@query(
    "p13_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def p13_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 — distinct over a small key pair (hash aggregate)."""
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "p14_first_per_group",
    """
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def p14_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 — first row per group (slice(1)) with deterministic tiebreak."""
    return oc.first_per_group(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
    )


# ===========================================================================
# Joins (J1, J2, J3, J4)
# ===========================================================================

@query(
    "j1_natural_left_join",
    """
    SELECT c.c_mktsegment AS mktsegment, COUNT(o.o_orderkey) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_value
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j1_natural_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — natural left join on the common-column set (plyr::join),
    customer side kept whole; aggregate per segment. The join key set is
    computed from the schemas, not hand-listed."""
    c = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    joined = oc.natural_join(c, o, how="left")
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


@query(
    "j2_coalesce_columns",
    """
    SELECT COALESCE(CASE WHEN o_orderstatus = 'O' THEN o_orderpriority END,
                    CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END,
                    'none') AS priority_merged,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def j2_coalesce_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — era-variant parallel columns merged by left-to-right
    coalesce (consolidate_columns): a pure projection, no join."""
    o = (
        _t(spark, sf_dir, "orders")
        .withColumn("prio_era_a", F.when(F.col("o_orderstatus") == "O", F.col("o_orderpriority")))
        .withColumn("prio_era_b", F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority")))
    )
    merged = oc.coalesce_columns(o, {"priority_merged": ["prio_era_a", "prio_era_b"]})
    return merged.groupBy(
        F.coalesce("priority_merged", F.lit("none")).alias("priority_merged")
    ).agg(F.count("*").alias("n"))


@query(
    "j3_transitive_closure",
    """
    WITH RECURSIVE edges AS (
      SELECT 'N' || CAST(n_nationkey AS VARCHAR) AS old_code,
             'N' || CAST(n_nationkey - 5 AS VARCHAR) AS new_code
      FROM nation WHERE n_nationkey >= 5
    ),
    walk(old_code, final_code, n_hops) AS (
      SELECT old_code, new_code, 1 FROM edges
      UNION ALL
      SELECT w.old_code, e.new_code, w.n_hops + 1
      FROM walk w JOIN edges e ON w.final_code = e.old_code
    )
    SELECT old_code, final_code, n_hops FROM walk
    WHERE final_code NOT IN (SELECT old_code FROM edges)
    """,
)
def j3_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — iterative successor closure (driver loop of broadcast
    self-joins; no recursive CTE in Spark). Synthetic chain edges
    N5->N0, ..., N24->N19 resolve in up to 4 hops."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") >= 5)
    edges = n.select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("old_code"),
        F.concat(F.lit("N"), (F.col("n_nationkey") - 5).cast("string")).alias("new_code"),
    )
    return ocl.successor_closure(edges)


@query(
    "j4_semi_join",
    """
    SELECT CAST(c.c_nationkey AS INTEGER) AS nationkey, COUNT(*) AS n_customers_with_orders
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — left-semi membership filter (the affected-trust split)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers_with_orders"))
    )


@query(
    "j4_anti_join",
    """
    SELECT CAST(c.c_nationkey AS INTEGER) AS nationkey, COUNT(*) AS n_customers_without_orders
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — left-anti complement (the unaffected partition)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


# ===========================================================================
# Aggregations (A1, A2, A3, A4, A5, A6)
# ===========================================================================

@query(
    "a1_na_preserving_sum",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN NULL ELSE l_quantity END) AS DOUBLE), 2) AS qty_sum,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_na_preserving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — NA-preserving grouped sum: all-NULL groups yield NULL (not
    0). The 'R' groups are forced all-NULL to prove the semantics;
    Spark's built-in sum already matches the reference's
    ifelse(all(is.na(.)), NA, sum(na.rm=TRUE))."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "qty_nullable",
        F.when(F.col("l_returnflag") == "R", F.lit(None)).otherwise(F.col("l_quantity")),
    )
    out = oc.grouped_sum_na_preserving(
        li, ["l_returnflag", "l_linestatus"], ["qty_nullable"]
    ).withColumnRenamed("qty_nullable", "qty_sum_raw")
    n = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"))
    )
    return oc.natural_join(out, n, how="left").select(
        "l_returnflag",
        "l_linestatus",
        F.round("qty_sum_raw", 2).alias("qty_sum"),
        "n_rows",
    )


@query(
    "a2_count_distinct",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — count + distinct count per group (merger-vs-name-change
    classifier shape)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "a3_grouped_max_window",
    """
    SELECT DISTINCT o_custkey, max(o_orderdate) OVER (PARTITION BY o_custkey) AS last_order
    FROM orders
    """,
)
def a3_grouped_max_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — group max broadcast onto rows via window (change_date =
    max(date)), then distinct."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return (
        oc.grouped_max_over(o, ["o_custkey"], "o_orderdate", "last_order")
        .select("o_custkey", "last_order")
        .distinct()
    )


@query(
    "a4_grouped_any_flag",
    """
    SELECT DISTINCT o_custkey,
           CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                OVER (PARTITION BY o_custkey) AS INTEGER) AS has_final_order
    FROM orders
    """,
)
def a4_grouped_any_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — group-level existential flag on every row (any())."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    return (
        oc.grouped_any_flag(o, ["o_custkey"], F.col("o_orderstatus") == "F", "has_final_order")
        .select("o_custkey", "has_final_order")
        .distinct()
    )


@query(
    "a5_collect_set_sorted",
    """
    SELECT o_orderpriority, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def a5_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-group distinct set, canonicalized (sorted, joined) for
    cross-engine comparison (collect_set is unordered)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"))
    )


@query(
    "a6_resample_annual",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_value,
           ROUND(AVG(o_totalprice), 4) AS avg_value
    FROM orders GROUP BY 1
    """,
)
def a6_resample_annual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — periodicity resampling (quarterly->annual by sum and mean),
    the reference's declared-but-unbuilt roadmap item."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_value"),
        )
    )


# ===========================================================================
# Windows (W1, W2, W3, W5, W6)
# ===========================================================================

@query(
    "w1_cumulative_sum",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS spend_to_date
    FROM orders
    """,
)
def w1_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-group running sum under explicit ordering."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    out = oc.cumulative_sum(
        o, ["o_custkey"], ["o_orderdate", "o_orderkey"], "o_totalprice", "spend_raw"
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("spend_raw", 2).alias("spend_to_date")
    )


@query(
    "w2_lag",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
    FROM orders
    """,
)
def w2_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — lag over ordered group (previous bin's cumulative percent
    shape)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        )
    )


@query(
    "w3_fill_down",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(last_value(CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_extendedprice END IGNORE NULLS)
                 OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS price_filled
    FROM lineitem
    """,
)
def w3_fill_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — directional fill (tidyr fill .direction='down') with nulls
    injected on even line numbers; leading nulls stay null.

    (l_orderkey, l_linenumber) is not unique in the synthetic data, so
    the window orders by (l_linenumber, l_extendedprice) — fills must
    define a total order or they are nondeterministic under shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("__tiebreak"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(None))
        .otherwise(F.col("l_extendedprice"))
        .alias("price_filled"),
    )
    out = oc.fill_directional(
        li, ["price_filled"], ["l_orderkey"], ["l_linenumber", "__tiebreak"], "down"
    )
    return out.select(
        "l_orderkey", "l_linenumber", F.round("price_filled", 2).alias("price_filled")
    )


@query(
    "w5_binned_median",
    """
    WITH bins AS (
      SELECT l_returnflag, FLOOR(l_quantity / 5) * 5 AS bin_lower, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT *, SUM(cnt) OVER (PARTITION BY l_returnflag) AS total,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin_lower
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM bins
    ), x AS (
      SELECT *, cum / total AS cp,
             lag(cum / total) OVER (PARTITION BY l_returnflag ORDER BY bin_lower) AS pp
      FROM c
    )
    SELECT l_returnflag,
           MIN(CASE WHEN cp >= 0.5 AND (pp IS NULL OR pp < 0.5) THEN bin_lower + 0.5 END) AS median
    FROM x GROUP BY l_returnflag
    """,
)
def w5_binned_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — median from a binned distribution (RTT wait-bin median):
    cumulative share crossing 0.5, midpoint estimate."""
    li = _t(spark, sf_dir, "lineitem")
    bins = (
        li.groupBy(
            "l_returnflag", (F.floor(F.col("l_quantity") / 5) * 5).alias("bin_lower")
        )
        .agg(F.count("*").alias("cnt"))
    )
    return ob.binned_median(bins, ["l_returnflag"], "bin_lower", "cnt")


@query(
    "w6_pct_within_threshold",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN bin_lower < 25 THEN cnt END) * 1.0 / SUM(cnt), 6) AS pct_within
    FROM (
      SELECT l_returnflag, FLOOR(l_quantity / 5) * 5 AS bin_lower, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ) GROUP BY l_returnflag
    """,
)
def w6_pct_within_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — percent-within-threshold from binned counts (percent within
    18 weeks shape)."""
    li = _t(spark, sf_dir, "lineitem")
    bins = (
        li.groupBy(
            "l_returnflag", (F.floor(F.col("l_quantity") / 5) * 5).alias("bin_lower")
        )
        .agg(F.count("*").alias("cnt"))
    )
    out = ob.pct_within_threshold(bins, ["l_returnflag"], "bin_lower", "cnt", 25)
    return out.select("l_returnflag", F.round("pct_within", 6).alias("pct_within"))


# ===========================================================================
# Set ops / reshape (U1, U2, R1, R4, R7, R8)
# ===========================================================================

@query(
    "u1_union_by_name",
    """
    WITH unioned AS (
      SELECT l_orderkey, l_extendedprice, l_quantity, 'era_a' AS era FROM lineitem WHERE l_linenumber = 1
      UNION ALL BY NAME
      SELECT l_orderkey, l_extendedprice, CAST(NULL AS DOUBLE) AS l_quantity, 'era_b' AS era
      FROM lineitem WHERE l_linenumber = 2
    )
    SELECT era, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS price_sum,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS qty_sum
    FROM unioned GROUP BY era
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — union-by-name with missing-column NULL fill (rbindlist
    fill=TRUE), the reference's workhorse for stacking eras."""
    li = _t(spark, sf_dir, "lineitem")
    era_a = (
        li.filter(F.col("l_linenumber") == 1)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .withColumn("era", F.lit("era_a"))
    )
    era_b = (
        li.filter(F.col("l_linenumber") == 2)
        .select("l_orderkey", "l_extendedprice")
        .withColumn("era", F.lit("era_b"))
    )
    unioned = oc.union_by_name([era_a, era_b])
    return unioned.groupBy("era").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        F.round(F.sum("l_quantity"), 2).alias("qty_sum"),
    )


@query(
    "u2_union_distinct",
    """
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION
      SELECT c_custkey AS custkey FROM customer
    )
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — vector union + dedup (unique(c(a, b)))."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return oc.union_by_name([o, c]).distinct()


@query(
    "r1_unpivot",
    """
    SELECT measure, ROUND(SUM(value), 2) AS total, COUNT(*) AS n
    FROM (
      SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
    ) GROUP BY measure
    """,
)
def r1_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 — wide->long unpivot (pivot_longer over wait-bin columns)."""
    li = _t(spark, sf_dir, "lineitem")
    long = oc.unpivot(
        li,
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.round(F.sum("value"), 2).alias("total"), F.count("*").alias("n")
    )


@query(
    "r4_clean_names",
    """
    SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS total_quantity,
           ROUND(SUM(l_tax), 2) AS x1_tax_rate
    FROM lineitem GROUP BY l_returnflag
    """,
)
def r4_clean_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 — janitor make_clean_names on a deliberately dirty schema:
    'Total Quantity!' -> total_quantity, '1 Tax Rate' -> x1_tax_rate."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.col("l_quantity").alias("Total Quantity!"),
        F.col("l_tax").alias("1 Tax Rate"),
    )
    cleaned = oc.clean_names(li)
    return cleaned.groupBy("l_returnflag").agg(
        F.round(F.sum("total_quantity"), 2).alias("total_quantity"),
        F.round(F.sum("x1_tax_rate"), 2).alias("x1_tax_rate"),
    )


@query(
    "r7_explode_split",
    """
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(string_split(o_orderpriority, '-')) AS token FROM orders
    ) GROUP BY token
    """,
)
def r7_explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 — unnest/explode of a split array (successor-split fan-out)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(F.explode(F.split("o_orderpriority", "-")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "r8_array_contains",
    """
    SELECT CAST(CASE WHEN list_contains([o_orderstatus, o_orderpriority], '1-URGENT')
                THEN 1 ELSE 0 END AS INTEGER) AS is_urgent,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def r8_array_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 — row-wise multi-column membership via array_contains (no
    rowwise() needed)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.array_contains(
                F.array("o_orderstatus", "o_orderpriority"), "1-URGENT"
            )
            .cast("int")
            .alias("is_urgent")
        )
        .groupBy("is_urgent")
        .agg(F.count("*").alias("n"))
    )


# ===========================================================================
# Scalar functions (F1, F7, F9, F11, F12, F13)
# ===========================================================================

@query(
    "f1_regex_extract",
    """
    SELECT regexp_extract(o_orderpriority, '^(\\d+)', 1) AS prio_digit, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def f1_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — regex capture extraction (filename year/quarter shape)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(F.regexp_extract("o_orderpriority", r"^(\d+)", 1).alias("prio_digit"))
        .groupBy("prio_digit")
        .agg(F.count("*").alias("n"))
    )


@query(
    "f7_month_year_roundtrip",
    """
    SELECT CAST(strptime(strftime(o_orderdate, '%B %Y'), '%B %Y') AS DATE) AS month_start,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def f7_month_year_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — lubridate my() parsing: format to "January 1995" then parse
    back to a first-of-month date with the engine's parse_month_year."""
    o = _t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "MMMM yyyy").alias("label")
    )
    return (
        o.select(nf.parse_month_year("label").alias("month_start"))
        .groupBy("month_start")
        .agg(F.count("*").alias("n"))
    )


@query(
    "f9_fiscal_calendar",
    """
    SELECT CAST(CASE WHEN month(o_orderdate) <= 3 THEN year(o_orderdate) - 1
                     ELSE year(o_orderdate) END AS INTEGER) AS fy_start,
           (CASE WHEN month(o_orderdate) <= 3 THEN year(o_orderdate) - 1
                 ELSE year(o_orderdate) END)::VARCHAR || '-' ||
             right('0' || ((CASE WHEN month(o_orderdate) <= 3 THEN year(o_orderdate) - 1
                 ELSE year(o_orderdate) END + 1) % 100)::VARCHAR, 2) AS fy_label,
           CASE WHEN month(o_orderdate) BETWEEN 4 AND 6 THEN 'Q1'
                WHEN month(o_orderdate) BETWEEN 7 AND 9 THEN 'Q2'
                WHEN month(o_orderdate) BETWEEN 10 AND 12 THEN 'Q3'
                ELSE 'Q4' END AS fq,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders GROUP BY 1, 2, 3
    """,
)
def f9_fiscal_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — NHS fiscal calendar: April-March year, Q1=Apr-Jun; Jan-Mar
    roll back to the prior fiscal year."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            nf.fiscal_year_start("o_orderdate").alias("fy_start"),
            nf.fiscal_year_label("o_orderdate").alias("fy_label"),
            nf.fiscal_quarter_from_month(F.month("o_orderdate")).alias("fq"),
            "o_totalprice",
        )
        .groupBy("fy_start", "fy_label", "fq")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total_value"))
    )


@query(
    "f11_sentinel_clean",
    """
    SELECT COALESCE(NULLIF(NULLIF(NULLIF(raw, '-'), 'NULL'), '.'), '<null>') AS cleaned,
           COUNT(*) AS n
    FROM (
      SELECT CASE WHEN o_orderstatus = 'O' THEN '-'
                  WHEN o_orderstatus = 'F' THEN 'NULL'
                  ELSE o_orderstatus END AS raw
      FROM orders
    ) GROUP BY 1
    """,
)
def f11_sentinel_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — sentinel-token -> NULL conversion ('-', 'NULL', '.' ...)."""
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "O", "-")
        .when(F.col("o_orderstatus") == "F", "NULL")
        .otherwise(F.col("o_orderstatus"))
        .alias("raw")
    )
    return (
        o.select(
            F.coalesce(nf.clean_sentinels("raw"), F.lit("<null>")).alias("cleaned")
        )
        .groupBy("cleaned")
        .agg(F.count("*").alias("n"))
    )


@query(
    "f12_numeric_coercion",
    """
    SELECT ROUND(CAST(SUM(TRY_CAST(num_str AS DOUBLE)) AS DOUBLE), 2) AS parsed_sum,
           COUNT(*) AS n_rows,
           COUNT(TRY_CAST(num_str AS DOUBLE)) AS n_parsed
    FROM (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'garbage'
                  WHEN o_orderkey % 3 = 1 THEN '-'
                  ELSE CAST(o_totalprice AS VARCHAR) END AS num_str
      FROM orders
    )
    """,
)
def f12_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — as.numeric coercion: bad strings and sentinels -> NULL,
    valid numerics parse (Spark non-ANSI cast == DuckDB TRY_CAST)."""
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 3 == 0, "garbage")
        .when(F.col("o_orderkey") % 3 == 1, "-")
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("num_str")
    )
    parsed = o.select(nf.to_numeric("num_str").alias("v"))
    return parsed.agg(
        F.round(F.sum("v"), 2).alias("parsed_sum"),
        F.count("*").alias("n_rows"),
        F.count("v").alias("n_parsed"),
    )


@query(
    "f13_safe_division",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) / SUM(l_quantity), 6) AS price_per_unit,
           CASE WHEN SUM(CASE WHEN l_quantity < 0 THEN l_quantity ELSE 0 END) = 0
                THEN NULL
                ELSE ROUND(SUM(l_extendedprice) / SUM(CASE WHEN l_quantity < 0 THEN l_quantity ELSE 0 END), 6)
           END AS div_by_zero_is_null
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f13_safe_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — ratio recomputation with NULL (not Inf) on zero
    denominator (percent-occupied semantics)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__num"),
        F.sum("l_quantity").alias("__den"),
        F.sum(F.col("l_extendedprice")).alias("__num2"),
        F.sum(F.when(F.col("l_quantity") < 0, F.col("l_quantity")).otherwise(0)).alias("__zero"),
    )
    return agg.select(
        "l_returnflag",
        F.round(nf.safe_div("__num", "__den"), 6).alias("price_per_unit"),
        F.round(nf.safe_div("__num2", "__zero"), 6).alias("div_by_zero_is_null"),
    )
