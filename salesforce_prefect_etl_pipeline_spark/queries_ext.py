"""Extension queries: joins, windows, set ops, richer aggregates, JSON,
time bucketing (SURVEY.md §7.2 step 6a-c + §2.8's "not in the reference"
surface). LLM-data ops (dedup/similarity/text) register from
``queries_llm``; streaming from ``streaming``.

Design rules applied throughout (scale notes inline):
- Declarative DataFrame plans only — Catalyst handles pushdown, join
  strategy (broadcast for the small dims), and AQE handles skew/coalesce.
- Deterministic numerics: every float SUM accumulates in DECIMAL(18,4)
  (``functions.exact_sum``); AVG = exact-sum / count. Bit-identical at any
  parallelism, which is what makes the DuckDB value-hash oracle (and
  reruns on a 1000-executor cluster) reproducible.
- Temporal outputs are stringified (the reference stringifies temporals at
  its JSON edge too, tasks/load.py:64-71) so value hashing is
  precision-independent.
- Every top-k / window ordering carries a unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from salesforce_prefect_etl_pipeline_spark.functions import exact_sum, exact_sum_sql
from salesforce_prefect_etl_pipeline_spark.operators import graph
from salesforce_prefect_etl_pipeline_spark.plans import load_table
from salesforce_prefect_etl_pipeline_spark.queries_registry import register_query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# TPC-H-style aggregation over the big fact (map-side partial agg; the
# only shuffle is 4 groups wide — trivially AQE-coalesced).
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.expr(REVENUE)
    charge = F.expr(f"{REVENUE} * (1 + l_tax)")
    qty, price, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(qty).alias("sum_qty"),
            exact_sum(price).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            (exact_sum(qty) / F.count(qty)).alias("avg_qty"),
            (exact_sum(price) / F.count(price)).alias("avg_price"),
            (exact_sum(disc) / F.count(disc)).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {exact_sum_sql('l_quantity')} AS sum_qty,
       {exact_sum_sql('l_extendedprice')} AS sum_base_price,
       {exact_sum_sql(REVENUE)} AS sum_disc_price,
       {exact_sum_sql(REVENUE + ' * (1 + l_tax)')} AS sum_charge,
       {exact_sum_sql('l_quantity')} / COUNT(l_quantity) AS avg_qty,
       {exact_sum_sql('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
       {exact_sum_sql('l_discount')} / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------------------------
# Star-schema join with explicit broadcast of the dim chain
# (customer->nation->region). lineitem-orders stays a shuffle join on
# orderkey (both huge at 100 TB); AQE picks SMJ/SHJ.
def join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dims = F.broadcast(
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name")
        .agg(
            exact_sum(F.expr(REVENUE)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name")
    )


JOIN_REVENUE_BY_REGION_SQL = f"""
SELECT r_name, {exact_sum_sql(REVENUE)} AS revenue, COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# TPC-H Q3-shaped: filter both sides, join, aggregate, deterministic top-10.
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1998-03-15"
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey")), orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {exact_sum_sql(REVENUE)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# Existence joins: broadcast the semi/anti side's keys when small; at
# 100 TB Spark rewrites these as shuffled left-semi/anti hash joins.
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# ----------------------------------------------------------------------
# Window functions (SURVEY §2.5 — extension surface).
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


WINDOW_TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3 ORDER BY o_custkey, rn
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders ORDER BY o_custkey, o_orderkey
"""


def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev).alias("gap_days"),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_GAP_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            LAG(CAST(o_orderdate AS DATE)) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
FROM orders ORDER BY o_custkey, o_orderkey
"""


def window_rank_nations_by_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank over an aggregated frame (two-level plan)."""
    cust = _t(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        exact_sum("c_acctbal").alias("total_acctbal")
    )
    w = Window.orderBy(F.desc("total_acctbal"), F.asc("c_nationkey"))
    return per_nation.select(
        "c_nationkey",
        "total_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).orderBy("rnk", "c_nationkey")


WINDOW_RANK_SQL = f"""
WITH per_nation AS (
  SELECT c_nationkey, {exact_sum_sql('c_acctbal')} AS total_acctbal
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, total_acctbal,
       RANK()       OVER (ORDER BY total_acctbal DESC, c_nationkey ASC) AS rnk,
       DENSE_RANK() OVER (ORDER BY total_acctbal DESC, c_nationkey ASC) AS drnk
FROM per_nation ORDER BY rnk, c_nationkey
"""


def window_ntile_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) by totalprice within each status + quartile aggregates."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderstatus", "quartile")
        .agg(
            F.count(F.lit(1)).alias("records"),
            exact_sum("o_totalprice").alias("sum_total"),
        )
        .orderBy("o_orderstatus", "quartile")
    )


WINDOW_NTILE_SQL = f"""
SELECT o_orderstatus, quartile, COUNT(*) AS records,
       {exact_sum_sql('o_totalprice')} AS sum_total
FROM (
  SELECT o_orderstatus, o_totalprice,
         NTILE(4) OVER (PARTITION BY o_orderstatus
                        ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
  FROM orders
) GROUP BY o_orderstatus, quartile ORDER BY o_orderstatus, quartile
"""


def window_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of each supplier's account balance
    within its nation — the relative-position pair the rank family was
    missing (rank says WHERE, percent_rank/cume_dist say WHAT FRACTION
    is below / at-or-below). Both are exact rational-over-count doubles
    from the same sort, identical IEEE division in both engines; unique
    (balance, suppkey) ordering makes them deterministic."""
    supp = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    ).orderBy("s_nationkey", "s_suppkey")


WINDOW_PCTRANK_SQL = """
SELECT s_nationkey, s_suppkey, s_acctbal,
       PERCENT_RANK() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal ASC, s_suppkey ASC) AS pct_rank,
       CUME_DIST() OVER (PARTITION BY s_nationkey
                         ORDER BY s_acctbal ASC, s_suppkey ASC) AS cume
FROM supplier ORDER BY s_nationkey, s_suppkey
"""


def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order per customer over a full-partition frame."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            F.last("o_orderkey").over(w).alias("last_orderkey"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


WINDOW_FIRST_LAST_SQL = """
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
       LAST_VALUE(o_orderkey)  OVER w AS last_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey
"""


def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw GK-sketch percentiles per status (p50/p95, accuracy 10000) —
    the 100 TB path for medians/quantiles. Sketch values are
    engine-specific, so this raw form carries a pytest accuracy
    contract; the REGISTERED query wraps it in the hashable rank-bound
    check below."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        )
        .orderBy("o_orderstatus")
    )


def agg_approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles oracled by their DOCUMENTED accuracy bound:
    percentile_approx(accuracy=A) guarantees the returned value's true
    rank lies within n/A of the target rank (Greenwald-Khanna). The
    query re-ranks each sketch value against the data (count of rows
    <=/< it via one broadcast join back) and emits booleans asserting
    the bound, plus the deterministic group count. The oracle replays
    the CONTRACT — TRUE for every group — so a sketch violating its
    own bound hash-mismatches instead of hiding behind "no oracle".
    (The raw sketch values keep their tighter 2%-of-exact pytest in
    test_joins_scale.py.)"""
    orders = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    sk = approx_percentile_sketch(spark, sf_dir)
    j = orders.join(F.broadcast(sk), "o_orderstatus")
    chk = j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.col("o_totalprice") <= F.col("p50")).cast("long")).alias("le50"),
        F.sum((F.col("o_totalprice") < F.col("p50")).cast("long")).alias("lt50"),
        F.sum((F.col("o_totalprice") <= F.col("p95")).cast("long")).alias("le95"),
        F.sum((F.col("o_totalprice") < F.col("p95")).cast("long")).alias("lt95"),
    )
    tol = F.col("n_orders") / F.lit(10000.0) + F.lit(1.0)

    def rank_ok(le: str, lt: str, q: float):
        target = F.lit(q) * F.col("n_orders")
        return (F.col(le) >= target - tol) & (F.col(lt) <= target + tol)

    return chk.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        rank_ok("le50", "lt50", 0.5).alias("p50_rank_ok"),
        rank_ok("le95", "lt95", 0.95).alias("p95_rank_ok"),
    ).orderBy("o_orderstatus")


APPROX_PERCENTILE_CONTRACT_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
FROM orders GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------------------
# Set operations (SURVEY §2.7 "not in the reference").
def set_union_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


SET_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def set_intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def set_except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")  # EXCEPT (distinct) semantics


SET_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


# ----------------------------------------------------------------------
# Grouping sets / richer aggregates (SURVEY §2.4 "not in the reference").
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("records"), exact_sum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS records,
       {exact_sum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("records"), exact_sum("o_totalprice").alias("sum_total"))
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS records,
       {exact_sum_sql('o_totalprice')} AS sum_total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API pivot (groupBy().pivot().agg()) — one shuffle; the
    pivot values are pinned so the plan needs no extra distinct pass."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderpriority")
    )


PIVOT_DF_SQL = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — finer than rollup/cube
    (exactly the two single-key groupings, no grand total)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS records, {exact_sum_sql('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS records, {exact_sum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("records"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_AGG_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS records
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9's 100 TB path, raw form: HyperLogLog++ approximate distinct
    counts (constant memory per group vs exact distinct's shuffle of
    every distinct value). Sketch values are engine-specific, so this
    raw form carries the <5%-error pytest; the REGISTERED query wraps
    it in the hashable error-contract check below."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_suppliers"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )


def agg_approx_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct sketch oracled by its error model: rsd=0.02 is
    the sketch's relative STANDARD DEVIATION, so a 10-sigma band
    (|approx - exact| <= 20% of exact) holds with near-certainty for a
    correct implementation while any real breakage (wrong register
    merge, wrong column) lands far outside it. The query computes both
    the sketch and the exact distinct counts and emits contract
    booleans plus the deterministic exact values; the oracle replays
    the contract (exact counts + TRUE). Same posture as
    agg_approx_percentile_price — a sketch violating its own
    documented accuracy hash-mismatches instead of hiding behind
    "no oracle". (The tighter 5% accuracy expectation stays in
    pytest.)"""
    sk = approx_distinct_sketch(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )

    def ok(approx: str, ex: str):
        return (
            F.abs(F.col(approx) - F.col(ex))
            <= F.lit(0.2) * F.col(ex).cast("double")
        )

    return (
        sk.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("exact_suppliers").cast("long").alias("exact_suppliers"),
            F.col("exact_parts").cast("long").alias("exact_parts"),
            ok("approx_suppliers", "exact_suppliers").alias("suppliers_within_20pct"),
            ok("approx_parts", "exact_parts").alias("parts_within_20pct"),
        )
        .orderBy("l_returnflag")
    )


APPROX_DISTINCT_CONTRACT_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS suppliers_within_20pct, TRUE AS parts_within_20pct
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def agg_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of extended price vs quantity per return
    flag, with REPRODUCIBLE numbers: the built-in ``corr`` accumulates
    doubles in partition order (different cluster layout -> different
    last bits), so instead both variables are quantized per row
    (floor(x*1e4 + 0.5), the exact_sum trick) and the five sufficient
    statistics (n, Sx, Sy, Sxy, Sxx, Syy) accumulate as EXACT decimal
    integers. The final formula converts each exact integer to double
    once and evaluates identically in both engines — bit-stable at any
    parallelism. Semantics: correlation of the 1e-4-quantized values
    (indistinguishable from raw corr at these magnitudes; quantization
    scale cancels in the ratio).
    """
    li = _t(spark, sf_dir, "lineitem")
    xq = F.floor(F.col("l_extendedprice") * 10000.0 + 0.5).cast("decimal(38,0)")
    yq = F.floor(F.col("l_quantity") * 10000.0 + 0.5).cast("decimal(38,0)")
    agg = li.select("l_returnflag", xq.alias("x"), yq.alias("y")).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_rows").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return agg.select("l_returnflag", "n_rows", corr.alias("corr_price_qty")).orderBy(
        "l_returnflag"
    )


AGG_CORR_SQL = """
WITH q AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS HUGEINT) AS x,
         CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS HUGEINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag, COUNT(*) AS n_rows,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM q GROUP BY 1
)
SELECT l_returnflag, n_rows,
       (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS corr_price_qty
FROM s ORDER BY l_returnflag
"""


def agg_median_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete lower median (value at row floor((n+1)/2) of the sorted
    partition) — defined via window row_number so Spark and the oracle
    share one arithmetic-free definition (no interpolation drift)."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("c_nationkey")).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("c_nationkey", F.col("c_acctbal").alias("median_acctbal"), "n")
        .orderBy("c_nationkey")
    )


MEDIAN_SQL = """
SELECT c_nationkey, c_acctbal AS median_acctbal, n FROM (
  SELECT c_nationkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*)    OVER (PARTITION BY c_nationkey) AS n
  FROM customer
) WHERE rn = (n + 1) // 2 ORDER BY c_nationkey
"""


def agg_stddev_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev from exact sums (sum, sum-of-squares accumulate in
    decimal; final arithmetic is one fixed IEEE expression on both
    engines — order-independent, unlike built-in STDDEV merges)."""
    cust = _t(spark, sf_dir, "customer")
    agg = cust.groupBy("c_mktsegment").agg(
        F.count("c_acctbal").alias("n"),
        exact_sum("c_acctbal").alias("s1"),
        exact_sum(F.col("c_acctbal") * F.col("c_acctbal")).alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return agg.select(
        "c_mktsegment",
        "n",
        F.sqrt(var).alias("stddev_acctbal"),
    ).orderBy("c_mktsegment")


STDDEV_SQL = f"""
WITH s AS (
  SELECT c_mktsegment, COUNT(c_acctbal) AS n,
         {exact_sum_sql('c_acctbal')} AS s1,
         {exact_sum_sql('c_acctbal * c_acctbal')} AS s2
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       SQRT((s2 - s1 * s1 / n) / (n - 1)) AS stddev_acctbal
FROM s ORDER BY c_mktsegment
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global sum — the pushdown showcase
    (all four predicates reach the parquet scan, PLANS.md)."""
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.coalesce(exact_sum(F.expr("l_extendedprice * l_discount")), F.lit(0.0)).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_SQL = f"""
SELECT COALESCE({exact_sum_sql('l_extendedprice * l_discount')}, 0.0) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, {exact_sum_sql(REVENUE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def asof_clicks_to_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click matched to the user's most recent purchase
    at-or-before it (operators/asof.py; DuckDB native ASOF JOIN oracle)."""
    from salesforce_prefect_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    joined = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="p_ts",
        right_value_cols=["p_ts", "p_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.unix_micros("p_ts").alias("last_purchase_ts_us"),
        F.col("p_value").alias("last_purchase_value"),
    ).orderBy("event_id")


ASOF_SQL = """
SELECT l.event_id, l.user_id,
       epoch_us(CAST(l.ts AS TIMESTAMP)) AS click_ts_us,
       epoch_us(CAST(r.ts AS TIMESTAMP)) AS last_purchase_ts_us,
       r.value AS last_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def asof_forward_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click matched to the user's NEXT purchase at
    or after it — conversion-lag analysis (operators/asof.py
    direction='forward'; DuckDB ASOF with the inequality flipped)."""
    from salesforce_prefect_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    joined = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="p_ts",
        right_value_cols=["p_ts", "p_value"], direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.unix_micros("p_ts").alias("next_purchase_ts_us"),
        F.col("p_value").alias("next_purchase_value"),
    ).orderBy("event_id")


ASOF_FORWARD_SQL = """
SELECT l.event_id, l.user_id,
       epoch_us(CAST(l.ts AS TIMESTAMP)) AS click_ts_us,
       epoch_us(CAST(r.ts AS TIMESTAMP)) AS next_purchase_ts_us,
       r.value AS next_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts <= r.ts
ORDER BY l.event_id
"""


def asof_nearest_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each click matched to the user's temporally
    CLOSEST purchase (ties to the earlier one) — sessionless
    click/purchase attribution when direction is unknown."""
    from salesforce_prefect_etl_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    joined = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="p_ts",
        right_value_cols=["p_ts", "p_value"], direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.unix_micros("p_ts").alias("nearest_purchase_ts_us"),
        F.col("p_value").alias("nearest_purchase_value"),
    ).orderBy("event_id")


# Two chained DuckDB ASOF joins (backward + forward) resolved by CASE
# on the microsecond distances — ties (equal distance) to backward,
# matching the engine's documented semantics.
ASOF_NEAREST_SQL = """
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT event_id, user_id, click_ts_us,
       CASE WHEN b_ts IS NULL THEN f_ts
            WHEN f_ts IS NULL THEN b_ts
            WHEN (f_ts - click_ts_us) < (click_ts_us - b_ts) THEN f_ts
            ELSE b_ts END AS nearest_purchase_ts_us,
       CASE WHEN b_ts IS NULL THEN f_v
            WHEN f_ts IS NULL THEN b_v
            WHEN (f_ts - click_ts_us) < (click_ts_us - b_ts) THEN f_v
            ELSE b_v END AS nearest_purchase_value
FROM (
  SELECT l.event_id, l.user_id,
         epoch_us(CAST(l.ts AS TIMESTAMP)) AS click_ts_us,
         epoch_us(CAST(b.ts AS TIMESTAMP)) AS b_ts, b.value AS b_v,
         epoch_us(CAST(f.ts AS TIMESTAMP)) AS f_ts, f.value AS f_v
  FROM c l
  ASOF LEFT JOIN p b ON l.user_id = b.user_id AND l.ts >= b.ts
  ASOF LEFT JOIN p f ON l.user_id = f.user_id AND l.ts <= f.ts
)
ORDER BY event_id
"""


def range_join_ship_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join (operators/rangejoin.py): per order, count
    lineitems shipped within [orderdate, orderdate + 30 days]. The bin
    trick turns a range predicate into an equi-join."""
    from salesforce_prefect_etl_pipeline_spark.operators.rangejoin import interval_join

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")).alias("lo"),
    ).withColumn("hi", F.col("lo") + 30)
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1990-01-01").cast("date")).alias("ship_day"),
    )
    joined = interval_join(
        orders, li, key="o_orderkey", lo="lo", hi="hi", point="ship_day", bin_width=32
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_30d"))
        .orderBy("o_orderkey")
    )


RANGE_JOIN_SQL = """
SELECT o_orderkey, COUNT(*) AS n_shipped_30d
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) BETWEEN CAST(o_orderdate AS DATE)
      AND CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
GROUP BY o_orderkey ORDER BY o_orderkey
"""


def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: explode documents into sentences via the
    registered table function, then aggregate per language."""
    from salesforce_prefect_etl_pipeline_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.lang, COUNT(*) AS n_sentences,
               CAST(SUM(s.n_tokens) AS BIGINT) AS total_tokens
        FROM documents d, LATERAL split_sentences(d.doc_id, d.text) s
        GROUP BY d.lang ORDER BY d.lang
        """
    )


# The synthetic docs have no sentence punctuation, so each document is
# one "sentence" — the UDTF contract is still fully exercised (lateral
# correlation, per-row expansion, token counts match the SQL oracle).
UDTF_SENTENCE_SQL = """
SELECT lang, COUNT(*) AS n_sentences,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens
FROM documents WHERE trim(text) <> ''
GROUP BY lang ORDER BY lang
"""


# ----------------------------------------------------------------------
# Date/time + JSON scalar surface (SURVEY §2.8 "not in the reference";
# events.props is a JSON string column).
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("records"), exact_sum("o_totalprice").alias("sum_total"))
        .orderBy("month")
    )


ORDERS_BY_MONTH_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS records,
       {exact_sum_sql('o_totalprice')} AS sum_total
FROM orders GROUP BY 1 ORDER BY month
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS records,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured props: parse_json
    ONCE into a binary-encoded VARIANT column, then typed
    ``variant_get`` extractions — repeated field access decodes the
    compact binary form instead of re-parsing the JSON string per
    expression (the reason a 100 TB event pipeline stores props as
    VARIANT, not VARCHAR). Exercised semantics: a present path typed
    as long, a MISSING path through ``try_variant_get`` (NULL, not an
    error — the count proves every row misses it), and
    ``schema_of_variant`` type introspection carried through the
    aggregation. The introspection is hashed REPRESENTATION-
    INDEPENDENTLY: Spark renders variant schemas as ``OBJECT<k:
    BIGINT>`` while DuckDB's ``json_structure`` renders
    ``{"k":"UBIGINT"}`` (and splits integer types by sign), so
    comparing distinct-schema COUNTS only worked by luck of the
    fixture's single shape — instead each engine asserts its OWN
    introspection mentions the ``k`` field, a predicate both
    renderings satisfy for any row where the path exists. Doubles are
    summed with the engine's order-independent exact_sum so the
    result value-hashes."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    rows = ev.select(
        F.floor(k / 10).cast("long").alias("k_decade"),
        k.alias("k"),
        F.try_variant_get(v, "$.absent", "long").alias("absent"),
        F.schema_of_variant(v).alias("vschema"),
        "value",
    )
    return (
        rows.groupBy("k_decade")
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.sum("k").alias("sum_k"),
            F.count("absent").alias("n_absent_nonnull"),
            # the rendered FIELD token ("k:" at a word boundary), not a
            # bare contains("k") — the latter matches any schema string
            # with the letter k (a future "kind" field would count)
            # while the DuckDB side's LIKE '%"k"%' requires the quoted
            # field; both engines now test presence of field k itself
            F.count(F.when(F.col("vschema").rlike(r"\bk:"), 1)).alias(
                "n_schema_has_k"
            ),
            exact_sum("value").alias("sum_value"),
        )
        .orderBy("k_decade")
    )


EVENTS_VARIANT_SQL = f"""
SELECT CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0)
            AS BIGINT) AS k_decade,
       COUNT(*) AS records,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(COUNT(TRY_CAST(json_extract_string(props, '$.absent') AS BIGINT))
            AS BIGINT) AS n_absent_nonnull,
       CAST(COUNT(CASE WHEN json_structure(props) LIKE '%"k"%' THEN 1 END)
            AS BIGINT) AS n_schema_has_k,
       {exact_sum_sql('value')} AS sum_value
FROM events GROUP BY 1 ORDER BY 1
"""


def join_salted_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact join (operators/joins.py): lineitem probe rows
    scatter over 8 salts, the orders build side replicates 8x, and the
    join key becomes (orderkey, salt) — the treatment for a single
    pathological key AQE's skew splitting can't break up. The oracle is
    the PLAIN join: salting must be semantically invisible."""
    from salesforce_prefect_etl_pipeline_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr(REVENUE).alias("rev")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, key="l_orderkey", salt=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            exact_sum(F.col("rev")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("o_orderpriority")
    )


SALTED_JOIN_SQL = f"""
SELECT o_orderpriority, {exact_sum_sql(REVENUE)} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def events_props_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of the JSON props object into (key, value) rows —
    the generic schema-on-read path for semi-structured event payloads
    (vs events_json_extract's fixed-path $.k). from_json to a map stays
    JVM-side; explode is a Generate (no shuffle); only the final
    aggregation is wide."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select("event_type", F.explode(m).alias("prop_key", "prop_val"))
        .groupBy("event_type", "prop_key")
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.sum(F.col("prop_val").try_cast("long")).alias("sum_val"),
        )
        .orderBy("event_type", "prop_key")
    )


EVENTS_PROPS_EXPLODE_SQL = """
SELECT event_type, u.k AS prop_key, COUNT(*) AS records,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.' || u.k) AS BIGINT)) AS BIGINT) AS sum_val
FROM events, unnest(json_keys(props)) u(k)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def lineitem_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot of the four lineitem measures, then per-metric
    stats — the melt operator (DataFrame.unpivot / SQL stack()). The
    Expand underneath emits one row per measure WITHOUT re-scanning
    (4x rows out of one scan, still one shuffle for the agg)."""
    li = _t(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = li.unpivot(
        ids=["l_returnflag"],
        values=measures,
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(
            F.count(F.lit(1)).alias("records"),
            exact_sum(F.col("val")).alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("l_returnflag", "metric")
    )


LINEITEM_UNPIVOT_SQL = f"""
WITH u AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
SELECT l_returnflag, metric, COUNT(*) AS records,
       {exact_sum_sql('val')} AS sum_val,
       MIN(val) AS min_val, MAX(val) AS max_val
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch aggregation via F.window — the exact plan the
    streaming path reuses (streaming/windows.py) with a watermark."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("records"), exact_sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "records",
            "sum_value",
        )
        .orderBy("bucket", "event_type")
    )


EVENTS_HOURLY_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type, COUNT(*) AS records,
       {exact_sum_sql('value')} AS sum_value
FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the events stream: view -> click (after the
    user's first view) -> purchase (after that first qualifying click).
    Output is one row of stage-reach counts — the standard conversion
    report.

    Each stage is a conditional min-timestamp aggregation keyed by
    user_id joined to the previous stage's frontier; all three shuffles
    hash on user_id, so Catalyst reuses one partitioning end-to-end and
    the frontier frames shrink monotonically (stage N is a subset of the
    users of stage N-1)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view_users"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_users")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_users")))
    )


EVENTS_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), v AS (
  SELECT user_id, MIN(ts) AS vt FROM e WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(ts) AS ct FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > vt GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(ts) AS pt FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > ct GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
       (SELECT COUNT(*) FROM c) AS n_click_users,
       (SELECT COUNT(*) FROM p) AS n_purchase_users
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week
    (ISO Monday start — identical truncation in both engines), counted
    as active per subsequent week offset. The cohort-triangle report
    behind every retention dashboard.

    Shape: one user-keyed min-aggregation for the cohort, one join back
    (user-keyed again — partitioning reused), one distinct-count per
    (cohort, offset); week offsets as exact integer day-diffs // 7, so
    no timezone/week-numbering dialect drift."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("w0")
    )
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("w")
    ).distinct()
    return (
        act.join(first, "user_id")
        .select(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("w", "w0") / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_RETENTION_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
), first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS w0
  FROM e GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM e
)
SELECT strftime(w0, '%Y-%m-%d') AS cohort_week,
       date_diff('day', w0, w) // 7 AS week_offset,
       COUNT(*) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_week, week_offset
"""


def events_session_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-corpus construction: one training "document" per user
    session — the session's event types in time order, joined into a
    sequence string. This is how raw logs become sequence-model training
    data (next-action prediction, session embeddings).

    Shape: the same session_window state machine the streaming path
    uses, but aggregating an ordered sequence instead of counts —
    collect structs, array_sort (total order: ts, then event_id for
    ties), project types, join. One shuffle on user_id; sequences stay
    bounded because the session gap bounds session length."""
    ev = _t(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
    )
    return agg.select(
        "user_id",
        F.unix_micros("w.start").alias("session_start_us"),
        F.size("evs").alias("n_events"),
        F.concat_ws(" ", F.transform("evs", lambda e: e.event_type)).alias("seq"),
    ).orderBy("user_id", "session_start_us")


GAP_US_SEQ = 10 * 60 * 1_000_000
EVENTS_SESSION_SEQ_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), lagged AS (
  SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
), marked AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR epoch_us(ts) - epoch_us(prev) >= {GAP_US_SEQ}
                 THEN 1 ELSE 0 END AS new_s
  FROM lagged
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       COUNT(*) AS n_events,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""


def events_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session Markov-chain transition counts: how often each event type
    is followed by each other type WITHIN a session (same 10-minute gap
    rule as the sequence builder). The transition matrix is the model
    behind next-action prediction baselines and behavioral anomaly
    scoring — and the natural aggregate on top of
    ``events_session_sequences``' corpus.

    Shape: one lag window per user (hash shuffle on user_id, the same
    partitioning every event-analytics query here uses), then a tiny
    groupBy on (src, dst). A consecutive pair is a transition only when
    the inter-event gap keeps it inside one session; session boundaries
    (gap >= 10 min) contribute no pair, exactly like the sequence
    builder starting a new document."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("src"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    pairs = lagged.filter(
        F.col("prev_ts").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("prev_ts") < F.lit(GAP_US_SEQ))
    )
    return (
        pairs.groupBy(F.col("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("src", "dst")
    )


EVENTS_TRANSITION_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), lagged AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         ts
  FROM e
)
SELECT src, event_type AS dst, COUNT(*) AS n_transitions
FROM lagged
WHERE prev IS NOT NULL AND epoch_us(ts) - epoch_us(prev) < {GAP_US_SEQ}
GROUP BY src, dst ORDER BY src, dst
"""


def agg_mode_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group (most frequent order priority per
    customer market segment, plus its count and share) — the one
    classical descriptive aggregate the median/stddev family here didn't
    cover. Mode needs a deterministic tiebreak to be well-defined:
    highest count, then lowest priority value.

    Shape: count per (segment, priority) — one shuffle — then a
    row_number over the tiny per-segment count frame; the join to
    customer broadcasts."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    counts = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seg_total = F.sum("n").over(Window.partitionBy("c_mktsegment"))
    rn = F.row_number().over(
        Window.partitionBy("c_mktsegment").orderBy(
            F.desc("n"), F.asc("o_orderpriority")
        )
    )
    return (
        counts.withColumn("__tot", seg_total)
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
            (F.col("n").cast("double") / F.col("__tot").cast("double")).alias(
                "mode_share"
            ),
        )
        .orderBy("c_mktsegment")
    )


AGG_MODE_SQL = """
WITH counts AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY n DESC, o_orderpriority ASC) AS rn,
         SUM(n) OVER (PARTITION BY c_mktsegment) AS tot
  FROM counts
)
SELECT c_mktsegment, o_orderpriority AS mode_priority,
       CAST(n AS BIGINT) AS mode_count,
       CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS mode_share
FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
"""


def graph_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph: one edge per
    (supplier nation -> customer nation) with weight = lineitem count —
    which nations sit at the center of the trade flow. Demonstrates the
    FIXED-iteration exact-arithmetic pattern (operators/graph.py): all
    rank math is scaled-bigint with floor division, so five distributed
    iterations value-hash against an unrolled-CTE SQL replay.

    Plan: the edge list is a fact-scan + three joins (dims broadcast,
    orders⋈lineitem on orderkey) aggregated once; each iteration is a
    join + sum on the (tiny here, huge in general) edge frame."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    pr = graph.pagerank_exact(edges, n_nodes=nat.count(), iters=5)
    return (
        pr.join(F.broadcast(nat), pr["node"] == nat["n_nationkey"])
        .select("node", "n_name", "rank_scaled")
        .orderBy("node")
    )


_PAGERANK_EDGES_SQL = """
SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
       CAST(COUNT(*) AS BIGINT) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""

GRAPH_PAGERANK_SQL = f"""
SELECT p.node, n.n_name, p.rank_scaled
FROM ({graph.pagerank_sql(_PAGERANK_EDGES_SQL, "SELECT COUNT(*) FROM nation", iters=5)}) p
JOIN nation n ON p.node = n.n_nationkey
ORDER BY p.node
"""

#: Edge-weight floor for the triangle query: the full trade graph is
#: near-complete (25 nations all trade), so triangles are thresholded
#: to MAJOR routes — edges above ~1.3x the mean route weight — giving a
#: sparse graph whose triangle structure is non-trivial. The threshold
#: is a cross-multiplied integer predicate (no division), bit-exact.
_TRIANGLE_EDGES_SQL = f"""
WITH w AS ({_PAGERANK_EDGES_SQL}),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS s, COUNT(*) AS n FROM w)
SELECT src, dst FROM w, tot WHERE w.w * tot.n * 10 > tot.s * 13
"""


def graph_nation_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle counts over the MAJOR-route trade graph
    (operators/graph.py::triangle_counts): which nations sit in tightly
    interlocked trade clusters. Edge thresholding is an integer
    cross-multiplication against 1.3x the mean route weight."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    weights = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    tot = weights.agg(
        F.sum("w").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    major = (
        weights.crossJoin(F.broadcast(tot))
        .filter(F.col("w") * F.col("__n") * 10 > F.col("__s") * 13)
        .select("src", "dst")
    )
    return graph.triangle_counts(major)


GRAPH_TRIANGLES_SQL = graph.triangle_counts_sql(_TRIANGLE_EDGES_SQL)


def agg_mad_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event_type — the robust
    location/scale pair behind outlier fences (flag when
    |x - median| > k * MAD), immune to the heavy tails that wreck
    mean/stddev fences on real event streams. Both medians are the
    discrete lower median with a deterministic tiebreak (value then
    event_id — the agg_median pattern), so the output value-hashes:
    no interpolation, no quantile-sketch drift. Two window passes,
    both shuffling on event_type only."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    g = Window.partitionBy("event_type")
    w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
    med = (
        ev.select(
            "event_type",
            "value",
            F.row_number().over(w1).alias("rn"),
            F.count(F.lit(1)).over(g).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("value").alias("median_value"))
    )
    dev = ev.join(med, "event_type").select(
        "event_type",
        "event_id",
        "median_value",
        F.abs(F.col("value") - F.col("median_value")).alias("dev"),
    )
    w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    return (
        dev.select(
            "event_type",
            "median_value",
            "dev",
            F.row_number().over(w2).alias("rn"),
            F.count(F.lit(1)).over(g).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", "median_value", F.col("dev").alias("mad"), "n")
        .orderBy("event_type")
    )


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-fence outlier report: per event_type, how many events sit
    outside median ± 3×MAD — the DECIDE step on top of the robust
    stats (agg_mad_value_by_type): the fence that survives the heavy
    tails that break mean/stddev fences. Comparison is exact (|x - med|
    vs 3×mad on the raw doubles, identical expressions both engines);
    the per-type stats frame is broadcast against the event scan."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = agg_mad_value_by_type(spark, sf_dir).select(
        "event_type", "median_value", "mad"
    )
    flagged = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        (
            F.abs(F.col("value") - F.col("median_value"))
            > F.lit(3.0) * F.col("mad")
        ).cast("int").alias("is_outlier"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_outlier").alias("n_outliers"),
        )
        .withColumn(
            "outlier_share",
            F.col("n_outliers").cast("double") / F.col("n_events"),
        )
        .orderBy("event_type")
    )


def _events_mad_outliers_sql() -> str:
    return f"""
WITH stats AS ({AGG_MAD_SQL.replace(";", "")}),
flagged AS (
  SELECT e.event_type,
         CASE WHEN ABS(e.value - s.median_value) > 3.0 * s.mad
              THEN 1 ELSE 0 END AS is_outlier
  FROM events e JOIN stats s USING (event_type)
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(is_outlier) AS BIGINT) AS n_outliers,
       CAST(SUM(is_outlier) AS DOUBLE) / COUNT(*) AS outlier_share
FROM flagged GROUP BY event_type ORDER BY event_type
"""


def agg_chi2_type_by_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence statistic between event_type and
    day-part (AM/PM) — the categorical-drift / A-B sanity test a
    pipeline runs before trusting a segmentation. Emits one row per
    event_type with its contribution plus the grand total row ('ALL'),
    so the report localizes WHICH category drives dependence.

    Determinism: cell terms (o - e)^2 / e are each quantized to bigint
    (floor(term * 1e6)) BEFORE summing — integer sums are
    order-independent, so the statistic is identical on any plan or
    parallelism, the same discipline as exact_sum. One count shuffle
    over (type, daypart); margins are 1-row/broadcast aggregates."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.hour("ts") >= 12).cast("int").alias("pm"),
    )
    observed = ev.groupBy("event_type", "pm").agg(F.count(F.lit(1)).alias("o"))
    # COMPLETE contingency grid: a (type, daypart) cell with zero
    # observations still contributes (0 - e)^2 / e = e — exactly the
    # all-AM dependence signal the test exists to detect; groupBy alone
    # would silently drop it and bias the statistic low.
    # enumerate types from the already-aggregated observed frame (a
    # handful of rows) — distinct over ev would re-scan the events table
    grid = (
        observed.select("event_type")
        .distinct()
        .crossJoin(spark.range(2).select(F.col("id").cast("int").alias("pm")))
    )
    cells = grid.join(observed, ["event_type", "pm"], "left").select(
        "event_type", "pm", F.coalesce("o", F.lit(0)).alias("o")
    )
    row_tot = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    col_tot = cells.groupBy("pm").agg(F.sum("o").alias("ct"))
    n_tot = cells.agg(F.sum("o").alias("n"))
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    term_q = F.floor(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e * 1e6
    ).cast("long")
    per_type = (
        cells.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "pm")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("event_type")
        .agg(F.sum(term_q).alias("chi2_q"))
    )
    total = per_type.agg(
        F.lit("ALL").alias("event_type"), F.sum("chi2_q").alias("chi2_q")
    )
    return per_type.unionByName(total).orderBy("event_type")


AGG_CHI2_SQL = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) >= 12
              THEN 1 ELSE 0 END AS pm
  FROM events
),
observed AS (SELECT event_type, pm, COUNT(*) AS o FROM ev GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, p.pm
  FROM (SELECT DISTINCT event_type FROM observed) t,
       (SELECT unnest([0, 1]) AS pm) p
),
cells AS (
  SELECT g.event_type, g.pm, COALESCE(o.o, 0) AS o
  FROM grid g LEFT JOIN observed o
    ON g.event_type = o.event_type AND g.pm = o.pm
),
rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
ct AS (SELECT pm, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT c.event_type,
         CAST(FLOOR(
           (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
           * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
           / (CAST(rt AS DOUBLE) * ct / n) * 1e6) AS BIGINT) AS tq
  FROM cells c JOIN rt USING (event_type) JOIN ct USING (pm), n
),
per_type AS (
  SELECT event_type, CAST(SUM(tq) AS BIGINT) AS chi2_q
  FROM terms GROUP BY 1
)
SELECT * FROM per_type
UNION ALL
SELECT 'ALL', CAST(SUM(chi2_q) AS BIGINT) FROM per_type
ORDER BY event_type
"""


def agg_binned_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of l_extendedprice per return flag via
    fixed-width binning — the bounded-state percentile that scales
    where a full sort (exact) blows memory and a quantile sketch
    (approx_percentile) can't be value-hashed. Binning to integer
    dollars caps aggregation state at the VALUE RANGE (~100k bins),
    independent of row count; the per-flag cumulative window runs over
    bins, not rows, so its partition is bounded by construction. The
    answer is exact in the binned domain (the bin containing the true
    percentile), deterministic, and integer-arithmetic end to end:
    threshold = ceil(pct * total / 100) in bigint, no interpolation."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.floor("l_extendedprice").cast("long").alias("bin")
    )
    counts = li.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Per-flag total as a whole-partition window over the SAME
    # bin-count frame (r16 optimization round, guide §2.4): the
    # previous shape re-aggregated `counts` into a separate totals
    # branch and broadcast-joined it back — one extra aggregation
    # branch, one exchange, one join on the plan's critical path. Both
    # windows share the l_returnflag partitioning, so Spark plans them
    # over ONE exchange; thr = ceil(tot*pct/100) in bigint is computed
    # per row after a 3-way pct explode over the bounded bin frame.
    # Bit-identical to the join form: same cum, same integer
    # thresholds, same filter+min.
    wtot = Window.partitionBy("l_returnflag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "l_returnflag",
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wtot).alias("tot"),
    )
    return (
        cum.select(
            "l_returnflag",
            "bin",
            "cum",
            F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("pct"),
            # integer ceil-division — a double `/` could land at
            # x.9999... and truncate off-by-one
            "tot",
        )
        .filter(
            F.col("cum")
            >= F.expr("CAST((tot * pct + 99) DIV 100 AS BIGINT)")
        )
        .groupBy("l_returnflag", "pct")
        .agg(F.min("bin").alias("value_bin"))
        .orderBy("l_returnflag", "pct")
    )


AGG_BINNED_PCTL_SQL = """
WITH counts AS (
  SELECT l_returnflag, CAST(FLOOR(l_extendedprice) AS BIGINT) AS bin,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, bin,
         SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts
),
thr AS (
  SELECT l_returnflag, pct,
         CAST((tot * pct + 99) // 100 AS BIGINT) AS thr
  FROM (SELECT l_returnflag, CAST(SUM(n) AS BIGINT) AS tot
        FROM counts GROUP BY 1),
       unnest([50, 90, 99]) AS p(pct)
)
SELECT c.l_returnflag, CAST(t.pct AS INT) AS pct,
       CAST(MIN(c.bin) AS BIGINT) AS value_bin
FROM cum c JOIN thr t
  ON c.l_returnflag = t.l_returnflag AND c.cum >= t.thr
GROUP BY 1, 2 ORDER BY 1, 2
"""


AGG_MAD_SQL = """
WITH med AS (
  SELECT event_type, value AS median_value FROM (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
  ) WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT e.event_type, e.event_id, m.median_value,
         abs(e.value - m.median_value) AS dev
  FROM events e JOIN med m USING (event_type)
)
SELECT event_type, median_value, dev AS mad, n FROM (
  SELECT event_type, median_value, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
) WHERE rn = (n + 1) // 2 ORDER BY event_type
"""


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key over (user_id,
    floor(value)) — the write-time layout that makes parquet min/max
    statistics prune range predicates on BOTH dimensions (the
    multi-column generalization of partition pruning; what Delta's
    OPTIMIZE ZORDER BY computes). The key derivation is exact bit
    arithmetic, so the layout itself is oracle-checked; at scale the
    frame feeds repartitionByRange(zkey) + sortWithinPartitions before
    the write (operators/layout.py).

    Coordinates are RANGE-BUCKETED from the data's own min/max (one
    1-row aggregate, broadcast) into [0, 2^16) before interleaving —
    linear scaling preserves order and locality, so pruning still
    works, and the curve no longer assumes raw ids fit 16 bits. The
    unbucketed form passed at sf<=0.1 and was caught by zorder_key's
    bounds guard in the round-9 sf1 correctness sweep (user_id 1e7
    exceeds 2^16) — exactly the silent-aliasing failure the guard
    exists to surface. Integer floor division keeps both engines
    bit-identical."""
    from salesforce_prefect_etl_pipeline_spark.operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.floor("value").cast("long").alias("vbucket")
    )
    bounds = ev.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("vbucket").alias("v_lo"),
        F.max("vbucket").alias("v_hi"),
    )
    xq = F.expr("((user_id - u_lo) * 65536) div (u_hi - u_lo + 1)")
    yq = F.expr("((vbucket - v_lo) * 65536) div (v_hi - v_lo + 1)")
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            "user_id",
            "vbucket",
            zorder_key(xq, yq).alias("zkey"),
        )
        .orderBy("zkey", "event_id")
    )


def _events_zorder_sql() -> str:
    from salesforce_prefect_etl_pipeline_spark.operators.layout import (
        zorder_key_sql,
    )

    zk = zorder_key_sql(
        "((user_id - u_lo) * 65536) // (u_hi - u_lo + 1)",
        "((vbucket - v_lo) * 65536) // (v_hi - v_lo + 1)",
    )
    return f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(FLOOR(value) AS BIGINT) AS vbucket FROM events
),
b AS (
  SELECT MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
         MIN(vbucket) AS v_lo, MAX(vbucket) AS v_hi
  FROM ev
)
SELECT event_id, user_id, vbucket, {zk} AS zkey
FROM ev, b ORDER BY zkey, event_id
"""


EVENTS_ZORDER_SQL = _events_zorder_sql()


for _name, _fn, _sql in [
    ("q1_pricing_summary", q1_pricing_summary, Q1_SQL),
    ("q3_shipping_priority", q3_shipping_priority, Q3_SQL),
    ("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL),
    ("q10_returned_items", q10_returned_items, Q10_SQL),
    ("join_asof_clicks_to_purchases", asof_clicks_to_purchases, ASOF_SQL),
    ("join_asof_forward", asof_forward_clicks, ASOF_FORWARD_SQL),
    ("join_asof_nearest", asof_nearest_clicks, ASOF_NEAREST_SQL),
    ("join_range_ship_within_30d", range_join_ship_within_30d, RANGE_JOIN_SQL),
    ("udtf_sentence_stats", udtf_sentence_stats, UDTF_SENTENCE_SQL),
    ("join_revenue_by_region", join_revenue_by_region, JOIN_REVENUE_BY_REGION_SQL),
    ("join_semi_customers_with_orders", semi_customers_with_orders, SEMI_SQL),
    ("join_anti_customers_without_orders", anti_customers_without_orders, ANTI_SQL),
    ("window_top3_orders_per_customer", window_top3_orders_per_customer, WINDOW_TOP3_SQL),
    ("window_running_total", window_running_total, WINDOW_RUNNING_SQL),
    ("window_order_gap_days", window_order_gap_days, WINDOW_GAP_SQL),
    ("window_rank_nations_by_acctbal", window_rank_nations_by_acctbal, WINDOW_RANK_SQL),
    ("window_ntile_order_quartiles", window_ntile_order_quartiles, WINDOW_NTILE_SQL),
    ("window_first_last_order", window_first_last_order, WINDOW_FIRST_LAST_SQL),
    ("window_percentile_ranks", window_percentile_ranks, WINDOW_PCTRANK_SQL),
    ("agg_approx_percentile_price", agg_approx_percentile_price, APPROX_PERCENTILE_CONTRACT_SQL),
    ("set_union_nationkeys", set_union_nationkeys, SET_UNION_SQL),
    ("set_intersect_nationkeys", set_intersect_nationkeys, SET_INTERSECT_SQL),
    ("set_except_nationkeys", set_except_nationkeys, SET_EXCEPT_SQL),
    ("rollup_lineitem", rollup_lineitem, ROLLUP_SQL),
    ("cube_orders", cube_orders, CUBE_SQL),
    ("grouping_sets_lineitem", grouping_sets_lineitem, GROUPING_SETS_SQL),
    ("pivot_status_by_priority", pivot_status_by_priority, PIVOT_DF_SQL),
    ("agg_distinct_suppliers_per_flag", agg_distinct_suppliers_per_flag, DISTINCT_AGG_SQL),
    ("agg_approx_distinct_suppliers", agg_approx_distinct_suppliers, APPROX_DISTINCT_CONTRACT_SQL),
    ("agg_median_acctbal_by_nation", agg_median_acctbal_by_nation, MEDIAN_SQL),
    ("agg_corr_price_qty", agg_corr_price_qty, AGG_CORR_SQL),
    ("agg_stddev_acctbal_by_segment", agg_stddev_acctbal_by_segment, STDDEV_SQL),
    ("orders_by_month", orders_by_month, ORDERS_BY_MONTH_SQL),
    ("events_json_extract", events_json_extract, EVENTS_JSON_SQL),
    ("events_props_variant", events_props_variant, EVENTS_VARIANT_SQL),
    ("join_salted_revenue_by_priority", join_salted_revenue_by_priority, SALTED_JOIN_SQL),
    ("events_props_explode", events_props_explode, EVENTS_PROPS_EXPLODE_SQL),
    ("lineitem_unpivot_stats", lineitem_unpivot_stats, LINEITEM_UNPIVOT_SQL),
    ("events_hourly_by_type", events_hourly_by_type, EVENTS_HOURLY_SQL),
    ("events_funnel", events_funnel, EVENTS_FUNNEL_SQL),
    ("events_retention_cohorts", events_retention_cohorts, EVENTS_RETENTION_SQL),
    ("events_session_sequences", events_session_sequences, EVENTS_SESSION_SEQ_SQL),
    ("events_transition_counts", events_transition_counts, EVENTS_TRANSITION_SQL),
    ("graph_nation_pagerank", graph_nation_pagerank, GRAPH_PAGERANK_SQL),
    ("graph_nation_triangles", graph_nation_triangles, GRAPH_TRIANGLES_SQL),
    ("agg_mode_priority_by_segment", agg_mode_priority_by_segment, AGG_MODE_SQL),
    ("events_zorder_layout", events_zorder_layout, EVENTS_ZORDER_SQL),
    ("agg_mad_value_by_type", agg_mad_value_by_type, AGG_MAD_SQL),
    ("agg_binned_percentiles", agg_binned_percentiles, AGG_BINNED_PCTL_SQL),
    ("agg_chi2_type_by_daypart", agg_chi2_type_by_daypart, AGG_CHI2_SQL),
    ("events_mad_outliers", events_mad_outliers, _events_mad_outliers_sql()),
]:
    register_query(_name, _fn, _sql)


def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of :func:`seasonal_volume_anomalies` over the
    testdata events table."""
    return seasonal_volume_anomalies(_t(spark, sf_dir, "events"))


def seasonal_volume_anomalies(events: DataFrame) -> DataFrame:
    """Seasonality-aware VOLUME anomaly report: for every
    (event_type, date, hour) bucket — including EMPTY ones, via a dense
    date x hour x type spine — the baseline is the discrete lower
    median of that (event_type, day-of-week, hour) cell's daily counts,
    and a bucket is anomalous when |n - median| > 3 x MAD. The
    time-series twin of ``events_mad_outliers`` (which fences VALUES,
    not volumes): this is the "did traffic at Tuesday 3pm collapse /
    spike" monitor an event pipeline runs, robust to heavy-tailed
    bursts. Dropping empty buckets would bias every baseline high and
    make outages invisible — hence the spine.

    Determinism: counts are integers, both medians use the discrete
    lower-median row_number pattern with (value, date) tiebreaks, and
    day-of-week is pmod(days-since-epoch, 7) (identical on both
    engines, no locale). Scale shape: the spine is |dates| x 24 x
    |types| rows (tiny relative to events), one hash aggregation over
    the event scan, then two window passes partitioned by the 840-ish
    (type, dow, hour) cells."""
    ev = events.select(
        F.to_date("ts").alias("d"), F.hour("ts").cast("int").alias("h"), "event_type"
    )
    counts = ev.groupBy("event_type", "d", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bounds = ev.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    hours = events.sparkSession.range(24).select(F.col("id").cast("int").alias("h"))
    types = counts.select("event_type").distinct()
    spine = days.crossJoin(F.broadcast(hours)).crossJoin(F.broadcast(types))
    dense = (
        spine.join(counts, ["event_type", "d", "h"], "left")
        .select(
            "event_type",
            "d",
            "h",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.pmod(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")), F.lit(7))
            .cast("int")
            .alias("dow"),
        )
    )
    cell = Window.partitionBy("event_type", "dow", "h")
    w1 = Window.partitionBy("event_type", "dow", "h").orderBy("n", "d")
    med = (
        dense.select(
            "event_type",
            "dow",
            "h",
            "n",
            F.row_number().over(w1).alias("rn"),
            F.count(F.lit(1)).over(cell).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) DIV 2"))
        .select("event_type", "dow", "h", F.col("n").alias("med_n"))
    )
    dev = dense.join(med, ["event_type", "dow", "h"]).select(
        "event_type",
        "dow",
        "h",
        "d",
        "n",
        "med_n",
        F.abs(F.col("n") - F.col("med_n")).alias("dev"),
    )
    w2 = Window.partitionBy("event_type", "dow", "h").orderBy("dev", "d")
    mad = (
        dev.select(
            "event_type",
            "dow",
            "h",
            "dev",
            F.row_number().over(w2).alias("rn"),
            F.count(F.lit(1)).over(cell).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) DIV 2"))
        .select("event_type", "dow", "h", F.col("dev").alias("mad_n"))
    )
    flagged = dev.join(mad, ["event_type", "dow", "h"]).select(
        "event_type",
        (F.col("dev") > 3 * F.col("mad_n")).cast("long").alias("is_anom"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("is_anom").alias("n_anomalous"),
        )
        .select(
            "event_type",
            "n_buckets",
            "n_anomalous",
            (F.col("n_anomalous").cast("double") / F.col("n_buckets").cast("double")).alias(
                "anomaly_share"
            ),
        )
        .orderBy("event_type")
    )


EVENTS_SEASONAL_SQL = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
),
days AS (
  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
hours AS (SELECT CAST(UNNEST(generate_series(0, 23)) AS INT) AS h),
counts AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(EXTRACT(hour FROM ts) AS INT) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
types AS (SELECT DISTINCT event_type FROM counts),
dense AS (
  SELECT t.event_type, dy.d, hr.h, COALESCE(c.n, 0) AS n,
         CAST((dy.d - DATE '1970-01-01') % 7 AS INT) AS dow
  FROM days dy CROSS JOIN hours hr CROSS JOIN types t
  LEFT JOIN counts c
    ON c.event_type = t.event_type AND c.d = dy.d AND c.h = hr.h
),
med AS (
  SELECT event_type, dow, h, n AS med_n FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type, dow, h ORDER BY n, d) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, dow, h) AS cnt
    FROM dense
  ) WHERE rn = (cnt + 1) // 2
),
dev AS (
  SELECT de.event_type, de.dow, de.h, de.d, de.n, m.med_n,
         ABS(de.n - m.med_n) AS dev
  FROM dense de JOIN med m
    ON de.event_type = m.event_type AND de.dow = m.dow AND de.h = m.h
),
mad AS (
  SELECT event_type, dow, h, dev AS mad_n FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type, dow, h ORDER BY dev, d) AS rn,
           COUNT(*) OVER (PARTITION BY event_type, dow, h) AS cnt
    FROM dev
  ) WHERE rn = (cnt + 1) // 2
)
SELECT dv.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN dv.dev > 3 * md.mad_n THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalous,
       CAST(SUM(CASE WHEN dv.dev > 3 * md.mad_n THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS anomaly_share
FROM dev dv JOIN mad md
  ON dv.event_type = md.event_type AND dv.dow = md.dow AND dv.h = md.h
GROUP BY dv.event_type ORDER BY dv.event_type
"""

register_query(
    "events_seasonal_anomalies", events_seasonal_anomalies, EVENTS_SEASONAL_SQL
)
