"""Additional TPC-H-style queries adapted to the testdata's reduced
star schema (no partsupp / l_commitdate / l_shipmode / c_phone — see
TESTDATA.md), widening the join/subquery surface beyond queries_ext:
correlated EXISTS (Q4), dual-dimension flow analysis (Q7), market-share
conditional aggregation (Q8), outer-join histogram (Q13), CASE-ratio
aggregate (Q14), max-subquery (Q15), per-group-average correlated filter
(Q17), HAVING-gated fact self-join (Q18), disjunctive multi-range
predicates (Q19).

Same determinism rules as queries_ext: float sums accumulate via
``exact_sum`` (DECIMAL quantization — partition-order independent),
temporals stringified at the edge, every top-k ordering carries a unique
tiebreak. All plans are declarative DataFrame compositions: Catalyst
broadcasts the dims (nation/part/customer at these selectivities),
pushes every date/brand filter into the parquet scans, and AQE picks
shuffle-vs-broadcast for the fact-fact joins at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from salesforce_prefect_etl_pipeline_spark.functions import exact_sum, exact_sum_sql
from salesforce_prefect_etl_pipeline_spark.plans import load_table
from salesforce_prefect_etl_pipeline_spark.queries_registry import register_query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Q4: order-priority checking — correlated EXISTS becomes a left-semi
# join (the correlation l_shipdate > o_orderdate rides in the join
# condition; Spark still plans a semi hash join, no per-row subquery).
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ----------------------------------------------------------------------
# Q7: volume shipping between two nations — the fact joins two distinct
# dimension chains (supplier->nation and orders->customer->nation); both
# nation dims broadcast, so the only wide op is the final group-by.
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    flows = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        flows.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(exact_sum(F.expr(REVENUE)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       {exact_sum_sql(REVENUE)} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ----------------------------------------------------------------------
# Q8: market share — one nation's fraction of PROMO-part revenue into
# one customer region, per year. Ratio of two exact sums (deterministic:
# both quantized-DECIMAL, divided once in double).
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select("n_nationkey", "n_regionkey")
    base = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    target = F.expr(f"CASE WHEN supp_nation = 'NATION_5' THEN {REVENUE} ELSE 0.0 END")
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (exact_sum(target) / exact_sum(F.expr(REVENUE))).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       {exact_sum_sql(f"CASE WHEN n1.n_name = 'NATION_5' THEN {REVENUE} ELSE 0.0 END")}
         / {exact_sum_sql(REVENUE)} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------------------
# Q13: customer order-count distribution — left outer join (customers
# with zero orders must appear with c_count 0), then a histogram of the
# per-customer counts. Two aggregations, both narrow after the first.
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ----------------------------------------------------------------------
# Q14: promo revenue ratio — CASE inside the aggregate; single output
# row, fully map-side until the 1-group reduce.
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.expr(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE 0.0 END")
    return joined.agg(
        (F.lit(100.0) * exact_sum(promo) / exact_sum(F.expr(REVENUE))).alias(
            "promo_revenue"
        )
    )


Q14_SQL = f"""
SELECT 100.0 * {exact_sum_sql(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE 0.0 END")}
       / {exact_sum_sql(REVENUE)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ----------------------------------------------------------------------
# Q15: top supplier — max-revenue subquery expressed as an empty-frame
# window max (one extra exchange over the tiny aggregated frame, not
# over the fact). Deterministic: revenue is an exact sum, ties kept.
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(F.expr(REVENUE)).alias("total_revenue")
    )
    best = rev.withColumn("__max", F.max("total_revenue").over(Window.partitionBy()))
    return (
        best.filter(F.col("total_revenue") == F.col("__max"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {exact_sum_sql(REVENUE)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------------------
# Q17: small-quantity-order revenue — per-part average quantity as a
# grouped subquery joined back to the fact (Catalyst turns the TPC-H
# correlated form into exactly this). l_quantity is integer-valued, so
# avg = exact-int-sum / count is bit-identical across engines and the
# 0.2 * avg comparison cannot straddle engines differently.
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_quantity")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_quantity"))
        .agg((exact_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT {exact_sum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
JOIN (SELECT l_partkey AS ap_partkey,
             SUM(l_quantity) / COUNT(l_quantity) AS avg_quantity
      FROM lineitem GROUP BY 1) a ON l_partkey = ap_partkey
WHERE l_quantity < 0.2 * avg_quantity
"""


# ----------------------------------------------------------------------
# Q18: large-volume orders — HAVING over the fact group-by gates which
# orders survive, then two broadcast-able dim joins. sum(l_quantity) is
# integer-valued => plain F.sum is already exact/deterministic.
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice, sum_qty
FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# ----------------------------------------------------------------------
# Q19: disjunctive multi-range predicates — one join, three OR'd
# (brand, size-range, quantity-range) branches. Catalyst extracts the
# common l_partkey = p_partkey conjunct as the equi-join key and leaves
# the disjunction as a post-join filter; the brand/size side of each
# branch prunes the part scan.
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            exact_sum(F.expr(REVENUE)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_SQL = f"""
SELECT {exact_sum_sql(REVENUE)} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


for _name, _fn, _sql in [
    ("q4_order_priority", q4_order_priority, Q4_SQL),
    ("q7_volume_shipping", q7_volume_shipping, Q7_SQL),
    ("q8_market_share", q8_market_share, Q8_SQL),
    ("q13_customer_distribution", q13_customer_distribution, Q13_SQL),
    ("q14_promo_revenue", q14_promo_revenue, Q14_SQL),
    ("q15_top_supplier", q15_top_supplier, Q15_SQL),
    ("q17_small_qty_revenue", q17_small_qty_revenue, Q17_SQL),
    ("q18_large_orders", q18_large_orders, Q18_SQL),
    ("q19_disjunctive", q19_disjunctive, Q19_SQL),
]:
    register_query(_name, _fn, _sql)
