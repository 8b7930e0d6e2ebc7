"""Additional TPC-H-style queries adapted to the testdata's reduced
star schema (no partsupp / l_commitdate / l_shipmode / c_phone — see
TESTDATA.md), widening the join/subquery surface beyond queries_ext:
correlated EXISTS (Q4), dual-dimension flow analysis (Q7), market-share
conditional aggregation (Q8), outer-join histogram (Q13), CASE-ratio
aggregate (Q14), max-subquery (Q15), per-group-average correlated filter
(Q17), HAVING-gated fact self-join (Q18), disjunctive multi-range
predicates (Q19); and — adapted for the missing partsupp /
l_commitdate columns while keeping each query's plan SHAPE — profit
decomposition (Q9, retailprice cost proxy), ship-latency priority
analysis (Q12, latency buckets replace shipmodes), supplier-per-part
census (Q16, the distinct (l_partkey, l_suppkey) pairs of lineitem
stand in for partsupp), dominant-supplier detection (Q20, shipped-share
replaces availqty), the waiting-supplier double EXISTS/NOT-EXISTS
(Q21, shipdate lateness replaces receipt-vs-commit), and idle
above-average-balance customers (Q22, nations replace phone prefixes).
min-cost-supplier selection (Q2) and stock-value shares (Q11) — for
both, observed lineitem supply stands in for partsupp: the distinct
(l_partkey, l_suppkey) pairs with their minimum shipped unit price
(supplycost proxy) and total shipped quantity (availqty proxy). That
completes the adapted TPC-H set: every query shape is represented.

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
# Q15: top supplier — max-revenue subquery as a 1-row global aggregate
# broadcast against the per-supplier frame (NOT a global window: an
# empty-frame WindowExec funnels the whole supplier-cardinality frame
# through one partition, ~1M rows at 100x SF). The two consumers of
# `rev` share the aggregation exchange via ReusedExchange.
# Deterministic: revenue is an exact sum, ties kept.
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(F.expr(REVENUE)).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__max"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max"))
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


# ----------------------------------------------------------------------
# Q9 (adapted): product-type profit by nation and year. TPC-H prices the
# cost side from partsupp.ps_supplycost; without partsupp the cost proxy
# is 0.6 * p_retailprice per unit (same join tree, same group-by, same
# profit-decomposition shape). Identical expression STRING feeds both
# engines so the double arithmetic associates identically before the
# exact_sum quantization.
PROFIT = "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(exact_sum(F.expr(PROFIT)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       {exact_sum_sql(PROFIT)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# ----------------------------------------------------------------------
# Q12 (adapted): shipping-latency vs order priority. TPC-H buckets by
# l_shipmode with a receipt/commit lateness filter; neither column
# exists, so the bucket is the ship latency itself (datediff shipdate -
# orderdate, FAST <= 365 days < SLOW) — same shape: one fact-fact equi
# join, CASE-summed priority counts per bucket. Sums of 0/1 ints need
# the BIGINT cast in the oracle (DuckDB SUM(int) is HUGEINT).
def q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    latency = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = F.when(latency <= 365, "FAST").otherwise("SLOW")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        joined.groupBy(bucket.alias("latency_bucket"))
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
        .orderBy("latency_bucket")
    )


Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 365
            THEN 'FAST' ELSE 'SLOW' END AS latency_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY 1 ORDER BY latency_bucket
"""


# ----------------------------------------------------------------------
# Q16 (adapted): how many suppliers can serve each part descriptor. The
# partsupp relation is reconstructed as the DISTINCT (l_partkey,
# l_suppkey) pairs actually observed in lineitem (one fact shuffle);
# "complaint" suppliers are approximated by negative account balance
# (tiny broadcast anti-join, same exclusion shape as TPC-H's NOT IN).
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    ps = ps.join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    return (
        ps.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ----------------------------------------------------------------------
# Q20 (adapted): suppliers holding a dominant share of a promo part.
# TPC-H compares ps_availqty against half the year's shipped quantity;
# without partsupp the shape is kept as shipped-share: a supplier is
# flagged when its 1997 shipped quantity of a PROMO part exceeds 30% of
# that part's total — a grouped fact aggregate, a per-part window (the
# partition-local share, no second shuffle: the window key prefixes the
# group-by key), then a semi-join back to the supplier dim.
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    qty = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    total = F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
    dominant = qty.withColumn("part_qty", total).filter(
        F.col("supp_qty").cast("double") > 0.3 * F.col("part_qty").cast("double")
    )
    return (
        supp.join(
            dominant.select("l_suppkey").distinct(),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty,
           SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
  ) WHERE CAST(supp_qty AS DOUBLE) > 0.3 * CAST(part_qty AS DOUBLE)
)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------------------
# Q21 (adapted): suppliers who kept finished orders waiting — the
# classic double correlated EXISTS (another supplier participated) /
# NOT EXISTS (no OTHER supplier was late) pair, planned as a left-semi
# plus a left-anti join against the same fact. "Late" is adapted to
# l_shipdate > o_orderdate + 120 days (no receipt/commit dates); the
# anti-join's lateness test references the carried o_orderdate, keeping
# the correlation three-way exactly like TPC-H. All three fact legs
# shuffle on l_orderkey, so AQE plans them into one exchange reuse.
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    late_days = lambda ship, od: F.datediff(ship.cast("date"), od.cast("date"))  # noqa: E731
    l1 = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late_days(F.col("l_shipdate"), F.col("o_orderdate")) > 120)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
    )
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = l1.join(
        l2,
        (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("o3") == F.col("l_orderkey"))
        & (F.col("s3") != F.col("l_suppkey"))
        & (late_days(F.col("d3"), F.col("o_orderdate")) > 120),
        "left_anti",
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
WHERE date_diff('day', o_orderdate, l1.l_shipdate) > 120
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND date_diff('day', o_orderdate, l3.l_shipdate) > 120)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""


# ----------------------------------------------------------------------
# Q22 (adapted): customers with above-average balances and no RECENT
# orders, reported per nation (phone country codes don't exist; the
# nation dim carries the same role; "no orders ever" is degenerate in
# this testdata — every customer has one — so the NOT EXISTS carries a
# date predicate instead, same plan shape: the filter rides inside the
# anti-join's build side). Scalar-subquery threshold via exact_sum/count
# — both engines produce the identical double, so the boundary
# comparison cannot diverge; the scalar rides a broadcast cross-join.
Q22_NATIONS = (1, 3, 5, 7, 9, 11, 13)


def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*Q22_NATIONS)
    )
    recent = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    nation = _t(spark, sf_dir, "nation")
    avg_df = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (exact_sum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_df)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        idle.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = f"""
WITH sel AS (
  SELECT * FROM customer WHERE c_nationkey IN {Q22_NATIONS}
)
SELECT n_name, COUNT(*) AS numcust, {exact_sum_sql('c_acctbal')} AS totacctbal
FROM sel JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT {exact_sum_sql('c_acctbal')} / COUNT(*)
                   FROM sel WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name ORDER BY n_name
"""


# ----------------------------------------------------------------------
# Q2: min-cost supplier per part — partsupp is absent (TESTDATA.md), so
# OBSERVED supply stands in: per (l_partkey, l_suppkey), the minimum
# unit price ever shipped, quantized to integer cents (floor(price/qty
# * 100) — identical IEEE double ops in both engines, then exact bigint
# min/compare, so the per-part minimum is hash-stable). The plan keeps
# Q2's shape: a fact-sized supply aggregate, broadcast dim filters
# (part selection, region-gated suppliers), and a per-part window min
# keeping every supplier that achieves it.
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ucost = (
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
    )
    supply = (
        li.select("l_partkey", "l_suppkey", ucost.alias("ucost"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("ucost").alias("unit_cost_cents"))
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & F.col("p_size").between(30, 50))
        .select("p_partkey", "p_brand")
    )
    cand = supply.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    best = F.min("unit_cost_cents").over(Window.partitionBy("p_partkey"))
    return (
        cand.withColumn("__min", best)
        .filter(F.col("unit_cost_cents") == F.col("__min"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "unit_cost_cents",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100) AS BIGINT))
           AS unit_cost_cents
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cand AS (
  SELECT p.p_partkey, p.p_brand, e.s_acctbal, e.s_name, e.n_name,
         s.unit_cost_cents
  FROM supply s
  JOIN part p ON s.l_partkey = p.p_partkey
  JOIN eu e ON s.l_suppkey = e.s_suppkey
  WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 30 AND 50
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost_cents
FROM cand c
WHERE unit_cost_cents = (SELECT MIN(unit_cost_cents) FROM cand c2
                         WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ----------------------------------------------------------------------
# Q11: important stock — partsupp value (availqty * supplycost) becomes
# observed supply value: min shipped unit price (cents) * total shipped
# quantity per (part, supplier), suppliers restricted to one nation.
# All arithmetic is bigint (integral l_quantity cast per row before the
# sum; integer cents), and the HAVING threshold is the cross-multiplied
# integer comparison value * n_parts > total — "parts above the average
# value share", the scale-invariant analog of Q11's 0.0001/SF fraction
# (a fixed fraction empties at higher SF and saturates at lower) — with
# no division anywhere, so the share filter is bit-exact in both
# engines.
_Q11_NATION = "NATION_7"


def q11_supply_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == _Q11_NATION)
    nat_supp = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    ucost = (
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
    )
    supply = (
        li.select(
            "l_partkey",
            "l_suppkey",
            ucost.alias("ucost"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("ucost").alias("ucost"), F.sum("qty").alias("qty"))
    )
    val = (
        supply.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", (F.col("ucost") * F.col("qty")).alias("v"))
        .groupBy("l_partkey")
        .agg(F.sum("v").alias("value_cents"))
    )
    # Global total/count as a 1-row agg broadcast over the per-part
    # frame — the frame is part-cardinality (sf-scaled), so a global
    # window here would single-partition ~2M rows at 100x SF.
    tot = val.agg(
        F.sum("value_cents").alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("__n") > F.col("__tot"))
        .select("l_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "l_partkey")
    )


Q11_SQL = f"""
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{_Q11_NATION}'
), supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100) AS BIGINT)) AS ucost,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
), val AS (
  SELECT l_partkey, CAST(SUM(ucost * qty) AS BIGINT) AS value_cents
  FROM supply JOIN nat_supp ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT l_partkey, value_cents
FROM val
WHERE value_cents * (SELECT COUNT(*) FROM val)
      > (SELECT SUM(value_cents) FROM val)
ORDER BY value_cents DESC, l_partkey
"""


for _name, _fn, _sql in [
    ("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL),
    ("q11_supply_value_share", q11_supply_value_share, Q11_SQL),
    ("q4_order_priority", q4_order_priority, Q4_SQL),
    ("q7_volume_shipping", q7_volume_shipping, Q7_SQL),
    ("q8_market_share", q8_market_share, Q8_SQL),
    ("q13_customer_distribution", q13_customer_distribution, Q13_SQL),
    ("q14_promo_revenue", q14_promo_revenue, Q14_SQL),
    ("q15_top_supplier", q15_top_supplier, Q15_SQL),
    ("q17_small_qty_revenue", q17_small_qty_revenue, Q17_SQL),
    ("q18_large_orders", q18_large_orders, Q18_SQL),
    ("q19_disjunctive", q19_disjunctive, Q19_SQL),
    ("q9_product_profit", q9_product_profit, Q9_SQL),
    ("q12_ship_latency", q12_ship_latency, Q12_SQL),
    ("q16_supplier_part_counts", q16_supplier_part_counts, Q16_SQL),
    ("q20_dominant_suppliers", q20_dominant_suppliers, Q20_SQL),
    ("q21_suppliers_kept_waiting", q21_suppliers_kept_waiting, Q21_SQL),
    ("q22_idle_balance", q22_idle_balance, Q22_SQL),
]:
    register_query(_name, _fn, _sql)
