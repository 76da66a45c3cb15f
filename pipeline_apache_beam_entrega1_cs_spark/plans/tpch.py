"""TPC-H remainder: the 15 query shapes not already covered by the
headline set (Q1/Q3/Q4/Q5/Q6/Q10/Q14 live in relational*.py). With this
module the registry covers all 22 TPC-H query shapes.

The driver's testdata is a SIMPLIFIED TPC-H star schema (TESTDATA.md):
no partsupp table, no l_shipmode/l_commitdate/l_receiptdate, no
c_phone/o_comment/p_container. Queries whose official text needs those
columns are adapted shape-preservingly (same join graph, same subquery
structure, same aggregate pattern) and each docstring says exactly what
was substituted. Determinism follows plans/spec.py conventions: decimal
sums, BIGINT scalars, epoch dates, total-order tie-breaks on every
LIMIT.

Scale notes (100 TB): every query below is a declarative single plan —
Catalyst handles pushdown/pruning; nation/region are broadcast
explicitly (fixed-size dims), all other join sides are left to AQE so
fact-fact joins stay sort-merge and dims flip to broadcast when small
at runtime. No Python UDFs, no driver-side loops; scalar subqueries
(q11/q15/q17/q22) are one extra tiny aggregate reused via cross-join
broadcast, not a per-row recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import (
    davg,
    dmoney,
    drev,
    dsum,
    dsum_dec,
    sql_davg,
    sql_dsum,
    sql_dsum_dec,
    sql_money,
    sql_rev,
)
from ..schemas import load_table
from .spec import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():  # built lazily: F.col needs an active SparkContext in classic mode
    # Exact decimal product (operands cast first) — see functions/numeric.py:
    # a double product cast to decimal inside SUM is not engine-portable.
    return drev()


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part via a correlated-min
    subquery, region-scoped. No partsupp table -> supply cost is proxied
    by each supplier's best observed unit price MIN(l_extendedprice /
    l_quantity) over its lineitems for that part; scope is EUROPE
    suppliers and STANDARD parts of size <= 10. The correlated
    `cost = (SELECT MIN ...)` becomes a per-part min aggregate joined
    back on (partkey, cost) — the standard decorrelation Catalyst would
    produce itself."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    part = _t(spark, sf_dir, "part")

    pair_cost = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    scoped = (
        pair_cost.join(supp, F.col("sk") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("pk", "sk", "cost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = scoped.groupBy(F.col("pk").alias("mpk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        scoped.join(
            min_cost,
            (F.col("pk") == F.col("mpk")) & (F.col("cost") == F.col("min_cost")),
        )
        .join(
            part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")),
            F.col("pk") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH pair_cost AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2),
scoped AS (
  SELECT pk, sk, cost FROM pair_cost
  JOIN supplier ON sk = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, cost AS supply_cost
FROM part
JOIN scoped ON pk = p_partkey
JOIN supplier ON sk = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 10 AND p_type = 'STANDARD'
  AND cost = (SELECT MIN(cost) FROM scoped s2 WHERE s2.pk = p_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.
    Exact shape — 6-way join with two nation roles (supplier side and
    customer side) and a symmetric pair predicate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(_t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = F.broadcast(_t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, supp.s_nationkey == F.col("n1_key"))
        .join(n2, cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum_dec(sql_rev())} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share (revenue fraction) per year
    inside one region + part type. 8-way join, conditional-sum ratio.
    Both sums are exact decimals so the double ratio is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = F.broadcast(_t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = F.broadcast(_t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = F.broadcast(_t(spark, sf_dir, "region")).filter(
        F.col("r_name") == "AMERICA"
    )
    # otherwise() must stay decimal: a double 0.0 would coerce the whole
    # conditional back to double and reopen the rounding seam.
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, cust.c_nationkey == F.col("n1_key"))
        .join(region, F.col("n1_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n2, supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((dsum(nation_rev) / dsum(_rev())).alias("mkt_share"))
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum_dec("CASE WHEN n2.n_name = 'NATION_1' THEN " + sql_rev() + " ELSE CAST(0 AS DECIMAL(18,4)) END")}
       / {sql_dsum_dec(sql_rev())} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
GROUP BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation and year for parts matching a
    name pattern. No partsupp -> ps_supplycost * l_quantity is proxied
    by p_retailprice * l_quantity (same join graph, same LIKE filter,
    same grouped decimal sum of a revenue-minus-cost expression)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    amount = _rev() - dmoney("p_retailprice") * F.col("l_quantity").cast("decimal(4,0)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum_dec(sql_rev() + ' - ' + sql_money('p_retailprice') + " * CAST(l_quantity AS DECIMAL(4,0)) ")} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose scoped value exceeds a fraction of the
    global scoped total — grouped aggregate HAVING against a scalar
    subquery. No partsupp -> part value is the sum of EUROPE-supplier
    lineitem extendedprice. The scalar total is computed once and
    broadcast-cross-joined (one row), not recomputed per group."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region")).filter(
        F.col("r_name") == "EUROPE"
    )
    scoped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("l_partkey", "l_extendedprice")
    )
    grouped = scoped.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        dsum("l_extendedprice").alias("part_value")
    )
    total = scoped.agg(dsum("l_extendedprice").alias("total_value"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.0005 * F.col("total_value"))
        .select("p_partkey", "part_value")
    )


Q11_SQL = f"""
WITH scoped AS (
  SELECT l_partkey, l_extendedprice FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT l_partkey AS p_partkey, {sql_dsum('l_extendedprice')} AS part_value
FROM scoped GROUP BY 1
HAVING {sql_dsum('l_extendedprice')} > 0.0005 * (SELECT {sql_dsum('l_extendedprice')} FROM scoped)
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority order counts per line class
    for one ship year. No l_shipmode/l_commitdate -> grouped by
    l_linestatus over a shipdate year window; the signature conditional
    dual-count (URGENT+HIGH vs rest) is exact."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY 1
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — left outer
    join preserving order-less customers, then a second aggregation over
    the first's result (two chained shuffles; AQE coalesces both)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue (exact
    decimal revenue makes the equality deterministic; ties all kept, as
    in the official query).

    The scalar max is a second aggregate branch broadcast back onto the
    per-supplier aggregate (Catalyst rewrites the crossJoin + equality
    filter into a BroadcastHashJoin). The earlier global-window form
    avoided the second quarter-slice scan but sorted the ENTIRE
    per-supplier aggregate into one partition — |suppliers| grows with
    scale (~1e9 rows at 100 TB), so that plan hits a single-task wall.
    Two pushed-down scans of a 3-month lineitem slice parallelize
    linearly instead, and AQE exchange reuse can collapse them at
    runtime."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_revenue"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("_max_revenue")
    )
    return (
        supp.join(top, supp.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum_dec(sql_rev())} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per part attribute triple,
    excluding a supplier blocklist (NOT IN subquery -> left-anti join;
    the blocklist stand-in is negative-balance suppliers since the
    schema has no comment column to grep 'Customer Complaints' in)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity orders of one brand —
    correlated per-part AVG subquery, decorrelated into a per-part
    average aggregate joined back on partkey (p_container filter dropped;
    not in schema). avg is decimal-sum/count so both engines compare
    l_quantity against the identical double."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("apk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("apk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * (
    SELECT {sql_davg('l_quantity')} FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold (IN
    subquery on a grouped HAVING -> left-semi join), re-joined to
    customer and re-aggregated; top-100 by (totalprice desc, orderkey)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_big"))
        .filter(F.col("sum_big") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("bigint").alias("o_orderdate_epoch"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       o_totalprice, {sql_dsum('l_quantity')} AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > 250)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three OR'd brand/size/quantity predicate
    bundles (container and shipmode clauses dropped; not in schema).
    The disjunction sits on the joined row as in the official query —
    Catalyst still pushes the common join key through."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    bundle = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bundle)
        .agg(dsum(_rev()).alias("revenue"))
    )


Q19_SQL = f"""
SELECT {sql_dsum_dec(sql_rev())} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers dominating supply of name-matched
    parts, region-scoped. No ps_availqty -> 'has excess stock' becomes
    'shipped > 10% of the part's total quantity' (nested aggregate
    compared against a per-part aggregate, preserving the
    doubly-nested-subquery structure)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region")).filter(
        F.col("r_name") == "EUROPE"
    )
    blue_lines = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    part_total = blue_lines.groupBy(F.col("l_partkey").alias("tpk")).agg(
        dsum("l_quantity").alias("total_qty")
    )
    pair_qty = blue_lines.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("supp_qty")
    )
    heavy = (
        pair_qty.join(part_total, F.col("l_partkey") == F.col("tpk"))
        .filter(F.col("supp_qty") > 0.1 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH part_total AS (
  SELECT l_partkey AS pk, {sql_dsum('l_quantity')} AS total_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%blue%' GROUP BY 1),
pair_qty AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, {sql_dsum('l_quantity')} AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%blue%' GROUP BY 1, 2)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT sk FROM pair_qty JOIN part_total USING (pk)
    WHERE supp_qty > 0.1 * total_qty)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finalized order. No l_commitdate/l_receiptdate ->
    'late' is l_shipdate > o_orderdate + 60 days. The official
    EXISTS / NOT EXISTS pair is expressed as per-order supplier stats
    (distinct suppliers, distinct late suppliers) — one aggregate pass
    instead of two correlated scans, same result set; counts are per
    (order, supplier) pair so both engines agree on multiplicity."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    f_lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    order_stats = f_lines.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    waiting = (
        f_lines.filter(F.col("is_late"))
        .join(order_stats, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH f_lines AS (
  SELECT l_orderkey, l_suppkey, l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
order_stats AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM f_lines GROUP BY 1),
waiting AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM f_lines f JOIN order_stats o ON f.l_orderkey = o.l_orderkey
  WHERE f.is_late AND o.n_supp > 1 AND o.n_late_supp = 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM waiting JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, counted per group. No c_phone -> the country-code substring
    scope becomes a nationkey list, and 'no orders' (every customer here
    has some) becomes 'no orders since 2000-01-01'; the
    scalar-avg subquery + NOT EXISTS anti-join structure is intact."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    scoped = cust.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = scoped.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("ab")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        scoped.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, scoped.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


Q22_SQL = f"""
WITH scoped AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9)),
avg_bal AS (SELECT {sql_davg('c_acctbal')} AS ab FROM scoped WHERE c_acctbal > 0.0)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust, {sql_dsum('c_acctbal')} AS totacctbal
FROM scoped, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey
"""


QUERIES: dict[str, QuerySpec] = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL, "tpch"),
    "q7_volume_shipping": QuerySpec(q7_volume_shipping, Q7_SQL, "tpch"),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL, "tpch"),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_SQL, "tpch"),
    "q11_important_parts": QuerySpec(
        q11_important_parts, Q11_SQL, "tpch",
        plan_waivers={"bnlj": "1-row scoped-total scalar"}),
    "q12_priority_shipping": QuerySpec(q12_priority_shipping, Q12_SQL, "tpch"),
    "q13_customer_distribution": QuerySpec(
        q13_customer_distribution, Q13_SQL, "tpch"
    ),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL, "tpch"),
    "q16_supplier_cnt": QuerySpec(q16_supplier_cnt, Q16_SQL, "tpch"),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL, "tpch"),
    "q18_large_volume_customers": QuerySpec(
        q18_large_volume_customers, Q18_SQL, "tpch"
    ),
    "q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_SQL, "tpch"),
    "q20_heavy_suppliers": QuerySpec(q20_heavy_suppliers, Q20_SQL, "tpch"),
    "q21_waiting_suppliers": QuerySpec(q21_waiting_suppliers, Q21_SQL, "tpch"),
    "q22_inactive_customers": QuerySpec(
        q22_inactive_customers, Q22_SQL, "tpch",
        plan_waivers={"bnlj": "1-row avg-balance scalar"}),
}
