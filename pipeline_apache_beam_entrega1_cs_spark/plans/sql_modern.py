"""Modern SQL-frontend surface (SURVEY.md §2B subqueries/SQL rows):
recursive CTEs, LATERAL joins, GROUP BY ALL / ORDER BY ALL — all native
in both Spark 4 and DuckDB, so each gets full oracle parity.

These run through ``spark.sql`` on temp views (suffixed per query so
concurrent test sessions don't collide), exercising the SQL parser path
rather than the DataFrame builder — a user of the reference migrating
raw SQL needs the frontend, not just the API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import load_table
from .spec import QuerySpec

# Exact-decimal money sum, one string per dialect (see functions/numeric).
_SPARK_DSUM = "CAST(CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS STRING) AS DOUBLE)"
_DUCK_DSUM = "CAST(CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"


def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate an 18-month
    calendar spine (1994-07 .. 1995-12) and left-join monthly order
    revenue, zero-filling months before the data starts — the gap-free
    time-series report a plain GROUP BY cannot produce.

    Scale: the recursion materializes 18 rows on the driver side of the
    plan (a loop of LocalRelation unions) — constant size regardless of
    fact volume; the single real shuffle is the monthly aggregate, and
    the spine side broadcasts."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte")
    rev = _SPARK_DSUM.format(x="o_totalprice")
    return spark.sql(f"""
        WITH RECURSIVE ym(y, mo) AS (
          SELECT 1994, 7
          UNION ALL
          SELECT CASE WHEN mo = 12 THEN y + 1 ELSE y END,
                 CASE WHEN mo = 12 THEN 1 ELSE mo + 1 END
          FROM ym WHERE y * 100 + mo < 199512
        ),
        spine AS (SELECT format_string('%04d-%02d', y, mo) AS ym FROM ym),
        rev AS (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS ym,
                 COUNT(*) AS n_orders,
                 {rev} AS revenue
          FROM orders_rcte
          GROUP BY date_format(o_orderdate, 'yyyy-MM')
        )
        SELECT spine.ym,
               COALESCE(n_orders, CAST(0 AS BIGINT)) AS n_orders,
               COALESCE(revenue, CAST(0.0 AS DOUBLE)) AS revenue
        FROM spine LEFT JOIN rev ON spine.ym = rev.ym
    """)


RECURSIVE_MONTH_SPINE_SQL = f"""
WITH RECURSIVE ym(y, mo) AS (
  SELECT 1994, 7
  UNION ALL
  SELECT CASE WHEN mo = 12 THEN y + 1 ELSE y END,
         CASE WHEN mo = 12 THEN 1 ELSE mo + 1 END
  FROM ym WHERE y * 100 + mo < 199512
),
spine AS (SELECT printf('%04d-%02d', y, mo) AS ym FROM ym),
rev AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         COUNT(*) AS n_orders,
         {_DUCK_DSUM.format(x="o_totalprice")} AS revenue
  FROM orders
  GROUP BY 1
)
SELECT spine.ym,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(revenue, 0.0) AS revenue
FROM spine LEFT JOIN rev ON spine.ym = rev.ym
"""


def lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join: per-nation top-3 customers by account balance via a
    correlated ordered-LIMIT subquery — the SQL-frontend twin of the
    window-function topk_per_group entry (same semantics, different
    surface; Catalyst rewrites it to a DomainJoin + ranked window).

    Total order inside the lateral (acctbal DESC, custkey ASC) makes the
    result deterministic."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql("""
        SELECT n_name, c.c_custkey, c.c_acctbal
        FROM nation_lat, LATERAL (
          SELECT c_custkey, c_acctbal
          FROM customer_lat
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC
          LIMIT 3
        ) c
    """)


LATERAL_TOPK_SQL = """
SELECT n_name, c.c_custkey, c.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 3
) c
"""


def group_by_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB shorthand): group on
    every non-aggregate select item — including a computed one — without
    restating the list. Same plan as the explicit GROUP BY; the surface
    under test is the resolver."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    total = _SPARK_DSUM.format(x="o_totalprice")
    return spark.sql(f"""
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               COUNT(*) AS n_orders,
               {total} AS total_price
        FROM orders_gba
        GROUP BY ALL
        ORDER BY ALL
    """)


GROUP_BY_ALL_SQL = f"""
SELECT o_orderstatus,
       o_orderpriority,
       year(o_orderdate) AS order_year,
       COUNT(*) AS n_orders,
       {_DUCK_DSUM.format(x="o_totalprice")} AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined UDFs (``CREATE FUNCTION ... RETURN expr``)
    plus named-parameter ``spark.sql(..., args=...)`` — the
    catalog-level reusable-expression surface. Unlike Python UDFs, SQL
    UDFs INLINE into Catalyst (whole-stage codegen, pushdown intact),
    so they are the right way to share scalar logic at 100 TB. Defines
    a decimal-exact revenue function (the spec.py money convention
    inside the function body, so the SUM stays partition-order
    independent) and a quantity-tier CASE function, then aggregates
    revenue per tier with the date bound passed as a named parameter."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_rev(p DOUBLE, d DOUBLE)
           RETURNS DECIMAL(18,4)
           RETURN CAST(CAST(p AS DECIMAL(12,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))
                  AS DECIMAL(18,4))"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_qty_tier(q DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN q < 10 THEN 'small'
                       WHEN q < 30 THEN 'mid' ELSE 'large' END"""
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf")
    return spark.sql(
        """
        SELECT graft_qty_tier(l_quantity) AS tier,
               COUNT(*) AS n_lines,
               CAST(CAST(SUM(graft_rev(l_extendedprice, l_discount))
                    AS STRING) AS DOUBLE) AS revenue
        FROM li_sqludf
        WHERE CAST(l_shipdate AS DATE) >= CAST(:start_date AS DATE)
        GROUP BY 1
        """,
        args={"start_date": "1997-01-01"},
    )


SQL_UDF_FUNCTIONS_SQL = """
SELECT CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'mid' ELSE 'large' END AS tier,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "sql_udf_functions": QuerySpec(
        sql_udf_functions, SQL_UDF_FUNCTIONS_SQL, "sql_frontend"),
    "recursive_month_spine": QuerySpec(
        recursive_month_spine, RECURSIVE_MONTH_SPINE_SQL, "sql_frontend"),
    "lateral_topk_customers": QuerySpec(
        lateral_topk_customers, LATERAL_TOPK_SQL, "sql_frontend"),
    "group_by_all_orders": QuerySpec(
        group_by_all_orders, GROUP_BY_ALL_SQL, "sql_frontend"),
}
