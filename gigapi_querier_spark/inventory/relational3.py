"""Relational coverage, batch 3: right/lateral joins, bag set-ops, map
expressions, date formatting — closing out the SURVEY.md §2.B checklist."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.sources import load_tables


def _sql(spark: SparkSession, sf_dir: str, query: str, *tables: str) -> DataFrame:
    load_tables(spark, sf_dir, tables or None)
    return spark.sql(query)


RIGHT_JOIN = """
SELECT s_suppkey, s_name, CAST(count(l_orderkey) AS BIGINT) AS n_lines
FROM lineitem RIGHT JOIN supplier ON l_suppkey = s_suppkey AND l_quantity > 49
GROUP BY s_suppkey, s_name
"""


@register("join_right_outer", oracle=RIGHT_JOIN)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, RIGHT_JOIN, "lineitem", "supplier")


# price_k deliberately unrounded: both engines compute the same IEEE
# division, while round(x, 2) can disagree on exact .005 halfway cases.
LATERAL = """
SELECT o_orderkey, l.price_band, l.price_k
FROM orders,
LATERAL (
  SELECT CASE WHEN o_totalprice >= 300000 THEN 'high' ELSE 'low' END AS price_band,
         o_totalprice / 1000 AS price_k
) l
"""


@register("join_lateral", oracle=LATERAL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery in FROM (Spark 3.2+ / DuckDB both
    support the standard syntax)."""
    return _sql(spark, sf_dir, LATERAL, "orders")


INTERSECT_ALL = """
SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_intersect_all", oracle=INTERSECT_ALL)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, INTERSECT_ALL, "orders")


EXCEPT_ALL = """
SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_except_all", oracle=EXCEPT_ALL)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, EXCEPT_ALL, "orders")


@register(
    "expr_map_ops",
    oracle="""
SELECT p_partkey,
       map(['brand', 'type'], [p_brand, p_type])['brand'][1]       AS m_brand,
       array_to_string(list_sort(map_keys(map(['brand', 'type'], [p_brand, p_type]))), ',')
         AS m_keys,
       CAST(cardinality(map(['brand', 'type'], [p_brand, p_type])) AS INT) AS m_size
FROM part
""",
)
def expr_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT p_partkey,
       map('brand', p_brand, 'type', p_type)['brand']          AS m_brand,
       array_join(array_sort(map_keys(map('brand', p_brand, 'type', p_type))), ',')
         AS m_keys,
       size(map('brand', p_brand, 'type', p_type))             AS m_size
FROM part
""",
        "part",
    )


@register(
    "expr_date_format",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS ym,
       count(*) AS n
FROM orders GROUP BY 1
""",
)
def expr_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT date_format(o_orderdate, 'yyyy-MM') AS ym,
       count(*) AS n
FROM orders GROUP BY 1
""",
        "orders",
    )
