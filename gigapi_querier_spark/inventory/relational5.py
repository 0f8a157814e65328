"""Relational coverage, batch 5: modern SQL sugar (GROUP BY ALL,
SELECT * EXCEPT/EXCLUDE) and exact percentile variants."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.sources import load_tables


def _sql(spark: SparkSession, sf_dir: str, query: str, *tables: str) -> DataFrame:
    load_tables(spark, sf_dir, tables or None)
    return spark.sql(query)


GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ALL
"""


@register("agg_group_by_all", oracle=GROUP_BY_ALL)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, GROUP_BY_ALL, "orders")


@register(
    "select_star_except",
    oracle="SELECT * EXCLUDE (n_name) FROM nation",
)
def select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark spells it EXCEPT, DuckDB spells it EXCLUDE — same projection."""
    return _sql(spark, sf_dir, "SELECT * EXCEPT (n_name) FROM nation", "nation")


@register(
    "agg_percentile_within_group",
    oracle="""
SELECT l_returnflag,
       round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50_disc,
       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25_cont,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p99_cont
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_returnflag,
       round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50_disc,
       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25_cont,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p99_cont
FROM lineitem GROUP BY l_returnflag
""",
        "lineitem",
    )
