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


# --------------------------------------------------------------------------
# Skew-handling operators (operators/skew.py) with exact-parity oracles:
# salting must be RESULT-INVISIBLE — the oracle is the plain formulation.
# Aggregates chosen exact under reordering (integer-valued sums, max,
# count) so salted partial-merge order can't perturb the hash.
# --------------------------------------------------------------------------
@register(
    "skew_salted_agg",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for hot GROUP BY keys (a single key
    can't split even under AQE skew handling): stage 1 fans each key
    over 16 salt buckets, stage 2 merges 16 partials per key. Result is
    identical to the plain aggregation — the oracle IS the plain SQL."""
    from pyspark.sql import functions as F

    from gigapi_querier_spark.operators.skew import salted_agg

    t = load_tables(spark, sf_dir, ("lineitem",))
    return salted_agg(
        t["lineitem"],
        keys=["l_returnflag"],
        salt_src="l_orderkey",
        aggs={
            "n": (F.count("*"), F.sum),
            "sum_qty": (F.sum("l_quantity"), F.sum),
            "max_price": (F.max("l_extendedprice"), F.max),
        },
        n_salts=16,
    )


@register(
    "skew_replicated_join",
    oracle="""
SELECT p_brand,
       count(*) AS n,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def skew_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated (salted-broadcast) join for skewed fact keys against a
    dimension too big to broadcast: the dimension explodes 8x (one row
    per salt), the fact side salts deterministically, and each hot key's
    rows spread over 8 co-partitioned buckets. Exact join parity — the
    oracle is the plain join."""
    from pyspark.sql import functions as F

    from gigapi_querier_spark.operators.skew import replicate_join_skewed

    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    fact = t["lineitem"].select(
        F.col("l_partkey").alias("partkey"), "l_quantity", "l_orderkey"
    )
    dim = t["part"].select(F.col("p_partkey").alias("partkey"), "p_brand")
    joined = replicate_join_skewed(
        fact, dim, on="partkey", salt_src="l_orderkey", n_salts=8
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").alias("sum_qty"),
    )
