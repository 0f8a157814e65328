"""Relational coverage, batch 4: extended string functions, bitwise ops,
correlation/regression aggregates, numeric histogram binning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.sources import load_tables


def _sql(spark: SparkSession, sf_dir: str, query: str, *tables: str) -> DataFrame:
    load_tables(spark, sf_dir, tables or None)
    return spark.sql(query)


STRING2 = """
SELECT p_partkey,
       translate(p_name, 'aeiou', '_____')  AS consonant_mask,
       lpad(CAST(p_size AS STRING), 4, '0') AS padded_size,
       rpad(p_brand, 12, '.')               AS padded_brand,
       repeat('-', p_size % 5)              AS dashes,
       reverse(p_name)                      AS reversed,
       left(p_name, 3)                      AS prefix3,
       right(p_name, 3)                     AS suffix3
FROM part
"""

STRING2_ORACLE = """
SELECT p_partkey,
       translate(p_name, 'aeiou', '_____')   AS consonant_mask,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
       rpad(p_brand, 12, '.')                AS padded_brand,
       repeat('-', p_size % 5)               AS dashes,
       reverse(p_name)                       AS reversed,
       left(p_name, 3)                       AS prefix3,
       right(p_name, 3)                      AS suffix3
FROM part
"""


@register("expr_string_funcs2", oracle=STRING2_ORACLE)
def expr_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, STRING2, "part")


@register(
    "expr_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_linenumber & 3                    AS b_and,
       l_linenumber | 8                    AS b_or,
       xor(l_linenumber, 5)                AS b_xor,
       l_linenumber << 2                   AS b_shl,
       CAST(l_partkey AS BIGINT) >> 3      AS b_shr
FROM lineitem
""",
)
def expr_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_orderkey, l_linenumber,
       l_linenumber & 3               AS b_and,
       l_linenumber | 8               AS b_or,
       l_linenumber ^ 5               AS b_xor,
       shiftleft(l_linenumber, 2)     AS b_shl,
       shiftright(l_partkey, 3)       AS b_shr
FROM lineitem
""",
        "lineitem",
    )


@register(
    "agg_corr_regr",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6)          AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4)    AS qty_price_covar,
       round(regr_slope(l_extendedprice, l_quantity), 4)    AS price_per_qty,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_base
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6)          AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4)    AS qty_price_covar,
       round(regr_slope(l_extendedprice, l_quantity), 4)    AS price_per_qty,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS price_base
FROM lineitem GROUP BY l_returnflag
""",
        "lineitem",
    )


# Spark's skewness/kurtosis are population moments (g1, excess g2);
# DuckDB's are sample-adjusted (G1, excess G2). The Spark side applies the
# standard finite-sample adjustment so both emit G1/G2:
#   G1 = g1 * sqrt(n(n-1)) / (n-2)
#   G2 = ((n+1) g2 + 6) (n-1) / ((n-2)(n-3))
@register(
    "agg_stats2_moments",
    oracle="""
SELECT l_returnflag,
       mode(l_linenumber)                    AS common_line,
       round(skewness(l_extendedprice), 4)   AS skew_g1,
       round(kurtosis(l_extendedprice), 4)   AS kurt_g2
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_stats2_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_returnflag,
       mode(l_linenumber) AS common_line,
       round(skewness(l_extendedprice)
             * sqrt(count(*) * (count(*) - 1)) / (count(*) - 2), 4) AS skew_g1,
       round(((count(*) + 1) * kurtosis(l_extendedprice) + 6)
             * (count(*) - 1) / ((count(*) - 2) * (count(*) - 3)), 4) AS kurt_g2
FROM lineitem GROUP BY l_returnflag
""",
        "lineitem",
    )


HISTOGRAM = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
       count(*) AS n,
       round(min(o_totalprice), 2) AS bin_min,
       round(max(o_totalprice), 2) AS bin_max
FROM orders GROUP BY 1
"""


@register("agg_histogram_bins", oracle=HISTOGRAM)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, HISTOGRAM, "orders")


@register(
    "agg_bool_bit",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 0)       AS all_positive,
       bool_or(l_discount > 0.09)     AS any_big_discount,
       bit_and(l_linenumber)          AS lines_bit_and,
       CAST(bit_or(l_linenumber) AS INT) AS lines_bit_or
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_returnflag,
       bool_and(l_quantity > 0)       AS all_positive,
       bool_or(l_discount > 0.09)     AS any_big_discount,
       bit_and(l_linenumber)          AS lines_bit_and,
       bit_or(l_linenumber)           AS lines_bit_or
FROM lineitem GROUP BY l_returnflag
""",
        "lineitem",
    )


@register(
    "expr_try_cast",
    oracle="""
SELECT p_partkey,
       TRY_CAST(p_brand AS INT)                        AS brand_as_int,
       TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
       TRY_CAST(p_size AS VARCHAR)                     AS size_str
FROM part
""",
)
def expr_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT p_partkey,
       TRY_CAST(p_brand AS INT)                        AS brand_as_int,
       TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
       TRY_CAST(p_size AS STRING)                      AS size_str
FROM part
""",
        "part",
    )


@register(
    "expr_greatest_least",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(greatest(l_discount, l_tax), 2) AS max_rate,
       round(least(l_discount, l_tax), 2)    AS min_rate,
       greatest(l_linenumber, 3)             AS gl_int
FROM lineitem
""",
)
def expr_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_orderkey, l_linenumber,
       round(greatest(l_discount, l_tax), 2) AS max_rate,
       round(least(l_discount, l_tax), 2)    AS min_rate,
       greatest(l_linenumber, 3)             AS gl_int
FROM lineitem
""",
        "lineitem",
    )
