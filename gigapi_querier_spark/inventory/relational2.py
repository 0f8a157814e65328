"""Relational coverage, batch 2: recursive CTEs, UNPIVOT, string/array/
struct/null/interval expressions, advanced windows, gap-filling, sampling,
approximate aggregates (SURVEY.md §2.B long tail)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.sources import load_tables


def _sql(spark: SparkSession, sf_dir: str, query: str, *tables: str) -> DataFrame:
    load_tables(spark, sf_dir, tables or None)
    return spark.sql(query)


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 native; reference reachable via fallback)
# --------------------------------------------------------------------------
RECURSIVE_MONTHS = """
WITH RECURSIVE m(mo) AS (
  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12
)
SELECT mo, count(o_orderkey) AS n_orders
FROM m LEFT JOIN orders ON month(o_orderdate) = mo
GROUP BY mo
"""


@register("recursive_cte_months", oracle=RECURSIVE_MONTHS)
def recursive_cte_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, RECURSIVE_MONTHS, "orders")


# --------------------------------------------------------------------------
# UNPIVOT
# --------------------------------------------------------------------------
UNPIVOT = """
SELECT metric, round(sum(val), 2) AS total
FROM (
  SELECT * FROM lineitem
  UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
) t
GROUP BY metric
"""


@register("unpivot_metrics", oracle=UNPIVOT)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, UNPIVOT, "lineitem")


# --------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg)
# --------------------------------------------------------------------------
@register(
    "agg_string_concat",
    oracle="""
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
                "prios"
            ),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Advanced windows: ntile / percent_rank / cume_dist; first/last/nth value
# --------------------------------------------------------------------------
NTILE = """
SELECT o_orderkey,
       CAST(ntile(4) OVER w AS INT)        AS quartile,
       round(percent_rank() OVER w, 6)     AS pct_rank,
       round(cume_dist() OVER w, 6)        AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


@register("window_ntile_pctrank", oracle=NTILE)
def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, NTILE, "orders")


FIRST_LAST = """
SELECT o_custkey, o_orderkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice)  OVER w, 2) AS last_price,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("window_first_last_nth", oracle=FIRST_LAST)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, FIRST_LAST, "orders")


# --------------------------------------------------------------------------
# Time-series: value-range window (moving average over trailing 10 min)
# — both engines frame over µs so DuckDB's ns→µs truncation aligns.
# --------------------------------------------------------------------------
# The moving average is emitted as round(sum,2)/count over the frame, not
# round(avg,4): 2-decimal values averaged over power-of-two frame sizes
# land exactly on rounding halves where the engines' round() disagree;
# the rounded frame-sum is cross-engine identical and its quotient is the
# same IEEE double bit-for-bit.
@register(
    "ts_moving_avg_10m",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER w, 2) / count(*) OVER w AS mov_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
""",
)
def ts_moving_avg_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
SELECT event_id, user_id,
       round(sum(value) OVER w, 2) / count(*) OVER w AS mov_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY (ts DIV 1000)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""
    )


# --------------------------------------------------------------------------
# Gap-filling: dense hourly grid per event type, zero-filled counts —
# sequence/generate_series + cross join + left join + coalesce.
# --------------------------------------------------------------------------
@register(
    "ts_gapfill_hourly",
    oracle="""
WITH b AS (
  SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_s,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT min(epoch_ns(ts) // 3600000000000) AS lo,
         max(epoch_ns(ts) // 3600000000000) AS hi
  FROM events
),
grid AS (
  SELECT et.event_type, unnest(generate_series(r.lo, r.hi)) * 3600 AS bucket_s
  FROM (SELECT DISTINCT event_type FROM events) et, r
)
SELECT g.event_type, g.bucket_s, CAST(coalesce(b.n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bucket_s = g.bucket_s
""",
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
WITH b AS (
  SELECT event_type, (ts DIV 3600000000000) * 3600 AS bucket_s, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT min(ts DIV 3600000000000) AS lo, max(ts DIV 3600000000000) AS hi
  FROM events
),
grid AS (
  SELECT et.event_type, h.h * 3600 AS bucket_s
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT explode(sequence(lo, hi)) AS h FROM r) h
)
SELECT g.event_type, g.bucket_s, coalesce(b.n, 0) AS n
FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bucket_s = g.bucket_s
"""
    )


# --------------------------------------------------------------------------
# Struct / array expression surface
# --------------------------------------------------------------------------
@register(
    "expr_struct_ops",
    oracle="""
SELECT o_orderkey,
       round(struct_pack(price := o_totalprice, status := o_orderstatus).price, 2)
         AS s_price,
       struct_pack(price := o_totalprice, status := o_orderstatus).status
         AS s_status
FROM orders
""",
)
def expr_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT o_orderkey,
       round(named_struct('price', o_totalprice, 'status', o_orderstatus).price, 2)
         AS s_price,
       named_struct('price', o_totalprice, 'status', o_orderstatus).status
         AS s_status
FROM orders
""",
        "orders",
    )


@register(
    "expr_array_ops",
    oracle="""
SELECT p_partkey,
       array_to_string(list_sort(string_split(p_name, ' ')), ',')  AS sorted_words,
       list_contains(string_split(p_name, ' '), 'red')             AS has_red,
       CAST(len(string_split(p_name, ' ')) AS INT)                 AS n_words,
       array_to_string(list_transform(string_split(p_name, ' '), w -> upper(w)), ',')
         AS upper_words
FROM part
""",
)
def expr_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT p_partkey,
       array_join(sort_array(split(p_name, ' ')), ',')     AS sorted_words,
       array_contains(split(p_name, ' '), 'red')           AS has_red,
       size(split(p_name, ' '))                            AS n_words,
       array_join(transform(split(p_name, ' '), w -> upper(w)), ',') AS upper_words
FROM part
""",
        "part",
    )


@register(
    "expr_null_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(coalesce(nullif(l_discount, 0.0), -1), 2) AS disc_or_sentinel,
       CAST(l_discount = 0.0 AS BOOLEAN)               AS zero_disc,
       ifnull(nullif(l_returnflag, 'N'), 'none')       AS flag_or_none
FROM lineitem
""",
)
def expr_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_orderkey, l_linenumber,
       round(coalesce(nullif(l_discount, 0.0), -1), 2) AS disc_or_sentinel,
       CAST(l_discount = 0.0 AS BOOLEAN)               AS zero_disc,
       ifnull(nullif(l_returnflag, 'N'), 'none')       AS flag_or_none
FROM lineitem
""",
        "lineitem",
    )


@register(
    "expr_interval_arith",
    oracle="""
SELECT count(*) AS n_shipped_within_30d
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
""",
)
def expr_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT count(*) AS n_shipped_within_30d
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
""",
        "orders",
        "lineitem",
    )


# --------------------------------------------------------------------------
# Sampling and sketches (SURVEY.md §2.B "Sampling"/"Approximate") — both
# fully oracle-checked (VERDICT r2 next#5): sampling is md5-bucketed (no
# engine RNG → bit-identical in any engine), and the HLL sketch is checked
# as a BOUND against the exact distinct count computed on each engine, so
# the hash compares deterministic booleans + exact counts, not estimates.
# --------------------------------------------------------------------------
@register(
    "sample_fraction",
    oracle="""
SELECT count(*) AS n_sampled,
       round(sum(o_totalprice), 2) AS sampled_price
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7)) AS BIGINT)
      % 100 < 10
""",
)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% sample via md5-bucketing (operators/pipeline.py
    hash_bucket) — content-stable across runs, engines, and cluster
    sizes; a zero-shuffle filter at any scale."""
    from gigapi_querier_spark.operators.pipeline import hash_bucket

    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .where(hash_bucket(F.col("o_orderkey")) < 10)
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_price"),
        )
    )


@register(
    "approx_distinct_sketch",
    oracle="""
SELECT CAST(abs(approx_count_distinct(l_partkey)
               - count(DISTINCT l_partkey)) <= 0.10 * count(DISTINCT l_partkey)
            AS BOOLEAN) AS parts_within_10pct,
       CAST(abs(approx_count_distinct(l_orderkey)
               - count(DISTINCT l_orderkey)) <= 0.10 * count(DISTINCT l_orderkey)
            AS BOOLEAN) AS orders_within_10pct,
       count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders
FROM lineitem
""",
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch with an assertable oracle: each engine's estimate must
    sit within 10% of the exact distinct count it computes itself (Spark
    default rsd is 5%), so both sides hash identical booleans + exact
    counts while the sketch path is still exercised."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    return li.agg(
        (
            F.abs(
                F.approx_count_distinct("l_partkey")
                - F.countDistinct("l_partkey")
            )
            <= 0.10 * F.countDistinct("l_partkey")
        )
        .cast("boolean")
        .alias("parts_within_10pct"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey")
                - F.countDistinct("l_orderkey")
            )
            <= 0.10 * F.countDistinct("l_orderkey")
        )
        .cast("boolean")
        .alias("orders_within_10pct"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
