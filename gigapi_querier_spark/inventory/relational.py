"""Relational operator coverage (SURVEY.md §2.B — the surface the reference
reaches by SQL passthrough to its embedded engine, querier/queryClient.go:855
and :778-788; here expressed against Spark SQL / Catalyst).

Every query is written declaratively so Catalyst gets full freedom: filters
and projections push into the parquet scan, small dimensions broadcast, and
aggregations run partial (map-side) before the shuffle. Scale notes are on
individual queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.sources import load_tables


def _sql(spark: SparkSession, sf_dir: str, query: str, *tables: str) -> DataFrame:
    load_tables(spark, sf_dir, tables or None)
    return spark.sql(query)


# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1-shaped pricing summary (flagship).
# Scale: single shuffle on a 6-value grouping key; partial aggregation
# collapses ~all rows map-side, so the shuffle is a few KB regardless of
# input size. Filter pushes down to the parquet scan.
# --------------------------------------------------------------------------
Q1_SPARK = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_SPARK)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q1_SPARK, "lineitem")


# --------------------------------------------------------------------------
# Join + agg + top-k: TPC-H Q3-shaped shipping priority.
# Scale: join strategies are size-decided (no hints) — orders⋈lineitem
# shuffles on orderkey once both outgrow the broadcast threshold; ORDER BY
# + LIMIT plans as TakeOrderedAndProject (no global sort).
# --------------------------------------------------------------------------
Q3_BODY = """
WITH co AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
)
SELECT /*+ BROADCAST(co) */
       o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM co
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_BODY)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Like Q5: the statically-unknowable side — the (customer⋈orders)
    # join output, a segment+date-filtered key list far smaller than
    # lineitem — is named as a CTE and hinted broadcast (a join over an
    # intermediate has no stats, so a static plan falls back to
    # exchanging+sorting lineitem for a sort-merge join). DuckDB parses
    # the hint as a comment; AQE would reach the same plan at runtime
    # from observed sizes.
    return _sql(spark, sf_dir, Q3_BODY, "customer", "orders", "lineitem")


# --------------------------------------------------------------------------
# 6-way star join: TPC-H Q5-shaped local-supplier revenue.
# Scale: fixed-size dims (region, nation) broadcast at any SF; the growing
# relations shuffle on their keys once past the threshold, AQE re-planning
# from runtime sizes. Final 5-group aggregation is one tiny exchange.
# --------------------------------------------------------------------------
Q5_BODY = """
WITH co AS (
  SELECT n_nationkey, n_name, o_orderkey
  FROM region
  JOIN nation   ON n_regionkey = r_regionkey
  JOIN customer ON c_nationkey = n_nationkey
  JOIN orders   ON o_custkey = c_custkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
)
SELECT /*+ BROADCAST(co) */
       n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM co
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = n_nationkey
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=Q5_BODY)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # region/nation/supplier broadcast from size estimates; the one
    # statically-unknowable side — the (region⋈nation⋈customer⋈orders)
    # join OUTPUT, a date-filtered key list ~1% of lineitem — is named
    # as a CTE and hinted broadcast, declaring what AQE would discover
    # at runtime (joins over an intermediate have no stats, so without
    # the hint a static plan exchanges+sorts the 100%-side lineitem for
    # a sort-merge join). DuckDB parses /*+ ... */ as a plain comment,
    # so ONE text serves both engines; at scale the broadcast degrades
    # gracefully — if co outgrows the executor budget, drop the hint
    # and AQE re-plans from runtime sizes.
    return _sql(
        spark,
        sf_dir,
        Q5_BODY,
        "region",
        "nation",
        "customer",
        "orders",
        "lineitem",
        "supplier",
    )


# --------------------------------------------------------------------------
# Outer joins
# --------------------------------------------------------------------------
LEFT_AGG = """
SELECT c_custkey,
       count(o_orderkey)                        AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


@register("join_left_outer_agg", oracle=LEFT_AGG)
def join_left_outer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, LEFT_AGG, "customer", "orders")


FULL_OUTER = """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS suppliers FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk)             AS nationkey,
       CAST(coalesce(customers, 0) AS BIGINT) AS customers,
       CAST(coalesce(suppliers, 0) AS BIGINT) AS suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


@register("join_full_outer", oracle=FULL_OUTER)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, FULL_OUTER, "customer", "supplier")


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI JOIN — Spark-native join type; oracle spells it EXISTS."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    orders_f = t["orders"].where("o_orderstatus = 'F'")
    return (
        t["customer"]
        .join(orders_f, t["customer"].c_custkey == orders_f.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI JOIN — customers with no pending ('P') order."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    orders_p = t["orders"].where("o_orderstatus = 'P'")
    return (
        t["customer"]
        .join(orders_p, t["customer"].c_custkey == orders_p.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


CROSS = "SELECT r_name, n_name FROM region CROSS JOIN nation"


@register("join_cross", oracle=CROSS)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, CROSS, "region", "nation")


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
WINDOW_RANK = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
  FROM orders
) t
WHERE rnk <= 3
"""


@register("window_rank_topn", oracle=WINDOW_RANK)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Scale: one shuffle on o_custkey; the
    rank filter cuts the output to 3×customers before anything else runs."""
    return _sql(spark, sf_dir, WINDOW_RANK, "orders")


WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total
FROM orders
"""


@register("window_running_sum", oracle=WINDOW_RUNNING)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, WINDOW_RUNNING, "orders")


WINDOW_LAG_LEAD = """
SELECT event_id, user_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register("window_lag_lead", oracle=WINDOW_LAG_LEAD)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, WINDOW_LAG_LEAD, "events")


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------
ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("agg_rollup", oracle=ROLLUP)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ROLLUP, "lineitem")


CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("agg_cube", oracle=CUBE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, CUBE, "orders")


GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT)  AS g_rf,
       CAST(grouping(l_linestatus) AS INT)  AS g_ls,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("agg_grouping_sets", oracle=GROUPING_SETS)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, GROUPING_SETS, "lineitem")


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
SET_UNION = """
SELECT c_nationkey AS nk FROM customer
UNION
SELECT s_nationkey AS nk FROM supplier
"""


@register("set_union", oracle=SET_UNION)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SET_UNION, "customer", "supplier")


SET_INTERSECT = """
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
"""


@register("set_intersect", oracle=SET_INTERSECT)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SET_INTERSECT, "customer", "supplier")


SET_EXCEPT = """
SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'P'
EXCEPT
SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
"""


@register("set_except", oracle=SET_EXCEPT)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SET_EXCEPT, "orders")


# --------------------------------------------------------------------------
# Subqueries / CTEs (Catalyst decorrelates these natively)
# --------------------------------------------------------------------------
SUBQ_SCALAR = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
"""


@register("subquery_scalar", oracle=SUBQ_SCALAR)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SUBQ_SCALAR, "orders")


SUBQ_IN = """
SELECT count(*) AS n_building_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


@register("subquery_in", oracle=SUBQ_IN)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SUBQ_IN, "orders", "customer")


SUBQ_EXISTS = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
"""


@register("subquery_exists_correlated", oracle=SUBQ_EXISTS)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SUBQ_EXISTS, "customer", "orders")


CTE_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("cte_top_supplier", oracle=CTE_TOP_SUPPLIER)
def cte_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, CTE_TOP_SUPPLIER, "supplier", "lineitem")


# --------------------------------------------------------------------------
# Aggregate variants
# --------------------------------------------------------------------------
DISTINCT_AGG = """
SELECT count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
"""


@register("agg_count_distinct", oracle=DISTINCT_AGG)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, DISTINCT_AGG, "lineitem")


AGG_FILTER = """
SELECT l_linestatus,
       count(*) FILTER (WHERE l_returnflag = 'R')  AS n_returned,
       count(*) FILTER (WHERE l_discount > 0.05)   AS n_discounted,
       count(*)                                    AS n
FROM lineitem GROUP BY l_linestatus
"""


@register("agg_filter_clause", oracle=AGG_FILTER)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, AGG_FILTER, "lineitem")


AGG_STATS = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(var_samp(l_quantity), 4)         AS var_qty,
       round(median(l_extendedprice), 4)      AS med_price,
       round(min(l_extendedprice), 2)         AS min_price,
       round(max(l_extendedprice), 2)         AS max_price
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_stats", oracle=AGG_STATS)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, AGG_STATS, "lineitem")


@register(
    "agg_minmax_by",
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice) AS top_order,
       arg_min(o_orderkey, o_totalprice) AS bottom_order,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (DuckDB spells them arg_max/arg_min)."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT o_orderstatus,
       max_by(o_orderkey, o_totalprice) AS top_order,
       min_by(o_orderkey, o_totalprice) AS bottom_order,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
""",
        "orders",
    )


HAVING = """
SELECT o_custkey, count(*) AS n
FROM orders GROUP BY o_custkey HAVING count(*) >= 15
"""


@register("agg_having", oracle=HAVING)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, HAVING, "orders")


@register(
    "pivot_status_counts",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — Spark-native groupBy().pivot(); oracle spells it FILTER aggs."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


# --------------------------------------------------------------------------
# Sort / limit (top-k)
# --------------------------------------------------------------------------
TOPK = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


@register("order_limit_topk", oracle=TOPK)
def order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, TOPK, "orders")


# --------------------------------------------------------------------------
# Expressions: CASE / casts / strings / math / datetime
# --------------------------------------------------------------------------
CASE_EXPR = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END            AS price_band,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor
FROM orders
"""


@register("expr_case_cast", oracle=CASE_EXPR)
def expr_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, CASE_EXPR, "orders")


@register(
    "expr_string_funcs",
    oracle="""
SELECT p_partkey,
       lower(p_name)                         AS lname,
       upper(p_brand)                        AS ubrand,
       substr(p_type, 1, 4)                  AS type_prefix,
       CAST(length(p_name) AS INT)           AS name_len,
       replace(p_name, ' ', '_')             AS name_us,
       concat(p_brand, ':', p_type)          AS brand_type,
       trim(concat(' ', p_name, ' '))        AS trimmed,
       regexp_extract(p_name, '^(\\S+)', 1)  AS first_word,
       string_split(p_name, ' ')[1]          AS first_word2
FROM part
""",
)
def expr_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        r"""
SELECT p_partkey,
       lower(p_name)                         AS lname,
       upper(p_brand)                        AS ubrand,
       substr(p_type, 1, 4)                  AS type_prefix,
       length(p_name)                        AS name_len,
       replace(p_name, ' ', '_')             AS name_us,
       concat(p_brand, ':', p_type)          AS brand_type,
       trim(concat(' ', p_name, ' '))        AS trimmed,
       regexp_extract(p_name, '^(\\S+)', 1)  AS first_word,
       split(p_name, ' ')[0]                 AS first_word2
FROM part
""",
        "part",
    )


@register(
    "expr_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 4)            AS d_abs,
       CAST(ceil(l_quantity) AS BIGINT)            AS q_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
       round(ln(l_extendedprice), 6)               AS ln_price,
       round(sqrt(l_quantity), 6)                  AS sqrt_qty,
       round(pow(1 + l_discount, 2), 8)            AS pow_disc
FROM lineitem
""",
)
def expr_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 4)            AS d_abs,
       CAST(ceil(l_quantity) AS BIGINT)            AS q_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
       round(ln(l_extendedprice), 6)               AS ln_price,
       round(sqrt(l_quantity), 6)                  AS sqrt_qty,
       round(pow(1 + l_discount, 2), 8)            AS pow_disc
FROM lineitem
""",
        "lineitem",
    )


@register(
    "expr_datetime_funcs",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT)                  AS yr,
       CAST(month(o_orderdate) AS INT)                 AS mo,
       CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
       count(*)                                        AS n,
       round(sum(o_totalprice), 2)                     AS total
FROM orders GROUP BY 1, 2, 3
""",
)
def expr_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
SELECT year(o_orderdate)                               AS yr,
       month(o_orderdate)                              AS mo,
       CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
       count(*)                                        AS n,
       round(sum(o_totalprice), 2)                     AS total
FROM orders GROUP BY 1, 2, 3
""",
        "orders",
    )


# --------------------------------------------------------------------------
# Lateral/exploded arrays (unnest)
# --------------------------------------------------------------------------
@register(
    "explode_words",
    oracle="""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
GROUP BY word
""",
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST/explode. Scale: explode multiplies rows ~50×; the groupBy
    shuffles only (word, partial_count) pairs thanks to map-side combine."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT word, count(*) AS n
FROM (SELECT explode(split(text, ' ')) AS word FROM documents) t
GROUP BY word
""",
        "documents",
    )
