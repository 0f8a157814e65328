"""Golden tests ported from the reference's unit suite
(querier/queryClient_test.go:8-160) plus dialect-shim checks."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from gigapi_querier_spark.plans import (
    extract_time_range,
    parse_query,
    to_spark_sql,
)
from gigapi_querier_spark.plans.sqlpass import (
    ParseError,
    rewrite_time_literals,
    strip_db_qualifier,
)

NS = 1_000_000_000


def _ns(y, mo, d, h=0, m=0, s=0):
    return int(datetime(y, mo, d, h, m, s, tzinfo=timezone.utc).timestamp()) * NS


JAN1 = _ns(2023, 1, 1)
JAN2 = _ns(2023, 1, 2)


@pytest.mark.parametrize(
    "where",
    [
        # the reference's six golden forms (queryClient_test.go:15-51)
        "time >= '2023-01-01T00:00:00Z' AND time <= '2023-01-02T00:00:00Z'",
        "time >= cast('2023-01-01T00:00:00Z' as timestamp) AND time <= cast('2023-01-02T00:00:00Z' as timestamp)",
        "time >= epoch_ns('2023-01-01T00:00:00'::TIMESTAMP) AND time <= epoch_ns('2023-01-02T00:00:00'::TIMESTAMP)",
        "time >= epoch_ns(cast('2023-01-01T00:00:00' as timestamp)::TIMESTAMP) AND time <= epoch_ns(cast('2023-01-02T00:00:00' as timestamp)::TIMESTAMP)",
        "time BETWEEN '2023-01-01T00:00:00Z' AND '2023-01-02T00:00:00Z'",
    ],
)
def test_extract_range_two_sided(where):
    tr = extract_time_range(where)
    assert (tr.start, tr.end) == (JAN1, JAN2)


def test_extract_equality_pins_both_bounds():
    tr = extract_time_range("time = '2023-01-01T00:00:00Z'")
    assert (tr.start, tr.end) == (JAN1, JAN1)


def test_extract_one_sided():  # divergence: reference wouldn't prune these
    tr = extract_time_range("time > '2023-01-01T00:00:00Z'")
    assert tr.start == JAN1 and tr.end is None
    tr = extract_time_range("time < '2023-01-02T00:00:00Z'")
    assert tr.start is None and tr.end == JAN2


def test_extract_nano_precision():
    tr = extract_time_range("time >= '2023-01-01T00:00:00.123456789Z'")
    assert tr.start == JAN1 + 123456789


def test_extract_nothing():
    assert extract_time_range("temperature > 20").is_empty
    assert extract_time_range("").is_empty


def test_parse_query_reference_case():
    q = parse_query(
        "SELECT COUNT(*) AS value FROM hep.hep_1 WHERE time >= '2023-01-01T00:00:00Z'"
        " AND time <= '2023-01-02T00:00:00Z'",
        "ignored",
    )
    assert q.columns == "COUNT(*) AS value"
    assert q.db_name == "hep"
    assert q.measurement == "hep_1"
    assert (q.time_range.start, q.time_range.end) == (JAN1, JAN2)
    assert "epoch_ns" in q.time_range.time_condition
    assert q.where_conditions.startswith("time >= ")


def test_parse_query_clauses():
    q = parse_query(
        "SELECT location, avg(temperature) FROM weather WHERE time >= '2023-01-01T00:00:00Z'"
        " GROUP BY location HAVING avg(temperature) > 5 ORDER BY location LIMIT 10",
        "mydb",
    )
    assert q.db_name == "mydb"
    assert q.measurement == "weather"
    assert q.group_by == "location"
    assert q.having == "avg(temperature) > 5"
    assert q.order_by == "location"
    assert q.limit == 10
    assert "GROUP BY" not in q.where_conditions


def test_parse_query_no_from_raises():
    with pytest.raises(ParseError):
        parse_query("SELECT 1", "mydb")


def test_dialect_shim():
    assert to_spark_sql("SELECT '2023-01-01T00:00:00'::TIMESTAMP") == (
        "SELECT TIMESTAMP '2023-01-01T00:00:00'"
    )
    assert to_spark_sql("SELECT x::INT FROM t") == "SELECT CAST(x AS INT) FROM t"


def test_strip_db_qualifier():
    assert (
        strip_db_qualifier("SELECT * FROM mydb.weather WHERE x=1", "mydb", "weather")
        == "SELECT * FROM weather WHERE x=1"
    )
    # no accidental replacement inside words
    assert (
        strip_db_qualifier("SELECT * FROM xmydb.weathery", "mydb", "weather")
        == "SELECT * FROM xmydb.weathery"
    )


def test_rewrite_qualify():
    from gigapi_querier_spark.plans.sqlpass import rewrite_qualify

    sql = (
        "SELECT o_custkey, o_totalprice FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) = 1"
    )
    out = rewrite_qualify(sql)
    assert "QUALIFY" not in out.upper().replace("__QUALIFY__", "")
    assert "__qualify__" in out
    # no QUALIFY → untouched
    assert rewrite_qualify("SELECT 1") == "SELECT 1"


def test_rewrite_qualify_in_subquery_and_cte(spark):
    from gigapi_querier_spark.plans.sqlpass import rewrite_qualify_all

    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (2, 5)], "g int, v int"
    ).createOrReplaceTempView("qt")
    # QUALIFY inside a FROM-subquery: keep each group's max row
    out = spark.sql(
        rewrite_qualify_all(
            "SELECT sum(v) AS s FROM (SELECT g, v FROM qt"
            " QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC) = 1) t"
        )
    ).first()
    assert out["s"] == 50  # 20 + 30
    # the subquery's schema must not grow: explicit SELECT * above it
    cols = spark.sql(
        rewrite_qualify_all(
            "SELECT * FROM (SELECT g, v FROM qt"
            " QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC) = 1) t"
        )
    ).columns
    assert cols == ["g", "v"]
    # QUALIFY inside a CTE body
    rows = spark.sql(
        rewrite_qualify_all(
            "WITH best AS (SELECT g, v FROM qt"
            " QUALIFY rank() OVER (PARTITION BY g ORDER BY v DESC) = 1)"
            " SELECT g, v FROM best ORDER BY g"
        )
    ).collect()
    assert [(r["g"], r["v"]) for r in rows] == [(1, 20), (2, 30)]
    # no QUALIFY anywhere → text unchanged (modulo normalize)
    assert rewrite_qualify_all("SELECT 1") == "SELECT 1"


def test_rewrite_qualify_preserves_tail():
    from gigapi_querier_spark.plans.sqlpass import rewrite_qualify

    out = rewrite_qualify(
        "SELECT x FROM t QUALIFY rank() OVER (ORDER BY x) <= 2 ORDER BY x LIMIT 5"
    )
    assert out.endswith("ORDER BY x LIMIT 5")


def test_time_ident_boundary_not_matched():
    # ADVICE r1 (high): columns merely ending in "time" must not be treated
    # as the engine's time column — neither for pruning nor literal folding.
    tr = extract_time_range("endtime >= '2026-01-01T00:00:00'")
    assert tr.is_empty
    tr = extract_time_range("event_time BETWEEN '2026-01-01T00:00:00' AND '2026-01-02T00:00:00'")
    assert tr.is_empty
    sql = "SELECT * FROM t WHERE endtime >= '2026-01-01T00:00:00'"
    assert rewrite_time_literals(sql) == sql
    # qualified columns stay untouched too (a rewrite would drop the qualifier)
    sql_q = "SELECT * FROM t WHERE events.time >= '2026-01-01T00:00:00'"
    assert rewrite_time_literals(sql_q) == sql_q
    assert extract_time_range("events.time >= '2026-01-01T00:00:00'").is_empty
    # the bare column still works
    tr = extract_time_range("time >= '2026-01-01T00:00:00'")
    assert tr.start is not None


def test_time_range_skipped_on_top_level_or():
    # ADVICE r1 (medium): a time bound that is not a top-level AND-conjunct
    # must not prune files.
    tr = extract_time_range("time >= '2026-01-01T00:00:00' OR type = 'a'")
    assert tr.is_empty
    tr = extract_time_range("NOT (time >= '2026-01-01T00:00:00')")
    assert tr.is_empty
    # OR nested inside parens is still a safe AND-conjunct overall
    tr = extract_time_range("time >= '2026-01-01T00:00:00' AND (a = 1 OR b = 2)")
    assert tr.start is not None
    # OR inside a string literal is not boolean structure
    tr = extract_time_range("time >= '2026-01-01T00:00:00' AND note = 'x OR y'")
    assert tr.start is not None
    # identifiers containing 'or'/'not' don't trigger the skip
    tr = extract_time_range("time >= '2026-01-01T00:00:00' AND priority = 1")
    assert tr.start is not None


def test_time_range_skipped_with_subquery():
    # a subquery's own time predicate must not prune the OUTER scan
    tr = extract_time_range(
        "EXISTS (SELECT 1 FROM s WHERE time >= '2026-01-01T00:00:00')"
    )
    assert tr.is_empty
    tr = extract_time_range(
        "time >= '2026-01-01T00:00:00' AND id IN (SELECT id FROM s)"
    )
    assert tr.is_empty  # conservative: any subquery disables extraction
    # '(SELECT' inside a string literal is not a subquery
    tr = extract_time_range(
        "time >= '2026-01-01T00:00:00' AND note = '(SELECT x)'"
    )
    assert tr.start is not None


def test_shim_star_exclude(spark):
    assert to_spark_sql("SELECT * EXCLUDE (a, b) FROM t") == (
        "SELECT * EXCEPT (a, b) FROM t"
    )
    # not inside string literals
    assert to_spark_sql("SELECT '* EXCLUDE (x)'") == "SELECT '* EXCLUDE (x)'"
    spark.createDataFrame([(1, 2, 3)], "a int, b int, c int").createOrReplaceTempView(
        "xt"
    )
    assert spark.sql(to_spark_sql("SELECT * EXCLUDE (b) FROM xt")).columns == [
        "a",
        "c",
    ]


def test_shim_lambda_keyword(spark):
    # DuckDB's python-style lambda form → arrow lambdas
    assert to_spark_sql("SELECT list_transform(xs, lambda x: x + 1)") == (
        "SELECT transform(xs, x -> x + 1)"
    )
    assert to_spark_sql("SELECT list_reduce(xs, lambda a, b: a + b)") == (
        "SELECT reduce(xs, (a, b) -> a + b)"
    )
    # not rewritten inside string literals
    assert to_spark_sql("SELECT 'lambda x: y'") == "SELECT 'lambda x: y'"
    row = spark.sql(
        to_spark_sql("SELECT transform(array(1, 2), lambda x: x * 10) AS xs")
    ).first()
    assert row["xs"] == [10, 20]


def test_time_range_kept_with_is_not_null():
    # ADVICE r2 (low): 'IS NOT' is one operator, not a negation scope —
    # it must not disable time-based pruning on a mainline query shape.
    tr = extract_time_range(
        "time >= '2026-01-01T00:00:00' AND sensor IS NOT NULL"
    )
    assert tr.start is not None
    tr = extract_time_range(
        "sensor IS NOT NULL AND time >= '2026-01-01T00:00:00'"
    )
    assert tr.start is not None
    tr = extract_time_range(
        "time >= '2026-01-01T00:00:00' AND a IS NOT DISTINCT FROM b"
    )
    assert tr.start is not None
    # a genuine negation scope still disables pruning
    assert extract_time_range(
        "NOT (time >= '2026-01-01T00:00:00')"
    ).is_empty
    assert extract_time_range(
        "NOT time >= '2026-01-01T00:00:00'"
    ).is_empty


def test_strip_db_qualifier_position_aware():
    # VERDICT r1 wrong#2: never rewrite inside string literals; only
    # FROM/JOIN position.
    sql = "SELECT * FROM mydb.weather WHERE note = 'see mydb.weather docs'"
    out = strip_db_qualifier(sql, "mydb", "weather")
    assert out == "SELECT * FROM weather WHERE note = 'see mydb.weather docs'"
    sql2 = "SELECT * FROM mydb.weather w JOIN mydb.weather x ON w.id = x.id"
    out2 = strip_db_qualifier(sql2, "mydb", "weather")
    assert out2 == "SELECT * FROM weather w JOIN weather x ON w.id = x.id"


# --- DuckDB-dialect shim breadth (VERDICT r1 missing#2) --------------------


def test_shim_json_arrows():
    assert to_spark_sql("SELECT props ->> 'k' FROM t") == (
        "SELECT get_json_object(props, '$.k') FROM t"
    )
    assert to_spark_sql("SELECT props -> 'a' ->> 'b' FROM t") == (
        "SELECT get_json_object(props, '$.a.b') FROM t"
    )
    assert to_spark_sql("SELECT j -> 'xs' -> 0 ->> 'id' FROM t") == (
        "SELECT get_json_object(j, '$.xs[0].id') FROM t"
    )
    # Spark/DuckDB lambda arrows with unquoted bodies are untouched
    sql = "SELECT transform(a, x -> x + 1) FROM t"
    assert to_spark_sql(sql) == sql


def test_shim_list_functions():
    assert to_spark_sql("SELECT list_contains(xs, 1)") == (
        "SELECT array_contains(xs, 1)"
    )
    assert to_spark_sql("SELECT list_sort(list_distinct(xs))") == (
        "SELECT sort_array(array_distinct(xs))"
    )
    out = to_spark_sql("SELECT list_sum(list_transform(xs, x -> x * 2))")
    assert out == (
        "SELECT aggregate(filter(transform(xs, x -> x * 2),"
        " _e -> _e IS NOT NULL), CAST(NULL AS DOUBLE),"
        " (_acc, _e) -> coalesce(_acc, CAST(0 AS DOUBLE)) + _e)"
    )
    # no rewrite inside string literals
    assert to_spark_sql("SELECT 'list_min(a)'") == "SELECT 'list_min(a)'"


def test_shim_str_split_literal_delimiter():
    # DuckDB splits on a literal; Spark's split takes a regex → escape,
    # with backslashes DOUBLED for the SQL string-literal layer (Spark
    # drops the backslash of unrecognized escapes — ADVICE r2)
    assert to_spark_sql("SELECT str_split(s, '.') FROM t") == (
        "SELECT split(s, '\\\\.') FROM t"
    )
    assert to_spark_sql("SELECT string_split(s, ' ') FROM t") == (
        "SELECT split(s, '\\\\ ') FROM t"
    )
    # quoted-literal first arguments get escaped too (ADVICE r2: the old
    # first-arg pattern skipped them entirely)
    assert to_spark_sql("SELECT str_split('a.b.c', '.') AS xs") == (
        "SELECT split('a.b.c', '\\\\.') AS xs"
    )
    # nested-call first argument
    assert to_spark_sql("SELECT str_split(concat(a, b), '.')") == (
        "SELECT split(concat(a, b), '\\\\.')"
    )


def test_shim_list_slice_and_position_semantics():
    # DuckDB list_slice has an INCLUSIVE end; Spark slice takes a length
    assert to_spark_sql("SELECT list_slice(xs, 2, 4)") == (
        "SELECT slice(xs, 2, (4) - (2) + 1)"
    )
    # DuckDB list_position returns NULL on a miss; Spark returns 0
    assert to_spark_sql("SELECT list_position(xs, 9)") == (
        "SELECT nullif(array_position(xs, 9), 0)"
    )
    assert to_spark_sql("SELECT list_indexof(xs, 9)") == (
        "SELECT nullif(array_position(xs, 9), 0)"
    )


def test_shim_lambda_arrows_not_json(spark):
    # ADVICE r2: lambda bodies that are bare ints / quoted strings must
    # not be rewritten into get_json_object
    sql = "SELECT transform(xs, x -> 0) FROM t"
    assert to_spark_sql(sql) == sql
    sql = "SELECT transform(xs, x -> 'a') FROM t"
    assert to_spark_sql(sql) == sql
    sql = "SELECT filter(xs, e -> 1) AS f FROM t"
    assert to_spark_sql(sql) == sql
    # real JSON chains still rewrite, including int steps in chains
    assert to_spark_sql("SELECT j -> 'xs' -> 0 ->> 'id' FROM t") == (
        "SELECT get_json_object(j, '$.xs[0].id') FROM t"
    )
    # single-step ->> int stays a JSON extraction
    assert to_spark_sql("SELECT j ->> 0 FROM t") == (
        "SELECT get_json_object(j, '$[0]') FROM t"
    )
    # semantics end-to-end: the transform survives and runs
    row = spark.sql(
        to_spark_sql("SELECT transform(array(5, 6), x -> 0) AS out")
    ).first()
    assert row["out"] == [0, 0]


def test_shim_struct_pack_and_list_aggregate(spark):
    assert to_spark_sql("SELECT struct_pack(a := 1, b := x) AS s FROM t") == (
        "SELECT named_struct('a', 1, 'b', x) AS s FROM t"
    )
    # nested calls inside values survive the balanced-paren split
    out = to_spark_sql("SELECT struct_pack(a := f(x, y), b := 'v')")
    assert out == "SELECT named_struct('a', f(x, y), 'b', 'v')"
    assert to_spark_sql("SELECT list_aggregate(xs, 'min')") == (
        "SELECT array_min(xs)"
    )
    assert to_spark_sql("SELECT list_aggr(xs, 'sum')") == (
        "SELECT aggregate(filter(xs, _e -> _e IS NOT NULL),"
        " CAST(NULL AS DOUBLE),"
        " (_acc, _e) -> coalesce(_acc, CAST(0 AS DOUBLE)) + _e)"
    )
    # unknown aggregate name: left untouched → loud failure, not wrong rows
    sql = "SELECT list_aggregate(xs, 'median')"
    assert to_spark_sql(sql) == sql
    # end-to-end through Spark
    row = spark.sql(
        to_spark_sql("SELECT struct_pack(a := 1, b := 2) AS s")
    ).first()
    assert row["s"].asDict() == {"a": 1, "b": 2}


def test_shim_str_split_nonliteral_delimiter(spark):
    # ADVICE r3: a non-literal delimiter is a VALUE in DuckDB but a REGEX
    # in Spark split() — wrap it in \Q…\E so metachars stay literal
    assert to_spark_sql("SELECT str_split(s, d) FROM t") == (
        "SELECT split(s, concat('\\\\Q', d, '\\\\E')) FROM t"
    )
    # end-to-end: '.' as a runtime value splits literally, not match-all
    row = spark.sql(
        to_spark_sql("SELECT str_split('a.b.c', substr('x.', 2)) AS xs")
    ).first()
    assert row["xs"] == ["a", "b", "c"]
    # NULL delimiter → NULL (DuckDB parity: concat propagates the NULL)
    row = spark.sql(
        to_spark_sql("SELECT str_split('a.b', CAST(NULL AS STRING)) AS xs")
    ).first()
    assert row["xs"] is None


def test_shim_list_agg_null_semantics(spark):
    # ADVICE r3: DuckDB's list sum/avg IGNORE NULL elements, return NULL
    # for empty / all-NULL lists, and avg divides by the NON-NULL count.
    # (Verified against duckdb 1.x: sum([1,NULL,2])=3, sum([])=NULL,
    # avg([1,NULL,2])=1.5, avg([NULL])=NULL, count([1,NULL,2])=2.)
    rows = spark.sql(
        to_spark_sql(
            "SELECT list_sum(array(1, NULL, 2)) AS s,"
            " list_avg(array(1, NULL, 2)) AS a,"
            " list_count(array(1, NULL, 2)) AS c,"
            " list_sum(array(CAST(NULL AS INT))) AS s_null,"
            " list_avg(array(CAST(NULL AS INT))) AS a_null,"
            " list_aggregate(array(1, NULL, 2), 'sum') AS la_s,"
            " list_aggregate(array(1, NULL, 2), 'avg') AS la_a"
        )
    ).first()
    assert rows["s"] == 3.0
    assert rows["a"] == 1.5
    assert rows["c"] == 2
    assert rows["s_null"] is None
    assert rows["a_null"] is None
    assert rows["la_s"] == 3.0
    assert rows["la_a"] == 1.5


def test_shim_list_aggregate_braces_in_args():
    # arguments containing braces must not abort the shim pass
    assert to_spark_sql("SELECT list_aggregate(f(x, '{a}'), 'min')") == (
        "SELECT array_min(f(x, '{a}'))"
    )


def test_shim_using_sample_and_similar_to():
    assert to_spark_sql("SELECT * FROM t USING SAMPLE 10%") == (
        "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    )
    assert to_spark_sql("SELECT * FROM t USING SAMPLE 100 ROWS") == (
        "SELECT * FROM t TABLESAMPLE (100 ROWS)"
    )
    assert to_spark_sql("SELECT * FROM t WHERE s SIMILAR TO 'ab+'") == (
        "SELECT * FROM t WHERE s RLIKE '^(?:ab+)$'"
    )
