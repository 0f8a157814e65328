"""Property-based tests for the SQL pre-pass (hypothesis).

The reference's parser is regex-over-SQL (querier/queryClient.go:87-337);
these properties pin the invariants our re-derivation must hold for ANY
input, not just the golden cases: literal round-trips, boundary safety,
and literal-preservation of rewrites.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from gigapi_querier_spark.plans.sqlpass import (
    extract_time_range,
    parse_time_literal_ns,
    rewrite_time_literals,
    strip_db_qualifier,
    to_spark_sql,
)

NS = 1_000_000_000

_dt = st.datetimes(
    min_value=datetime(1970, 1, 2), max_value=datetime(2200, 1, 1)
)
_frac_ns = st.integers(min_value=0, max_value=999_999_999)


@given(_dt, _frac_ns)
@settings(max_examples=200, deadline=None)
def test_time_literal_roundtrip(dt, frac):
    """format(ns) → parse == ns for every RFC3339Nano instant."""
    base = int(dt.replace(tzinfo=timezone.utc).timestamp()) * NS + frac
    lit = datetime.fromtimestamp(base // NS, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S"
    ) + f".{base % NS:09d}Z"
    assert parse_time_literal_ns(lit) == base


@given(_dt, st.sampled_from([">=", ">", "<=", "<", "="]))
@settings(max_examples=100, deadline=None)
def test_extract_matches_only_bare_time(dt, op):
    """A predicate on a column merely CONTAINING 'time' never extracts;
    the bare column always does."""
    lit = dt.replace(tzinfo=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    assert extract_time_range(f"endtime {op} '{lit}'").is_empty
    assert extract_time_range(f"t.time {op} '{lit}'").is_empty
    tr = extract_time_range(f"time {op} '{lit}'")
    assert not tr.is_empty


@given(st.text(alphabet=st.characters(blacklist_characters="'\\"), max_size=40))
@settings(max_examples=200, deadline=None)
def test_strip_db_qualifier_preserves_literals(payload):
    """Whatever sits inside a string literal survives the rewrite
    byte-for-byte — even the qualified name itself."""
    sql = f"SELECT * FROM mydb.t WHERE note = '{payload}mydb.t'"
    out = strip_db_qualifier(sql, "mydb", "t")
    assert out == f"SELECT * FROM t WHERE note = '{payload}mydb.t'"


@given(st.text(alphabet=st.characters(blacklist_characters="'\\"), max_size=40))
@settings(max_examples=200, deadline=None)
def test_shim_preserves_literals(payload):
    """Dialect rewrites never alter single-quoted literal contents (except
    the recognized cast/arrow forms, which this payload cannot produce)."""
    sql = f"SELECT list_min(xs), '{payload}' AS tag FROM t"
    out = to_spark_sql(sql)
    assert f"'{payload}'" in out
    assert out.startswith("SELECT array_min(xs)")


@given(_dt)
@settings(max_examples=100, deadline=None)
def test_rewrite_time_literals_is_constant_fold(dt):
    """`time >= '<lit>'` folds to the exact ns integer parse() returns."""
    lit = dt.replace(tzinfo=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    ns = parse_time_literal_ns(lit)
    out = rewrite_time_literals(f"SELECT * FROM t WHERE time >= '{lit}'")
    assert out == f"SELECT * FROM t WHERE time >= {ns}"
