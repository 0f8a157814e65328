"""Differential correctness: every inventory query vs its DuckDB oracle —
the same comparison the driver's gate performs (row count + column names +
order-insensitive value hash), at the smoke scale factor.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)
    return len(rows), sorted(cols), hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _inventory_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _inventory_names())
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    sql = e.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: it must run and have a stable schema
        assert sdf.columns
        return
    rel = oracle.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    assert _canon(sdf.columns, s_rows) == _canon(d_cols, d_rows)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_priority_names_all_registered():
    """_PRIORITY drives the driver's correctness-window ordering; a typo
    would silently drop a query out of the checked window."""
    from gigapi_querier_spark import inventory as inv

    names = set(inv.all_queries())
    missing = [n for n in inv._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert len(set(inv._PRIORITY)) == len(inv._PRIORITY), "duplicates"
    # the window head must match _PRIORITY order exactly
    assert list(inv.all_queries())[: len(inv._PRIORITY)] == list(inv._PRIORITY)
