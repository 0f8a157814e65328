"""DataFrame → Arrow conversion with the reference's result-schema rules
(querier/flightsql.go:307-455):

- ``time`` column first, remaining columns sorted alphabetically
  (flightsql.go:313-324);
- columns named time/time_str/time_int are served as timestamp[ns, UTC]
  (flightsql.go:430-432) — int64 ns longs and µs timestamps both re-cast;
- all-null columns default to utf8 (flightsql.go:453-454).

Spark hands back Arrow natively (df.toArrow(), Spark 4); this module only
re-orders and re-types at the presentation edge so the engine stays
ns-precise end-to-end.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame

TIME_COLUMNS = ("time", "time_str", "time_int")
_NS_UTC = pa.timestamp("ns", tz="UTC")


def to_arrow(df: DataFrame) -> pa.Table:
    table = df.toArrow()
    return normalize_arrow(table)


def normalize_arrow(table: pa.Table) -> pa.Table:
    names = list(table.column_names)
    ordered = [c for c in names if c == "time"] + sorted(
        c for c in names if c != "time"
    )
    table = table.select(ordered)

    fields = []
    columns = []
    for name in table.column_names:
        col = table.column(name)
        typ = col.type
        if name in TIME_COLUMNS:
            col = _to_ns_utc(col)
            typ = _NS_UTC
        elif pa.types.is_null(typ):
            col = col.cast(pa.string())
            typ = pa.string()
        fields.append(pa.field(name, typ))
        columns.append(col)
    return pa.table(columns, schema=pa.schema(fields))


def _to_ns_utc(col: pa.ChunkedArray) -> pa.ChunkedArray:
    t = col.type
    if pa.types.is_integer(t):
        # int64 epoch ns (the engine's native time representation)
        return col.cast(pa.int64()).cast(_NS_UTC)
    if pa.types.is_timestamp(t):
        return col.cast(_NS_UTC)
    if pa.types.is_string(t):
        # string timestamps: the same layouts the reference accepts
        # (flightsql.go:409-425 — RFC3339[Nano], space/T-separated, with or
        # without fractional seconds). Vectorized: Arrow's cast parses
        # tz-annotated strings straight to ns-UTC, and naive strings to
        # naive-ns (then re-stamped UTC). Only a column Arrow can't parse
        # wholesale (mixed/odd layouts) walks the slow per-value path.
        try:
            return col.cast(_NS_UTC)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
        try:
            return col.cast(pa.timestamp("ns")).cast(_NS_UTC)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
        from gigapi_querier_spark.plans.sqlpass import parse_time_literal_ns

        values = [
            None
            if v is None
            else parse_time_literal_ns(str(v).replace(" ", "T", 1))
            for v in col.to_pylist()
        ]
        return pa.chunked_array([pa.array(values, pa.int64()).cast(_NS_UTC)])
    return col.cast(_NS_UTC)
