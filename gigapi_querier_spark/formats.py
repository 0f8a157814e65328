"""Result encoders — JSON / NDJSON with the reference's two formatting
rules (querier/formatJson.go:41-67):

- int64 values render as **strings** (BigInt-safe for JS clients);
- timestamps render as RFC3339Nano.

Plus the count-null→0 rule applied by the engine (queryClient.go:911-914).
JSON shape: {"results": [...]} (formatJson.go:10-19); NDJSON: one object
per line (formatJson.go:21-38). Format registry mirrors querier/format.go.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator
from datetime import date, datetime, timezone


def _rfc3339nano(dt: datetime) -> str:
    """RFC3339 with nanosecond-capable fractional part (Go's RFC3339Nano
    drops trailing zeros; Python datetimes carry µs)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    frac = f".{dt.microsecond:06d}".rstrip("0").rstrip(".") if dt.microsecond else ""
    off = dt.strftime("%z")
    off = "Z" if off in ("+0000", "") else f"{off[:3]}:{off[3:]}"
    return f"{base}{frac}{off}"


def transform_value(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return str(v)  # int64 → decimal string (formatJson.go:53-54)
    if isinstance(v, datetime):
        return _rfc3339nano(v)  # formatJson.go:56-57
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return {k: transform_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [transform_value(x) for x in v]
    return v


def transform_rows(rows: Iterable[dict]) -> list[dict]:
    return [{k: transform_value(v) for k, v in r.items()} for r in rows]


def json_format(rows: Iterable[dict]) -> str:
    return json.dumps({"results": transform_rows(rows)})


def ndjson_format(rows: Iterable[dict]) -> Iterator[str]:
    """One JSON object per line — streamable (the Spark engine can feed
    this from toLocalIterator without materializing the result)."""
    for r in rows:
        yield json.dumps({k: transform_value(v) for k, v in r.items()})


#: format registry (reference querier/format.go:5-10)
FORMATTERS = {
    "json": json_format,
    "ndjson": ndjson_format,
}
