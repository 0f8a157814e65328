"""Arrow Flight server (reference querier/flightsql.go).

Two-RPC protocol parity:
- ``get_flight_info`` sanitizes the query (strip control chars — the
  reference also strips all non-ASCII, flightsql.go:120-132; we keep
  UTF-8, documented divergence), resolves the database from gRPC metadata
  keys bucket → database → namespace (default "default",
  flightsql.go:135-147), executes via the engine, stores the Arrow table
  under ticket ``query-<n>`` (flightsql.go:163-169), and returns a
  FlightInfo whose endpoint carries the ticket.
- ``do_get`` streams the stored record batches and deletes the ticket
  (flightsql.go:253-283).

Ticket state is process-local like the reference's map[string]arrow.Record
(flightsql.go:35-37) but bounded + expiring (SURVEY.md §7.3 hard part 5).

Descriptor commands: real FlightSQL clients wrap the query in a protobuf
``Any(CommandStatementQuery)``; pyarrow has no FlightSQL server bindings,
so a 30-line manual protobuf decode unwraps it. Plain UTF-8 SQL commands
are accepted too.
"""

from __future__ import annotations

import itertools
import os
import re
import threading
import time

import pyarrow as pa
import pyarrow.flight as flight

from gigapi_querier_spark.arrow_out import to_arrow
from gigapi_querier_spark.engine import QueryEngine, QueryError

_TICKET_TTL_SEC = 300
_MAX_TICKETS = 256
#: Byte budget for all pending tickets (reference parity would be
#: unbounded — flightsql.go:35-37 holds full tables per ticket; a handful
#: of wide results would OOM the driver). Oversized single results are
#: refused outright; otherwise oldest tickets evict until the new one fits.
_MAX_TICKET_BYTES = int(os.environ.get("GIGAPI_FLIGHT_TICKET_BYTES", 512 * 1024 * 1024))


# --- minimal protobuf decode for Any{CommandStatementQuery} ----------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def _proto_fields(buf: bytes):
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field_no, wire = tag >> 3, tag & 7
        if wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            yield field_no, buf[i : i + ln]
            i += ln
        elif wire == 0:
            _, i = _read_varint(buf, i)
        else:  # unsupported wire type → bail
            return


def extract_statement_query(cmd: bytes) -> str:
    """Unwrap Any{type_url, value=CommandStatementQuery{query}} or fall
    back to treating the bytes as UTF-8 SQL."""
    try:
        fields = dict(_proto_fields(cmd))
        type_url = fields.get(1, b"").decode("utf-8", "ignore")
        if "CommandStatementQuery" in type_url and 2 in fields:
            inner = dict(_proto_fields(fields[2]))
            return inner.get(1, b"").decode("utf-8")
    except Exception:
        pass
    return cmd.decode("utf-8", "replace")


def sanitize_query(q: str) -> str:
    """Strip control characters (reference flightsql.go:120-132; we keep
    printable non-ASCII rather than deleting it)."""
    return re.sub(r"[\x00-\x1f\x7f]", " ", q).strip()


# ---------------------------------------------------------------------------


class _HeaderMiddleware(flight.ServerMiddleware):
    def __init__(self, headers: dict):
        self.headers = headers


class _HeaderMiddlewareFactory(flight.ServerMiddlewareFactory):
    """Captures the db-selection gRPC headers the reference reads
    (bucket → database → namespace, flightsql.go:135-147)."""

    def start_call(self, info, headers):
        captured = {}
        for key in ("bucket", "database", "namespace"):
            vals = headers.get(key) or headers.get(key.encode()) or []
            if vals:
                v = vals[0]
                captured[key] = v.decode() if isinstance(v, bytes) else v
        return _HeaderMiddleware(captured)


class GigapiFlightServer(flight.FlightServerBase):
    def __init__(self, engine: QueryEngine, location: str = "grpc://0.0.0.0:8082"):
        super().__init__(location, middleware={"headers": _HeaderMiddlewareFactory()})
        self.engine = engine
        self._location = location
        self._tickets: dict[str, tuple[float, pa.Table]] = {}
        self._lock = threading.Lock()
        self._seq = itertools.count(int(time.time() * 1e9))

    # -- helpers ----------------------------------------------------------

    def _db_from_context(self, context) -> str:
        try:
            mw = context.get_middleware("headers")
            md = mw.headers if mw else {}
        except Exception:
            md = {}
        for key in ("bucket", "database", "namespace"):
            if md.get(key):
                return md[key]
        return "default"  # flightsql.go:135

    def _store(self, table: pa.Table) -> bytes:
        nbytes = table.nbytes
        if nbytes > _MAX_TICKET_BYTES:
            # refuse rather than OOM the driver — the client should page
            # (LIMIT) or use the streaming HTTP ndjson edge
            raise flight.FlightServerError(
                f"result too large for ticket store ({nbytes} bytes > "
                f"{_MAX_TICKET_BYTES}); add a LIMIT or stream via ndjson"
            )
        ticket = f"query-{next(self._seq)}".encode()
        now = time.time()
        with self._lock:
            # expire old tickets; bound the map by count AND bytes
            dead = [
                k for k, (ts, _) in self._tickets.items() if now - ts > _TICKET_TTL_SEC
            ]
            for k in dead:
                del self._tickets[k]
            held = sum(t.nbytes for _, t in self._tickets.values())
            while self._tickets and (
                len(self._tickets) >= _MAX_TICKETS
                or held + nbytes > _MAX_TICKET_BYTES
            ):
                _, evicted = self._tickets.pop(next(iter(self._tickets)))
                held -= evicted.nbytes
            self._tickets[ticket.decode()] = (now, table)
        return ticket

    # -- RPCs ---------------------------------------------------------------

    def get_flight_info(self, context, descriptor):
        query = sanitize_query(extract_statement_query(descriptor.command or b""))
        if not query:
            raise flight.FlightServerError("empty query")
        db = self._db_from_context(context)
        try:
            df = self.engine.query(query, db)
            table = to_arrow(df)
        except QueryError as e:
            raise flight.FlightServerError(str(e)) from e
        ticket = self._store(table)
        endpoint = flight.FlightEndpoint(ticket, [self._location])
        return flight.FlightInfo(
            table.schema, descriptor, [endpoint], table.num_rows, -1
        )

    def do_get(self, context, ticket):
        key = ticket.ticket.decode()
        with self._lock:
            entry = self._tickets.pop(key, None)  # delete-after-send (:276-279)
        if entry is None:
            raise flight.FlightServerError(f"unknown ticket: {key}")
        return flight.RecordBatchStream(entry[1])

    def do_put(self, context, descriptor, reader, writer):
        # read-only engine (reference rejects DoPut, flightsql.go:286-290)
        raise flight.FlightServerError("DoPut is not supported")
