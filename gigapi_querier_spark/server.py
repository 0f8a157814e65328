"""HTTP API (reference querier/server.go):

- POST /query  — body {"query": ..., "db"?: ...}; query params ``db`` and
  ``format`` (json | ndjson); db resolution order: ?db= → body db →
  "mydb" (server.go:183-189).
- GET /health  — {"status": "ok", "timestamp": RFC3339} (server.go:215-230).
- errors       — HTTP 400 + {"error": msg} (server.go:194, :206-212).
- CORS         — permissive headers + OPTIONS preflight (server.go:146-157).

stdlib ThreadingHTTPServer: the Spark driver is the natural home of the
query frontend (one SparkSession shared across requests, like the
reference's single DuckDB handle). NDJSON streams row-by-row from
toLocalIterator — results never fully materialize in driver memory
(improvement over the reference's full row-map materialization,
queryClient.go:886-920).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from gigapi_querier_spark.engine import QueryEngine, QueryError
from gigapi_querier_spark.formats import json_format, transform_value

_CORS = {
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Allow-Methods": "POST, GET, OPTIONS",
    "Access-Control-Allow-Headers": "Content-Type",
}


class _HeadersAlreadySent(Exception):
    """A streaming response failed after the status line went out; the
    connection must be closed, never re-responded."""


def make_handler(engine: QueryEngine):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in _CORS.items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _error(self, msg: str, code: int = 400):
            self._send(code, json.dumps({"error": msg}).encode())

        def do_OPTIONS(self):
            self._send(204, b"")

        def do_GET(self):
            url = urlparse(self.path)
            if url.path in ("", "/") and not os.environ.get("GIGAPI_DISABLE_UI"):
                # built-in query UI (reference server.go:233-269 serves an
                # embedded SPA at /, gated by DisableUI)
                from gigapi_querier_spark.ui import INDEX_HTML

                self._send(200, INDEX_HTML.encode(), "text/html; charset=utf-8")
                return
            if url.path == "/health":
                body = json.dumps(
                    {
                        "status": "ok",
                        "timestamp": datetime.now(timezone.utc).strftime(
                            "%Y-%m-%dT%H:%M:%SZ"
                        ),
                    }
                ).encode()
                self._send(200, body)
                return
            self._error("not found", 404)

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/query":
                self._error("not found", 404)
                return
            qs = parse_qs(url.query)
            fmt = qs.get("format", ["json"])[0]
            if fmt not in ("json", "ndjson"):
                self._error(f"unknown format: {fmt}")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._error("invalid JSON body")
                return
            sql = payload.get("query", "")
            if not sql:
                self._error("missing query")
                return
            db = qs.get("db", [None])[0] or payload.get("db") or engine.DEFAULT_DB
            try:
                if fmt == "ndjson":
                    self._stream_ndjson(sql, db)
                else:
                    rows = engine.query_rows(sql, db)
                    self._send(200, json_format(rows).encode())
            except _HeadersAlreadySent:
                # mid-stream ndjson failure: headers (200 + chunked) are on
                # the wire — a second send_response would corrupt the
                # framing. The chunked body was already terminated; close.
                self.close_connection = True
            except QueryError as e:
                self._error(str(e))
            except Exception as e:  # engine bug: still the error shape
                self._error(str(e), 500)

        def _stream_ndjson(self, sql: str, db: str):
            # Everything that can fail BEFORE headers (parse, prune, bind,
            # first-partition execution) runs here so errors still produce
            # a clean 400/500 response.
            df = engine.query(sql, db)
            count_cols = {c for c in df.columns if "count" in c}
            it = df.toLocalIterator()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            for k, v in _CORS.items():
                self.send_header(k, v)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for row in it:
                    d = row.asDict(recursive=True)
                    for c in count_cols:
                        if d.get(c) is None:
                            d[c] = 0
                    line = (
                        json.dumps({k: transform_value(v) for k, v in d.items()}) + "\n"
                    ).encode()
                    self.wfile.write(f"{len(line):x}\r\n".encode() + line + b"\r\n")
            except Exception as e:
                # terminate the chunked body; do NOT start a second response
                try:
                    self.wfile.write(b"0\r\n\r\n")
                except OSError:
                    pass
                raise _HeadersAlreadySent(str(e)) from e
            self.wfile.write(b"0\r\n\r\n")

    return Handler


def serve(engine: QueryEngine, host: str = "0.0.0.0", port: int = 8080):
    httpd = ThreadingHTTPServer((host, port), make_handler(engine))
    return httpd  # caller runs serve_forever() (tests run it in a thread)
