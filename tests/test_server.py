"""HTTP API parity tests (reference querier/server.go)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from gigapi_querier_spark.engine import QueryEngine
from gigapi_querier_spark.server import serve
from tests.fixtures import build_weather_root


@pytest.fixture(scope="module")
def base_url(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gigapi_root"))
    build_weather_root(root)
    engine = QueryEngine(spark, root=root)
    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url: str, body: dict) -> tuple[int, bytes]:
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_query_json(base_url):
    code, body = _post(
        base_url + "/query?db=mydb",
        {"query": "SELECT count(*) AS value FROM weather"},
    )
    assert code == 200
    out = json.loads(body)
    assert out == {"results": [{"value": "84"}]}  # int64-as-string


def test_query_db_in_body(base_url):
    code, body = _post(
        base_url + "/query", {"query": "SHOW TABLES", "db": "mydb"}
    )
    assert code == 200
    names = {r["table_name"] for r in json.loads(body)["results"]}
    assert names == {"weather", "metrics"}


def test_query_ndjson(base_url):
    code, body = _post(
        base_url + "/query?db=mydb&format=ndjson",
        {"query": "SELECT location, count(*) AS n FROM weather GROUP BY location"},
    )
    assert code == 200
    lines = [json.loads(l) for l in body.decode().strip().splitlines()]
    assert len(lines) == 3 and all("location" in l and "n" in l for l in lines)


def test_error_shape_400(base_url):
    code, body = _post(base_url + "/query", {"query": "SELECT FROM WHERE"})
    assert code == 400
    assert "error" in json.loads(body)


def test_missing_query_400(base_url):
    code, body = _post(base_url + "/query", {})
    assert code == 400
    assert json.loads(body)["error"] == "missing query"


def test_unknown_format_400(base_url):
    code, body = _post(base_url + "/query?format=xml", {"query": "SELECT 1"})
    assert code == 400


def test_health(base_url):
    with urllib.request.urlopen(base_url + "/health") as resp:
        out = json.loads(resp.read())
    assert out["status"] == "ok" and "timestamp" in out


def test_show_databases(base_url):
    code, body = _post(base_url + "/query", {"query": "SHOW DATABASES"})
    assert code == 200
    names = {r["database_name"] for r in json.loads(body)["results"]}
    assert names == {"mydb", "otherdb"}


def test_concurrent_queries_share_session(base_url):
    # ThreadingHTTPServer + one shared SparkSession: 8 parallel queries
    # must all succeed with correct results (the reference likewise shares
    # one DuckDB handle across request goroutines)
    import concurrent.futures

    def one(i: int):
        code, body = _post(
            base_url + "/query?db=mydb",
            {"query": f"SELECT count(*) + {i} AS v FROM weather"},
        )
        return code, json.loads(body)["results"][0]["v"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(8)))
    assert all(code == 200 for code, _ in results)
    assert [v for _, v in results] == [str(84 + i) for i in range(8)]


def test_json_max_rows_guard(base_url, monkeypatch=None):
    # 84 weather rows; a cap of 10 must refuse format=json with a clean 400
    from gigapi_querier_spark.engine import QueryEngine

    old = QueryEngine.MAX_JSON_ROWS
    QueryEngine.MAX_JSON_ROWS = 10
    try:
        code, body = _post(base_url + "/query", {"query": "SELECT * FROM weather"})
        assert code == 400
        assert b"ndjson" in body and b"error" in body
        # ndjson still streams the full result
        import urllib.request

        req = urllib.request.Request(
            base_url + "/query?format=ndjson",
            data=json.dumps({"query": "SELECT * FROM weather"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            lines = [l for l in resp.read().splitlines() if l.strip()]
        assert len(lines) == 84
    finally:
        QueryEngine.MAX_JSON_ROWS = old


def test_ui_served_at_root(base_url):
    import urllib.request

    with urllib.request.urlopen(base_url + "/") as resp:
        body = resp.read().decode()
        assert resp.status == 200
        assert "text/html" in resp.headers["Content-Type"]
    assert "gigapi-querier-spark" in body and "/query" in body


def test_ui_disabled_via_env(base_url, monkeypatch):
    import urllib.error
    import urllib.request

    monkeypatch.setenv("GIGAPI_DISABLE_UI", "1")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base_url + "/")
    assert ei.value.code == 404
