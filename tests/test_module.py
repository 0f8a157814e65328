"""Embedded-module mode (reference module/init.go:23-55)."""

from __future__ import annotations

import json
import urllib.request

from tests.fixtures import build_weather_root


def test_embedded_init_and_query(spark, tmp_path_factory):
    from gigapi_querier_spark.module import init

    root = str(tmp_path_factory.mktemp("emb_root"))
    build_weather_root(root)
    mod = init(root, mode="readonly", spark=spark, http_port=18191)
    try:
        # programmatic edge
        df = mod.query("SELECT count(*) AS n FROM weather", "mydb")
        assert df.collect()[0]["n"] == 84
        # HTTP edge mounted in-process
        req = urllib.request.Request(
            "http://localhost:18191/query?db=mydb",
            data=json.dumps({"query": "SELECT count(*) AS n FROM weather"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            body = json.loads(resp.read())
        assert body["results"][0]["n"] == "84"  # int64 → string (reference JSON rule)
    finally:
        mod.shutdown()


def test_embedded_writer_mode_skips_servers(spark, tmp_path_factory):
    from gigapi_querier_spark.module import init

    root = str(tmp_path_factory.mktemp("emb_root2"))
    build_weather_root(root)
    mod = init(root, mode="writeonly", spark=spark, http_port=18192)
    try:
        assert mod.httpd is None and mod.flight is None
        assert mod.query("SHOW DATABASES", "mydb").count() >= 1
    finally:
        mod.shutdown()
