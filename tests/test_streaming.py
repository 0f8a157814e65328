"""Streaming extension tests: file-source micro-batch ingestion with
watermarked windows (availableNow trigger), and batch sessionization."""

from __future__ import annotations

import pytest

from gigapi_querier_spark.streaming import (
    sessionize_batch,
    stream_table,
    windowed_counts_stream_to_memory,
)
from tests.fixtures import build_weather_root


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gigapi_root"))
    build_weather_root(path)
    return path


def test_stream_windowed_counts(spark, root):
    stream = stream_table(spark, root, "mydb", "weather")
    assert stream.isStreaming
    q = windowed_counts_stream_to_memory(spark, stream, "weather_counts")
    q.awaitTermination(120)
    out = spark.sql("SELECT sum(n) AS total FROM weather_counts").collect()
    assert out[0]["total"] == 84  # every fixture row lands in some window


def test_sessionize_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize_batch(events, time_col="ts", gap_minutes=30)
    rows = sessions.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    # session bounds are ordered and per-user session ids start at 1
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    assert min(r["session_id"] for r in rows) == 1
