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


def test_stateful_running_totals(spark, root):
    from gigapi_querier_spark.streaming.ingest import stateful_running_totals

    # small triggers force multiple micro-batches → state must carry over
    stream = stream_table(spark, root, "mydb", "weather", max_files_per_trigger=3)
    agg = stateful_running_totals(stream, key_col="location", value_col="temperature")
    q = (
        agg.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per location reflects ALL rows (28 each of 84)
    rows = spark.sql(
        "SELECT location, max(n_events) AS n FROM running_totals GROUP BY location"
    ).collect()
    assert {r["location"]: r["n"] for r in rows} == {
        "north": 28, "south": 28, "east": 28,
    }
    # multiple batches actually happened (update mode emits per batch)
    assert spark.sql("SELECT count(*) AS c FROM running_totals").first()["c"] > 3
