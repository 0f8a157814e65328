"""Structured Streaming extension.

The reference has NO streaming surface (SURVEY.md §2.C — strictly
request/response over files). This package is the Spark-native extension
for continuous ingestion of the same data model: a file-source stream
over a table's directory tree, watermarked event-time windows, and
stateful sessionization.
"""

from gigapi_querier_spark.streaming.ingest import (
    sessionize_batch,
    stream_table,
    windowed_counts,
    windowed_counts_stream_to_memory,
)

__all__ = [
    "stream_table",
    "windowed_counts",
    "windowed_counts_stream_to_memory",
    "sessionize_batch",
]
