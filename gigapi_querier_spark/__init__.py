"""gigapi_querier_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of gigapi/gigapi-querier.

The reference (gigapi/gigapi-querier, Go + embedded DuckDB) is a thin
catalog/pruning/rewrite/serving layer over Parquet files; its relational
surface is the embedded engine's SQL dialect (see SURVEY.md). This package
re-expresses that architecture Spark-first:

- ``sources``   — path-convention catalog, metadata.json time-range pruning,
                  hive date=/hour= awareness, storage layers
                  (reference: querier/queryClient.go:340-710).
- ``plans``     — light SQL pre-pass: table + time-bound extraction and
                  dialect shims; the *original* SQL then runs through
                  ``spark.sql`` against a bound temp view
                  (reference: querier/queryClient.go:87-337, :838-861).
- ``functions`` — epoch_ns / time_bucket helpers for the int64-ns time model.
- ``operators`` — Spark-native extensions: dedup (exact/minhash/simhash/
                  jaccard), similarity search, text analysis, multimodal
                  column plumbing, as-of join.
- ``streaming`` — Structured Streaming ingestion (extension; the reference
                  is strictly request/response).
- ``engine``    — the QueryClient equivalent: Query(sql, db) -> DataFrame.
- ``formats``   — JSON / NDJSON encoders (int64-as-string, RFC3339Nano;
                  reference: querier/formatJson.go).
- ``server``    — HTTP POST /query + /health (reference: querier/server.go).
- ``flightsql`` — Arrow Flight server (reference: querier/flightsql.go).
"""

__version__ = "0.1.0"
