"""Data sources: flat test tables, the path-convention catalog, and the
metadata.json time-range index (reference: querier/queryClient.go:340-710)."""

from gigapi_querier_spark.sources.tables import TABLE_NAMES, load_tables, table

__all__ = ["TABLE_NAMES", "load_tables", "table"]
