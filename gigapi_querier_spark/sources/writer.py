"""Reference-layout table writer — the producer side of the data model.

The reference querier is read-only; its companion writer lays data out as

    {root}/{db}/{table}/data/date=YYYY-MM-DD/hour=HH/*.parquet
    + per-folder metadata.json  ({min_time, max_time, files:[...]} —
      querier/queryClient.go:340-356)

This module writes that layout from any DataFrame with an int64-ns time
column, so the engine's catalog pruning (and the reference itself) can
query the result.

Scale: the write is a standard ``partitionBy("date", "hour")`` parquet
write — fully distributed, one task per output partition split. Only the
metadata.json generation is driver-side, and it reads parquet *footers*
(not data) for min/max stats.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS_PER_S = 1_000_000_000


def write_table(
    df: DataFrame,
    root: str,
    db: str,
    table: str,
    time_col: str = "time",
    mode: str = "append",
) -> str:
    """Write ``df`` as a reference-layout table; returns the table path.

    ``time_col`` must be int64 epoch ns (the engine's time model); the
    hive ``date``/``hour`` partition columns are derived from it.
    """
    base = os.path.join(root, db, table, "data")
    # date/hour derive from epoch ARITHMETIC, not date_format/hour (those
    # follow spark.sql.session.timeZone — under a non-UTC session the
    # layout would disagree with Catalog's UTC interpretation of the
    # directory names and partition pruning would skip live files).
    # from_unixtime is also tz-dependent; day/hour index math is not.
    secs = F.expr(f"{time_col} DIV 1000000000")
    day = F.date_add(
        F.lit("1970-01-01").cast("date"), F.floor(secs / 86400).cast("int")
    )
    hour = F.floor(F.pmod(secs, 86400) / 3600)
    (
        df.withColumn("date", F.date_format(day, "yyyy-MM-dd"))
        .withColumn("hour", F.lpad(hour.cast("int").cast("string"), 2, "0"))
        .write.partitionBy("date", "hour")
        .mode(mode)
        .parquet(base)
    )
    write_metadata(base, time_col=time_col)
    return os.path.join(root, db, table)


def write_metadata(base: str, time_col: str = "time") -> int:
    """Generate per-folder metadata.json from parquet footer statistics
    (no data reads). Returns the number of folders written."""
    import pyarrow.parquet as pq

    n = 0
    for dirpath, dirnames, filenames in os.walk(base):
        dirnames[:] = [d for d in dirnames if d != "tmp"]
        parquet_files = sorted(f for f in filenames if f.endswith(".parquet"))
        if not parquet_files:
            continue
        entries = []
        for name in parquet_files:
            fpath = os.path.join(dirpath, name)
            meta = pq.ParquetFile(fpath).metadata
            min_t = max_t = None
            time_idx = None
            schema = meta.schema
            for i in range(len(schema)):
                if schema.column(i).name == time_col:
                    time_idx = i
                    break
            if time_idx is not None:
                for rg in range(meta.num_row_groups):
                    stats = meta.row_group(rg).column(time_idx).statistics
                    if stats is None or not stats.has_min_max:
                        continue
                    lo, hi = stats.min, stats.max
                    min_t = lo if min_t is None else min(min_t, lo)
                    max_t = hi if max_t is None else max(max_t, hi)
            entries.append(
                {
                    "path": name,
                    "size_bytes": os.path.getsize(fpath),
                    "row_count": meta.num_rows,
                    "min_time": min_t,
                    "max_time": max_t,
                }
            )
        folder_meta = {
            "type": "parquet",
            "parquet_size_bytes": sum(e["size_bytes"] for e in entries),
            "row_count": sum(e["row_count"] for e in entries),
            "min_time": min(
                (e["min_time"] for e in entries if e["min_time"] is not None),
                default=None,
            ),
            "max_time": max(
                (e["max_time"] for e in entries if e["max_time"] is not None),
                default=None,
            ),
            "files": entries,
        }
        with open(os.path.join(dirpath, "metadata.json"), "w") as f:
            json.dump(folder_meta, f)
        n += 1
    return n


def compact_table(
    spark,
    root: str,
    db: str,
    table: str,
    min_files: int = 2,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact each partition directory's small parquet files into
    ~``target_file_bytes`` outputs; returns the number of directories
    compacted.

    Protocol (safe against concurrent readers by the layout's own rules):
    new files are written under the partition's ``tmp/`` subdir — which
    the catalog and scans ALWAYS skip (reference queryClient.go:496-499)
    — then moved into place and the old files removed, and metadata.json
    regenerated last. A reader mid-compaction sees either the old files
    (plus ignorable tmp/) or the new ones; the engine's schema cache keys
    on (path, size, mtime) so replaced files never serve stale schemas.

    Scale: each directory compacts as an independent distributed
    read→coalesce→write; the driver only lists directories and renames.

    Output names carry a per-run unique token (``compacted-<run>-NNNNN``)
    so re-compacting a directory that already contains a previous run's
    output can never collide with — and then delete — its own freshly
    moved files.
    """
    import math
    import shutil
    import uuid

    base = os.path.join(root, db, table, "data")
    compacted = 0
    for dirpath, dirnames, filenames in os.walk(base):
        dirnames[:] = [d for d in dirnames if d != "tmp"]
        files = sorted(f for f in filenames if f.endswith(".parquet"))
        if len(files) < min_files:
            continue
        paths = [os.path.join(dirpath, f) for f in files]
        total = sum(os.path.getsize(p) for p in paths)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(files):
            continue  # nothing to gain
        tmp_out = os.path.join(dirpath, "tmp", "compact")
        shutil.rmtree(tmp_out, ignore_errors=True)
        spark.read.parquet(*paths).coalesce(n_out).write.mode("overwrite").parquet(
            tmp_out
        )
        new_parts = sorted(
            f for f in os.listdir(tmp_out) if f.endswith(".parquet")
        )
        # move new files in under run-unique names, then drop the old
        # ones — the run token guarantees an input from a prior
        # compaction is never the target of a move (which would make the
        # cleanup loop delete the file we just wrote)
        run = uuid.uuid4().hex[:8]
        moved = []
        for i, part in enumerate(new_parts):
            dest = os.path.join(dirpath, f"compacted-{run}-{i:05d}.parquet")
            assert dest not in paths, f"compaction name collision: {dest}"
            os.replace(os.path.join(tmp_out, part), dest)
            moved.append(dest)
        for p in paths:
            if p not in moved:
                os.remove(p)
        shutil.rmtree(os.path.join(dirpath, "tmp"), ignore_errors=True)
        compacted += 1
    if compacted:
        write_metadata(base)
    return compacted
