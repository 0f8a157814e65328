"""Build a reference-shaped data root for engine tests (FIXTURES.md §1):

    {root}/mydb/weather/data/date=YYYY-MM-DD/hour=HH/*.parquet
    + per-folder metadata.json, a tmp/ decoy dir, and schema drift
    (one file with an extra column, one with a missing column).

``time`` is int64 epoch nanoseconds — the reference's time model.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

NS = 1_000_000_000

LOCATIONS = ("north", "south", "east")


def _ns(y, mo, d, h=0, m=0, s=0) -> int:
    return int(datetime(y, mo, d, h, m, s, tzinfo=timezone.utc).timestamp()) * NS


def _write_file(path: str, times: list[int], extra: str | None = None, drop: str | None = None):
    n = len(times)
    cols: dict[str, pa.Array] = {
        "time": pa.array(times, pa.int64()),
        "location": pa.array([LOCATIONS[i % 3] for i in range(n)]),
        "temperature": pa.array([10.0 + (i % 7) for i in range(n)], pa.float64()),
        "humidity": pa.array([40.0 + (i % 11) for i in range(n)], pa.float64()),
        "active": pa.array([i % 2 == 0 for i in range(n)]),
        "count": pa.array([None if i % 5 == 0 else i for i in range(n)], pa.int64()),
    }
    if drop:
        cols.pop(drop)
    if extra:
        cols[extra] = pa.array([float(i) for i in range(n)], pa.float64())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table(cols), path)
    return {
        "path": os.path.basename(path),
        "size_bytes": os.path.getsize(path),
        "row_count": n,
        "min_time": min(times),
        "max_time": max(times),
    }


def build_weather_root(root: str) -> dict:
    """Returns a manifest: {'files': {relpath: (min_ns, max_ns)}, 'total_rows': N}."""
    base = os.path.join(root, "mydb", "weather", "data")
    manifest = {}
    total = 0

    # Three date partitions × two hour partitions, 12 rows each.
    days = [(2024, 1, 1), (2024, 1, 2), (2024, 1, 3)]
    for day in days:
        for hour in (0, 6):
            t0 = _ns(*day, hour)
            times = [t0 + i * 5 * 60 * NS for i in range(12)]  # every 5 min
            rel = f"date={day[0]}-{day[1]:02d}-{day[2]:02d}/hour={hour:02d}"
            fpath = os.path.join(base, rel, "part-0.parquet")
            entry = _write_file(fpath, times)
            manifest[f"{rel}/part-0.parquet"] = (entry["min_time"], entry["max_time"])
            total += 12

    # metadata.json folder (covers 2024-01-01 hour=00): relative file paths
    meta_dir = os.path.join(base, "date=2024-01-01", "hour=00")
    files = [
        {
            "path": "part-0.parquet",
            "size_bytes": os.path.getsize(os.path.join(meta_dir, "part-0.parquet")),
            "row_count": 12,
            "min_time": _ns(2024, 1, 1, 0),
            "max_time": _ns(2024, 1, 1, 0, 55),
        },
        {  # stale entry — file does not exist
            "path": "gone.parquet",
            "size_bytes": 0,
            "row_count": 0,
            "min_time": _ns(2024, 1, 1, 0),
            "max_time": _ns(2024, 1, 1, 0, 55),
        },
    ]
    with open(os.path.join(meta_dir, "metadata.json"), "w") as f:
        json.dump(
            {
                "type": "parquet",
                "parquet_size_bytes": sum(x["size_bytes"] for x in files),
                "row_count": 12,
                "min_time": _ns(2024, 1, 1, 0),
                "max_time": _ns(2024, 1, 1, 0, 55),
                "files": files,
            },
            f,
        )

    # tmp/ decoy with a half-written file (must be skipped)
    tmp = os.path.join(base, "tmp")
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "half.parquet"), "wb") as f:
        f.write(b"PAR1garbage")

    # schema drift: extra column file + missing column file on 2024-01-03
    drift_dir = os.path.join(base, "date=2024-01-03", "hour=12")
    t0 = _ns(2024, 1, 3, 12)
    e1 = _write_file(
        os.path.join(drift_dir, "extra.parquet"),
        [t0 + i * 60 * NS for i in range(6)],
        extra="pressure",
    )
    e2 = _write_file(
        os.path.join(drift_dir, "missing.parquet"),
        [t0 + (i + 10) * 60 * NS for i in range(6)],
        drop="humidity",
    )
    manifest["date=2024-01-03/hour=12/extra.parquet"] = (e1["min_time"], e1["max_time"])
    manifest["date=2024-01-03/hour=12/missing.parquet"] = (e2["min_time"], e2["max_time"])
    total += 12

    # second table + second database for SHOW commands
    other = os.path.join(root, "mydb", "metrics", "data")
    _write_file(os.path.join(other, "part-0.parquet"), [_ns(2024, 2, 1)])
    os.makedirs(os.path.join(root, "otherdb", "t1", "data"), exist_ok=True)
    _write_file(
        os.path.join(root, "otherdb", "t1", "data", "part-0.parquet"), [_ns(2024, 2, 1)]
    )

    return {"files": manifest, "total_rows": total}
