"""DuckDB single-node baseline for the headline queries — the reference's
engine of record is embedded DuckDB (README.md:60), so this is the number
BENCH is graded against ("within 2× of baseline at the same scale factor").

Usage: python tools/baseline_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from bench import HEADLINE

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    # Same protocol as bench.py: untimed warmup pass, then three measured
    # passes taking the per-query MIN; results materialize as Arrow tables
    # (the reference's FlightSQL result edge) on both engines.
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is not None:
            con.execute(sql).arrow()
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            sql = oracles.get(name)
            if sql is None:
                continue
            t0 = time.perf_counter()
            con.execute(sql).arrow()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
