#!/usr/bin/env python3
"""Per-entry timing probe — bench.py's warm_b3_m5 protocol for NAMED
entries, for drift-protocol re-measures (VERDICT r11/r13: same-plan >2x
round-over-round swings must be re-measured on a certified-quiet box
before being treated as regressions) and for profiling one entry while
optimizing it.

Replicates the bench contract exactly: one untimed warmup rep, then
best-of-3 for >=1 s queries / median-of-5 for sub-second ones; pins and
cache dropped between reps so every timed rep executes the full plan;
tables pre-counted once so file-index/codegen startup doesn't land on the
first query. Records 1-min AND 5-min load at start — the drift protocol's
quietness certificate (both must be < 1.5 for a run to count as quiet).

Usage:
    python tools/time_queries.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path
from statistics import median

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    if not names:
        print("usage: time_queries.py [sf_dir] name [name ...]")
        return 2

    load1, load5, _ = os.getloadavg()
    quiet = load1 < 1.5 and load5 < 1.5

    import __spark_entry__ as entrymod
    from data_ingestion_api_system_spark.operators import release_pins
    from data_ingestion_api_system_spark.session import get_spark
    from data_ingestion_api_system_spark.tables import load_tables

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}")
        return 2

    spark = get_spark("time-queries")
    for df in load_tables(spark, sf_dir).values():
        df.count()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]

        def run_once():
            release_pins()
            spark.catalog.clearCache()
            start = time.perf_counter()
            n = len(fn(spark, sf_dir).toPandas())
            return time.perf_counter() - start, n

        warm_sec, rows = run_once()
        reps = 3 if warm_sec >= 1.0 else 5
        samples = [run_once()[0] for _ in range(reps)]
        timings[name] = round(min(samples) if reps == 3 else median(samples), 3)
        print(
            f"# {name}: warm={warm_sec:.3f}s reps={samples} rows={rows}",
            file=sys.stderr,
        )
    spark.stop()

    print(
        json.dumps(
            {
                "timings": timings,
                "sf_dir": sf_dir,
                "timing": "warm_b3_m5",
                "load_1m_at_start": round(load1, 2),
                "load_5m_at_start": round(load5, 2),
                "quiet": quiet,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
