#!/usr/bin/env python3
"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The headline set covers every operator family (ingestion dataflow,
TPC-H-style joins/aggs, windows, events, text, dedup incl. MinHash-LSH,
embedding similarity, the Pandas-UDF multimodal path) so a regression in
any family moves the number.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "pipeline_status_rollup",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_orders",
    "window_topk_per_group",
    "window_running_sum",
    "events_sessionize",
    "events_tumbling_window",
    "text_token_stats",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_knn_join",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from data_ingestion_api_system_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warmup: touch every table once so JVM/codegen/file-index startup cost
    # doesn't land on whichever query happens to run first
    from data_ingestion_api_system_spark.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    # Each query is timed as the best of three back-to-back runs: the first
    # runs absorb one-time codegen/JIT/broadcast warmup and transient
    # CPU-contention spikes (this box is a shared VM — identical queries
    # were observed to swing 2-4x run-to-run); the min is the steady-state
    # latency the plan actually has. Three runs, not two, because C2 JIT
    # needs more than one execution on codegen-heavy plans (measured on
    # the 8-way-md5 MinHash plan: run2 ~5 s, run3+ ~3.1 s). Caches created
    # inside a query are dropped between runs so every run re-executes the
    # full plan.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best, rows = float("inf"), 0
        for _ in range(3):
            spark.catalog.clearCache()
            start = time.perf_counter()
            n = len(fn(spark, sf_dir).toPandas())  # Arrow-batched materialization
            best = min(best, time.perf_counter() - start)
            rows = n
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({rows} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                # methodology marker so cross-round numbers are
                # self-describing: r1 was single-run ("single"), r2+ is
                # best-of-three ("best_of_3") — not directly comparable.
                "timing": "best_of_3",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
