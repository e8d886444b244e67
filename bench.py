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

    # Each query runs once untimed (warmup), then is timed as the best of
    # three back-to-back runs. The warmup absorbs one-time codegen compile /
    # broadcast build; the min-of-3 absorbs C2 JIT promotion and transient
    # CPU-contention spikes (this box is a shared VM — identical queries
    # were observed to swing 2-4x run-to-run), so the reported number is the
    # steady-state latency the plan actually has. The dedicated warmup rep
    # exists because 3 total runs proved insufficient for the two largest
    # codegen plans (measured: status-rollup runs 1-4 = 10.3/8.4/3.4/1.8 s —
    # best-of-3-including-cold reported 3.4 s for a 1.8 s steady state).
    # Caches created inside a query are dropped between runs so every timed
    # run re-executes the full plan.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best, rows = float("inf"), 0
        for rep in range(4):
            spark.catalog.clearCache()
            start = time.perf_counter()
            n = len(fn(spark, sf_dir).toPandas())  # Arrow-batched materialization
            if rep > 0:  # rep 0 is the untimed warmup
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
                # self-describing: r1 was single-run ("single"), r2-r5
                # best-of-three including the cold run ("best_of_3"), r6+
                # one untimed warmup then best-of-three ("warm_best_of_3")
                # — not directly comparable across markers.
                "timing": "warm_best_of_3",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
