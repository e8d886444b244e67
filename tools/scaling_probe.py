#!/usr/bin/env python3
"""Empirical scaling probe: time a representative subset of the registry at
all three generated scale factors (a 100× data range) and report each
operator's fitted scaling exponent — the direct evidence for SCALE.md's
claims that no plan hides super-linear work.

Method: per (query, sf): build the DataFrame fresh, one untimed warm run,
then best-of-3 timed runs (fresh build each run so AQE stage reuse cannot
fake the number). exponent = log(t(sf_hi)/t(sf_lo)) / log(100), using the
two endpoints. At local[32] small inputs are overhead-bound (~0.3 s
floor), which DEFLATES exponents; an exponent near 1 therefore indicates
linear-or-better data cost on top of fixed overhead, and anything ≥ 1.3
deserves a plan audit (a quadratic operator would show ≥ 2 once data cost
dominates).

Usage: python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# shuffle/join-heavy representatives: the plans where super-linear cost
# would hide (pairwise families, multi-join rollups, window chains)
DEFAULT = [
    "dedup_minhash_lsh",
    "dedup_semantic",
    "graph_triangle_count",
    "basket_brand_pairs",
    "text_inverted_index",
    "prep_dsir_weights",
    "sim_knn_join",
    "events_path_mining",
    "text_ngram_novelty",
    "sketch_join_size_estimate",
    "tpch_q18_large_orders",
    "orders_backlog_sweep",
    "events_rfm_segmentation",
    "pipeline_status_rollup",
    # round-7f/7g heavies (VERDICT r7 #4): the offset-explode DAU/WAU
    # fan-out, the banded pHash equi-join, the entropy word-explode, the
    # broadcast-LUT ADC fold, and the micro-batch enrichment path
    "events_dau_wau",
    "multimodal_phash_dedup",
    "text_entropy_score",
    "sim_pq_adc_search",
    "streaming_static_enrich",
    # round-8 operators with nontrivial shuffle/join/Python-exec shapes:
    # the LPA join loop, the MG candidate+verify pass, the island windows,
    # the audio 1->N expansion, the global running sum, the wedge join,
    # and the streaming windowed rank
    "graph_label_prop",
    "sketch_heavy_hitters",
    "events_interval_merge",
    "multimodal_audio_windows",
    "orders_abc_classification",
    "graph_common_neighbors",
    "streaming_windowed_topk",
    # the two tuning sweeps: the LSH sweep's loose 4x2 config carries the
    # registry's only deliberately-quadratic-in-cluster-size term, bounded
    # by the 1-in-4 id-mod sample (dedup.py::SWEEP_SAMPLE_MOD)
    "dedup_lsh_tuning_sweep",
    "sim_ivf_nprobe_sweep",
    # VERDICT r8 #5: the remaining round-8 entries — mostly narrow-map /
    # bounded-output shapes where an accidental regression (a lost
    # pushdown, a widened shuffle) would otherwise go unmeasured
    "orders_pareto_frontier",
    "text_length_buckets",
    "sim_hard_negatives",
    "dq_benford_check",
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "sql_lateral_topk",
    "orders_cohort_ltv",
    "text_rake_keyphrases",
    "join_salted_skew",
    "text_tokenizer_fertility",
    # round-9 operators with nontrivial shuffle/join shapes: the KMV and
    # theta order-statistic sketches, PMI's vocab-sized joins, the Katz
    # 2-step unroll, the ORC sink cycle, the bloom-prefiltered incremental
    # dedup, the BPE pair counter, the k-core peel loop, the survival
    # risk-set rollup, the FK orphan sweep, the Heaps growth curve, and
    # the funnel's single-pass rule stack
    "sketch_kmv_distinct",
    "sketch_theta_intersection",
    "text_pmi_collocations",
    "graph_katz_centrality",
    "io_orc_roundtrip",
    "dedup_incremental_bloom",
    "text_bpe_merge_step",
    "graph_kcore_peel",
    "events_survival_hazard",
    "dq_referential_orphans",
    "text_heaps_vocab_growth",
    "text_filter_funnel",
    "io_schema_evolution",
    "layout_column_stats",
    "prep_curriculum_order",
    "text_kneser_ney_score",
    "events_bot_score",
    "events_cumulative_reach",
    "sim_cluster_purity",
    "events_wow_growth",
    "orders_class_migration",
    "events_markov_stationary",
    "orders_repeat_purchase",
    "sim_dim_variance_topk",
    "events_error_budget_burn",
    "orders_ship_latency",
    "text_vocab_coverage",
]


def main() -> int:
    import __spark_entry__ as entrymod
    from data_ingestion_api_system_spark.session import get_spark

    spark = get_spark("scaling-probe")
    qs = entrymod.queries()
    args = sys.argv[1:]
    if args and args[0] == "--all":
        # Round 10 (VERDICT r9 #4): probe the ENTIRE registry so SCALE.md
        # can map every entry to a measured exponent instead of a
        # family-level boundedness argument. Registry-derived so it can't
        # go stale; the curated DEFAULT remains the fast representative set.
        names = list(qs)
    else:
        names = args or DEFAULT
    from data_ingestion_api_system_spark.operators import release_pins

    out = {}
    for name in names:
        # free the previous entry's pins/caches: over a full-registry run
        # (206 entries x 3 sfs x 4 executions) unreleased pins would pile
        # up in executor storage; within one entry the cache persists so
        # the warm/best-of-3 methodology matches earlier rounds' records
        release_pins()
        spark.catalog.clearCache()
        fn = qs[name]
        times = []
        for sf in SFS:
            fn(spark, sf).collect()  # warm (fresh plan)
            best = math.inf
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf).collect()
                best = min(best, time.time() - t0)
            times.append(round(best, 3))
        exp = math.log(times[-1] / times[0]) / math.log(100)
        out[name] = {"t": dict(zip(["sf0.001", "sf0.01", "sf0.1"], times)),
                     "exponent": round(exp, 3)}
        flag = "  <-- AUDIT" if exp >= 1.3 else ""
        print(f"{name:32s} {times[0]:7.3f} {times[1]:7.3f} {times[2]:7.3f} "
              f"exp={exp:+.3f}{flag}", flush=True)
        partial = Path(__file__).resolve().parent.parent / "SCALE_PROBE.partial.json"
        with open(partial, "w") as fh:
            # SAME shape as the final SCALE_PROBE.json so a truncated run's
            # partial can be consumed by tools/scale_map.py directly
            worst_so_far = max(v["exponent"] for v in out.values())
            json.dump(
                {"probe": "scaling", "worst_exponent": worst_so_far, "queries": out},
                fh,
            )
    # persist (same rationale as bench.py): the JSON line on stdout is
    # scrape-fragile; the file is what tools/scale_map.py reads. A
    # targeted (non --all) run MERGES into the existing record instead of
    # replacing it — re-probing one replanned entry must not strip the
    # other 200 measurements and break scale_map's totality check.
    out_path = Path(__file__).resolve().parent.parent / "SCALE_PROBE.json"
    merged = dict(out)
    if not (args and args[0] == "--all"):
        try:
            merged = {**json.loads(out_path.read_text())["queries"], **out}
        except (OSError, ValueError, KeyError):
            pass  # no prior record — the targeted run stands alone
    # prune ghosts: entries probed in a past run but since removed/renamed
    # out of the registry must not survive the merge — worst_exponent and
    # the exit code below are computed over `merged`, so a stale ≥1.3
    # measurement for a dead query would fail the probe forever
    merged = {n: v for n, v in merged.items() if n in qs}
    worst = max(merged.values(), key=lambda v: v["exponent"])["exponent"]
    record = {"probe": "scaling", "worst_exponent": worst, "queries": merged}
    print(json.dumps({"probe": "scaling", "worst_exponent": worst,
                      "probed_now": sorted(out), "queries": out}))
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    spark.stop()
    return 0 if worst < 1.3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
