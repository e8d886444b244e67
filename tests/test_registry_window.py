"""Pin the driver-verification-window invariant of collect_queries().

The driver's CORRECTNESS gate only evaluates the first ``_WINDOW_SIZE``
(observed: 50) registry entries. These tests fail loudly if an edit to any
module's QUERIES dict silently pushes a must-certify entry out of the
window — the failure mode ADVICE.md (round 2) flagged as guarded only by a
docstring.
"""

from __future__ import annotations

import pytest

from data_ingestion_api_system_spark.operators import (
    _WINDOW_FILL,
    _WINDOW_SIZE,
    collect_queries,
)


@pytest.fixture(scope="module")
def registry():
    queries, oracle = collect_queries()
    return list(queries), queries, oracle


def test_window_holds_pipeline_and_all_of_prep(registry):
    """Positions 1..50 must contain the 5 pipeline entries (reference soul,
    driver-green every round) and EVERY prep entry (the module new operators
    land in — in-window by construction)."""
    names, _, _ = registry
    window = set(names[:_WINDOW_SIZE])

    from data_ingestion_api_system_spark.operators import pipeline, prep

    missing_pipeline = set(pipeline.QUERIES) - window
    assert not missing_pipeline, f"pipeline entries out of window: {missing_pipeline}"
    missing_prep = set(prep.QUERIES) - window
    assert not missing_prep, f"prep entries out of window: {missing_prep}"


def test_window_holds_never_certified_round2_tail(registry):
    """The 17 entries with no driver CORRECTNESS row across rounds 1-2
    (VERDICT.md round 2, 'Next round' #1) must all sit in the round-3
    window: the 16 prep composites plus udtf_chunk_text."""
    names, _, _ = registry
    window = set(names[:_WINDOW_SIZE])
    never_certified = {
        "prep_training_mix",
        "text_bigram_coherence",
        "events_gap_fill",
        "sim_kmeans_train",
        "sql_recursive_backoff",
        "events_funnel",
        "events_anomaly",
        "orders_scd2",
        "events_variant_shred",
        "rollup_incremental",
        "group_median",
        "graph_pagerank",
        "dq_constraint_report",
        "cohort_retention",
        "train_test_split",
        "fuzzy_name_match",
        "udtf_chunk_text",
    }
    missing = never_certified - window
    assert not missing, f"never-certified entries out of window: {missing}"


def test_prep_cannot_overflow_window():
    """pipeline + prep + udtf_chunk_text must fit in the window with room
    for at least a few fills; if prep grows past this, split it or widen
    the structural design consciously."""
    from data_ingestion_api_system_spark.operators import pipeline, prep

    assert len(pipeline.QUERIES) + len(prep.QUERIES) + 1 <= _WINDOW_SIZE


def test_no_duplicate_names_and_oracle_subset(registry):
    names, queries, oracle = registry
    # names are dict keys (unique by construction), so compare the SUM of
    # per-module QUERIES sizes against the merged registry: a cross-module
    # name collision silently overwrites an entry and shrinks the merge
    # (round-3 ADVICE: the previous len==len(set) form was vacuous)
    from data_ingestion_api_system_spark.operators import (
        dedup,
        events,
        multimodal,
        pipeline,
        prep,
        rangejoin,
        relational,
        relational2,
        relational3,
        similarity,
        text,
        windows,
    )
    from data_ingestion_api_system_spark.streaming import jobs as streaming_jobs

    mods = (
        pipeline, prep, dedup, similarity, text, multimodal, rangejoin,
        streaming_jobs, events, windows, relational, relational2, relational3,
    )
    per_module_total = sum(len(m.QUERIES) for m in mods)
    assert per_module_total == len(queries), (
        f"cross-module QUERIES name collision: modules define "
        f"{per_module_total} entries but the merged registry has {len(queries)}"
    )
    assert set(oracle) <= set(queries)
    # every entry is either oracle-checked or deliberately rows-only;
    # keep the rows-only set explicit so additions are a conscious choice
    rows_only = set(queries) - set(oracle)
    assert rows_only <= {"approx_distinct_sketch"}, rows_only


def test_window_fill_names_exist(registry):
    """A typo in _WINDOW_FILL silently skips the name (the loop guards with
    `if name in queries`); catch it here instead."""
    _, queries, _ = registry
    unknown = [n for n in _WINDOW_FILL if n not in queries]
    assert not unknown, f"_WINDOW_FILL names not in registry: {unknown}"
