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
    all_query_modules,
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


def test_window_holds_r5_must_certify(registry):
    """The round-5 must-certify set (VERDICT.md round 4, 'Next round' #5):
    everything the events ts-loader regression broke — the driver itself has
    to re-green these, not just tools/check_oracle.py — plus the batch
    events family whose last driver row is r1/r2."""
    names, _, _ = registry
    window = set(names[:_WINDOW_SIZE])
    must_certify = {
        # streaming formalisms, silently corrupted in r4
        "streaming_tumbling_window",
        "streaming_session_window",
        "streaming_dedup",
        "streaming_stream_join",
        # in-window ERR in r4 (fill entries; the 8 prep events composites
        # are covered by test_window_holds_pipeline_and_all_of_prep)
        "asof_join_attribution",
        "salted_aggregation",
        # batch events family — loader victims, stale since r1/r2
        "events_tumbling_window",
        "events_sliding_window",
        "events_type_stats",
        "events_sessionize",
        "events_json_extract",
        "window_running_sum",
    }
    missing = must_certify - window
    assert not missing, f"r5 must-certify entries out of window: {missing}"


def test_prep_cannot_overflow_window():
    """pipeline + prep must fit in the window with room for at least a few
    fills; if prep grows past this, split it or widen the structural design
    consciously."""
    from data_ingestion_api_system_spark.operators import pipeline, prep

    assert len(pipeline.QUERIES) + len(prep.QUERIES) + 10 <= _WINDOW_SIZE


def test_no_duplicate_names_and_oracle_subset(registry):
    names, queries, oracle = registry
    # names are dict keys (unique by construction), so compare the SUM of
    # per-module QUERIES sizes against the merged registry: a cross-module
    # name collision silently overwrites an entry and shrinks the merge.
    # The module list comes from all_query_modules() — the same tuple
    # collect_queries() merges — so this test cannot drift from the real
    # merge list (round-4 ADVICE).
    mods = all_query_modules()
    per_module_total = sum(len(m.QUERIES) for m in mods)
    assert per_module_total == len(queries), (
        f"cross-module QUERIES name collision: modules define "
        f"{per_module_total} entries but the merged registry has {len(queries)}"
    )
    # same check for ORACLE: an ORACLE-only collision (module defining
    # ORACLE[name] for another module's query) silently overwrites that
    # query's oracle SQL while still passing the subset check (round-4
    # ADVICE)
    per_module_oracle = sum(len(m.ORACLE) for m in mods)
    assert per_module_oracle == len(oracle), (
        f"cross-module ORACLE name collision: modules define "
        f"{per_module_oracle} oracle entries but the merged dict has {len(oracle)}"
    )
    assert set(oracle) <= set(queries)
    # every entry is either oracle-checked or deliberately rows-only;
    # keep the rows-only set explicit so additions are a conscious choice
    rows_only = set(queries) - set(oracle)
    assert rows_only <= {"approx_distinct_sketch"}, rows_only


def test_all_query_modules_have_dicts():
    """Every merged module must expose both QUERIES and ORACLE (a module
    missing ORACLE would raise inside collect_queries; assert the shape
    explicitly so the error names the module)."""
    for mod in all_query_modules():
        assert isinstance(getattr(mod, "QUERIES", None), dict), mod.__name__
        assert isinstance(getattr(mod, "ORACLE", None), dict), mod.__name__


def test_window_fill_names_exist(registry):
    """A typo in _WINDOW_FILL silently skips the name (the loop guards with
    `if name in queries`); catch it here instead."""
    _, queries, _ = registry
    unknown = [n for n in _WINDOW_FILL if n not in queries]
    assert not unknown, f"_WINDOW_FILL names not in registry: {unknown}"
