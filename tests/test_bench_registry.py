"""Bench-set invariants (VERDICT r9 #3): since round 10 the bench covers
the ENTIRE registry, so a round-over-round regression in any entry is
visible. These are pure-Python set checks — no Spark session needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _all_benched() -> list[str]:
    return (
        bench.HEADLINE
        + bench.ADDED_R7
        + bench.ADDED_R8
        + bench.ADDED_R9
        + bench.ADDED_R10
        + bench.ADDED_R11
        + bench.ADDED_R12
        + bench.ADDED_R13
        + bench.ADDED_R14
    )


def test_bench_lists_have_no_duplicates():
    names = _all_benched()
    assert len(names) == len(set(names)), sorted(
        n for n in set(names) if names.count(n) > 1
    )


def test_bench_covers_full_registry():
    """Every queries() entry has a bench series and no bench name is
    stale (points at a removed entry)."""
    from data_ingestion_api_system_spark.operators import collect_queries

    registry = set(collect_queries()[0])
    benched = set(_all_benched())
    assert benched - registry == set(), "bench names not in registry"
    assert registry - benched == set(), (
        "registry entries without a bench series — add new operators to a "
        "bench cohort when they land"
    )
