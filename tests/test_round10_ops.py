"""Round-10 hardening tests.

1. The max-degree gate on the common-neighbors hub cap (VERDICT r9 #2):
   the full-adjacency partitioned row_number is only paid when the graph
   actually has a hub over CN_DEGREE_CAP.
2. The events_markov_stationary zero-mass completeness fix (ADVICE r9):
   source-only / sink-only states appear with explicit zero mass instead
   of silently vanishing from the inner-join chain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_api_system_spark.operators.relational3 import (
    CN_DEGREE_CAP,
    _adj_for_wedges,
)


def _symmetrize(edges):
    out = []
    for a, b in edges:
        out.append((a, b))
        out.append((b, a))
    return out


def test_adj_gate_skips_window_below_cap(spark):
    """Max degree under the cap → the raw adjacency passes through with
    NO Window in the physical plan (the row_number sort is skipped)."""
    edges = [(1, 2), (1, 3), (2, 3), (4, 1)]
    adj = spark.createDataFrame(_symmetrize(edges), "src int, dst int")
    deg = adj.groupBy("src").agg(F.count("*").cast("bigint").alias("degree"))
    out = _adj_for_wedges(adj, deg, cap=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert sorted((r.src, r.dst) for r in out.collect()) == sorted(
        (r.src, r.dst) for r in adj.collect()
    )


def test_adj_gate_caps_above_cap(spark):
    """A single hub over the cap re-enables the capped path — per-dst
    fan-in bounded by cap, deterministic smallest-src survivors."""
    cap = 8
    hub_deg = 40
    edges = [(0, i) for i in range(1, hub_deg + 1)]
    adj = spark.createDataFrame(_symmetrize(edges), "src int, dst int")
    deg = adj.groupBy("src").agg(F.count("*").cast("bigint").alias("degree"))
    out = _adj_for_wedges(adj, deg, cap=cap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    kept_for_hub = sorted(r.src for r in out.filter(F.col("dst") == 0).collect())
    assert kept_for_hub == list(range(1, cap + 1))


def test_markov_stationary_zero_mass_states(spark, tmp_path):
    """ADVICE r9: a sink-only state (never a from_type) and a source-only
    state (never a to_type) must appear with explicit zero mass, not
    vanish from an inner-join chain. One user, sequence a→b→b, plus a
    lone user whose single event c produces no transition at all:
    from = {a, b}, to = {b}; c has no pair row and is correctly absent,
    while a (source-only) and b (sink, self-loop aside) both appear."""
    import datetime

    import pandas as pd

    from data_ingestion_api_system_spark.operators.events import (
        q_events_markov_stationary,
    )

    t0 = datetime.datetime(2024, 1, 1)
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [t0, t0 + datetime.timedelta(minutes=1),
                   t0 + datetime.timedelta(minutes=2), t0],
            "user_id": [1, 1, 1, 2],
            "event_type": ["a", "b", "b", "c"],
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)
    out = {r.event_type: r for r in q_events_markov_stationary(spark, str(sf)).collect()}
    # universe = from ∪ to = {a, b}; uniform v0 = 500000 each
    assert set(out) == {"a", "b"}
    a, b = out["a"], out["b"]
    assert a.mass_v0 == 500_000 and b.mass_v0 == 500_000
    # a is source-only: zero incoming mass at every later step
    assert a.mass_v1 == 0 and a.mass_v2 == 0 and a.step_delta == 0
    # b absorbs: a's 500k (a→b p=1.0) + its own self-loop (b→b p=1.0)
    assert b.mass_v1 == 1_000_000 and b.mass_v2 == 1_000_000


def test_adj_gate_empty_graph(spark):
    """Empty adjacency → empty degree table → gate must not crash on the
    missing max scalar and must return the (empty) raw adjacency."""
    adj = spark.createDataFrame([], "src int, dst int")
    deg = adj.groupBy("src").agg(F.count("*").cast("bigint").alias("degree"))
    out = _adj_for_wedges(adj, deg, cap=CN_DEGREE_CAP)
    assert out.count() == 0
