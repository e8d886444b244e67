"""Round-10 hardening tests.

1. The max-degree gate on the common-neighbors hub cap (VERDICT r9 #2):
   the full-adjacency partitioned row_number is only paid when the graph
   actually has a hub over CN_DEGREE_CAP.
2. The events_markov_stationary zero-mass completeness fix (ADVICE r9):
   source-only / sink-only states appear with explicit zero mass instead
   of silently vanishing from the inner-join chain.
3. exact_avg_halfup boundary laws (the sf0.1 gate catch): Spark ==
   DuckDB == integer half-away model, including constructed exact
   .5e-6-boundary means.
4. Partition-invariance sample: a cross-family entry sample must produce
   identical output under 2-vs-64 shuffle partitions and 128MB-vs-4MB
   scan splits (the suite-resident twin of tools/invariance_check.py).
"""

from __future__ import annotations

import pytest
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


# ---------------------------------------------------------------------------
# 3. exact_avg_halfup boundary law (the round-10 sf0.1 gate catch): the
#    Spark expression, its DuckDB twin, and a Fraction-exact
#    half-away-from-zero model agree on arbitrary 6-decimal inputs —
#    INCLUDING means that land exactly on a .5e-6 rounding boundary, where
#    plain exact_avg's round-of-double diverged between the engines
#    (text_perplexity_ngram, 2 rows at sf0.1).
# ---------------------------------------------------------------------------


def _halfaway_mean_micros(micros: list[int]) -> float:
    """Fraction-free exact model: half-away-from-zero(Σ/n) at 1e-6 scale,
    as pure integers — the same construction both engines implement."""
    a, n = sum(micros), len(micros)
    sign = -1 if a < 0 else 1
    return sign * ((2 * abs(a) + n) // (2 * n)) / 1e6


def _engines_halfup_mean(spark, micros: list[int]) -> tuple[float, float]:
    import duckdb
    import pandas as pd

    from data_ingestion_api_system_spark.functions import (
        exact_avg_halfup,
        sql_exact_avg_halfup,
    )

    pdf = pd.DataFrame({"v": [m / 1e6 for m in micros]})
    sdf = spark.createDataFrame(pdf)
    [srow] = sdf.agg(exact_avg_halfup("v", scale=6).alias("m")).collect()
    con = duckdb.connect()
    con.register("t", pdf)
    [drow] = con.sql(
        f"SELECT {sql_exact_avg_halfup('v', scale=6)} AS m FROM t"
    ).fetchall()
    con.close()
    return srow.m, drow[0]


def test_exact_avg_halfup_exact_boundary_cases(spark):
    """Constructed exact .5e-6-boundary means: n=2 with odd micro sums sit
    EXACTLY on the half boundary (the case round-of-double cannot decide
    portably); both engines must round away from zero, both signs, plus
    the n=361 shape the sf0.1 gate actually caught."""
    cases = [
        [1, 0],            # mean = +0.5e-6 -> +1e-6
        [-1, 0],           # mean = -0.5e-6 -> -1e-6
        [3, 0],            # mean = +1.5e-6 -> +2e-6
        [-3, 0],           # mean = -1.5e-6 -> -2e-6
        [25, 25, 26],      # non-boundary control
        # magnitude of the observed sf0.1 flip (avg_logprob ~ -3.39) on a
        # GENUINE half boundary (even n): mean = -3388329.5e-6 exactly.
        # NB with odd n (the real doc had 361 bigrams) an integral micro
        # sum can never land exactly on .5 — the production failure was
        # plain exact_avg's round-of-double diverging NEAR the boundary
        # (Spark rounds the shortest decimal repr, DuckDB the full binary
        # expansion); the integer construction under test here has no
        # double round at all, which is the point.
        [-3388329, -3388330],
        # odd-n control at the same magnitude (exact thirds, no boundary)
        [-3388329, -3388330, -3388331],
    ]
    for micros in cases:
        s, d = _engines_halfup_mean(spark, micros)
        m = _halfaway_mean_micros(micros)
        assert s == d == m, (micros[:3], len(micros), s, d, m)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        micros=st.lists(
            st.integers(min_value=-10_000_000, max_value=10_000_000),
            min_size=1,
            max_size=40,
        )
    )
    def test_exact_avg_halfup_matches_model(spark, micros):
        """Random 6-decimal inputs: Spark == DuckDB == integer model."""
        s, d = _engines_halfup_mean(spark, micros)
        m = _halfaway_mean_micros(micros)
        assert s == d == m
except ImportError:  # pragma: no cover - hypothesis is baked in
    # an explicitly-skipped placeholder (ADVICE r10): if hypothesis ever
    # disappears, the lost property coverage must show as a SKIP in the
    # run, not silently vanish. Module-level importorskip would be wrong
    # here — it would skip this whole file's unrelated tests too.
    @pytest.mark.skip(reason="hypothesis not installed — property test lost")
    def test_exact_avg_halfup_matches_model(spark):  # type: ignore[misc]
        raise AssertionError("unreachable: test is skipped")


# ---------------------------------------------------------------------------
# 4. Partition-invariance sample (the continuous twin of
#    tools/invariance_check.py, which certified all 206 entries at sf0.01
#    in round 10): a cross-family sample re-runs per suite execution so a
#    new order-dependence (float-sum ordering, unordered first/last,
#    monotonically_increasing_id leakage, range-partitioner boundaries)
#    cannot land silently. Entries chosen for having the riskiest shapes:
#    a range-exchange global ntile, an unrolled iterative plan, a window
#    chain, a grid explode + LOCF window, and a banded-LSH shuffle.
# ---------------------------------------------------------------------------

_INVARIANCE_SAMPLE = [
    "prep_curriculum_order",   # global_ntile range exchange + m_i_id ordering
    "graph_kcore_peel",        # unrolled peel, per-round pins
    "window_running_sum",      # window frame chain
    "events_gap_fill",         # grid explode + LOCF last(ignorenulls)
    "dedup_minhash_lsh",       # banded signature shuffle
]


def test_partition_invariance_sample(spark):
    import importlib.util
    from pathlib import Path

    from data_ingestion_api_system_spark.operators import release_pins

    root = Path(__file__).resolve().parent.parent

    def load_tool(modname, path):
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    check_oracle = load_tool("check_oracle", root / "tools" / "check_oracle.py")
    # reuse the certification tool's OWN config pairs so this suite-resident
    # twin cannot drift from what tools/invariance_check.py certifies
    invariance = load_tool(
        "invariance_check", root / "tools" / "invariance_check.py"
    )
    entrymod = load_tool("entrymod", root / "__spark_entry__.py")
    qs = entrymod.queries()

    sf_dir = "/root/testdata/sf0.001"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in _INVARIANCE_SAMPLE:
            results = []
            for shuffle, split in invariance.CONFIGS:
                release_pins()
                spark.catalog.clearCache()
                spark.conf.set("spark.sql.shuffle.partitions", shuffle)
                spark.conf.set("spark.sql.files.maxPartitionBytes", split)
                results.append(check_oracle.normalize(qs[name](spark, sf_dir).toPandas()))
            (cols_a, rows_a), (cols_b, rows_b) = results
            assert cols_a == cols_b, name
            assert rows_a == rows_b, (name, len(rows_a), len(rows_b))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
