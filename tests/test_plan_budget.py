"""The plan-budget gate (tools/plan_budget.py) counts physical nodes from
explain("formatted") detail headers — these tests pin the parser against
both a synthetic plan string and a real plan built by the session, so a
Spark upgrade that reshapes explain output breaks loudly here instead of
silently zeroing the committed budget."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_budget import CONTEXT_KEYS, COST_KEYS, count_plan  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

SYNTHETIC = """== Physical Plan ==
AdaptiveSparkPlan (9)
+- HashAggregate (8)

(1) Scan parquet
Output [2]: [a#1L, b#2]
ReadSchema: struct<a:bigint,b:double>

(2) Exchange
Input [2]: [a#1L, b#2]
Arguments: hashpartitioning(a#1L, 32), ENSURE_REQUIREMENTS, [plan_id=1]

(3) Sort [codegen id : 2]
Arguments: [a#1L ASC NULLS FIRST], false, 0

(4) SortMergeJoin
Left keys [1]: [a#1L]

(5) Exchange
Arguments: rangepartitioning(a#1L ASC NULLS FIRST, 32), ENSURE_REQUIREMENTS

(6) Exchange
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]

(7) BroadcastExchange
Arguments: HashedRelationBroadcastMode(List(input[0, bigint, true]),false)

(8) BroadcastHashJoin
Left keys [1]: [a#1L]

(9) ArrowEvalPython
Arguments: [f(b#2)], [out#9], 200

(10) Window
Arguments: [rank(b#2) windowspecdefinition(a#1L, b#2 ASC NULLS FIRST, ...)]

(11) WindowGroupLimit
Arguments: [a#1L], [b#2 ASC NULLS FIRST], row_number(), 20, Partial
"""


def test_count_plan_synthetic():
    c = count_plan(SYNTHETIC)
    assert c["shuffle_hash"] == 1
    assert c["shuffle_range"] == 1
    assert c["shuffle_single"] == 1
    assert c["smj"] == 1
    assert c["bhj"] == 1
    assert c["broadcast_exchange"] == 1
    assert c["python_eval"] == 1
    assert c["sort"] == 1
    assert c["window"] == 1
    assert c["wgl"] == 1  # WindowGroupLimit is context (an optimization)
    assert c["scan"] == 1
    assert c["cartesian"] == 0


def test_count_plan_real_join(spark):
    """A real broadcast-join + groupBy plan must count >=1 shuffle_hash
    (the aggregation exchange), >=1 bhj, and 0 cartesian/python."""
    from pyspark.sql import functions as F

    from data_ingestion_api_system_spark.plans import formatted_plan

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    df = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    c = count_plan(formatted_plan(df))
    assert c["bhj"] == 2
    assert c["shuffle_hash"] >= 1
    assert c["cartesian"] == 0 and c["python_eval"] == 0
    assert c["scan"] == 3


def test_committed_budget_covers_registry():
    """PLAN_BUDGET.json must name exactly the registry's entries — a new
    operator landing without a --record leaves it unguarded, and a stale
    name means the record predates a rename. (Counter VALUES are checked
    by the round-end `plan_budget.py` compare, which builds real plans;
    this pin is the cheap structural half that runs in every suite.)"""
    import json

    from data_ingestion_api_system_spark.operators import collect_queries

    budget = json.loads(
        (Path(__file__).resolve().parent.parent / "PLAN_BUDGET.json").read_text()
    )
    meta = budget.pop("_meta")
    registry = set(collect_queries()[0])
    assert set(budget) == registry
    assert meta["n"] == len(registry)
    for counters in budget.values():
        assert set(counters) == set(COST_KEYS) | set(CONTEXT_KEYS)


def test_count_entry_isolated_from_prior_cache_state(spark):
    """VERDICT r13 #1: the ledger's counts must not depend on which entries
    were planned earlier in the same session. Before the count_entry
    isolation, a pin()-heavy earlier entry left persisted subtrees in the
    session cache; the cache manager substituted them into later plans and
    their InMemoryRelation build sections inflated the later entry's node
    counts (dedup_lsh_tuning_sweep counted 2 RoundRobin exchanges in the
    shared session vs 1 fresh). Pin it: count the sweep, deliberately plan
    the pin-heavy sibling in between, count the sweep again — identical."""
    import __spark_entry__ as entrymod
    from plan_budget import count_entry

    q = entrymod.queries()
    first = count_entry(spark, q["dedup_lsh_tuning_sweep"], SF_DIR)
    count_entry(spark, q["dedup_lsh_verified"], SF_DIR)  # contamination source
    second = count_entry(spark, q["dedup_lsh_tuning_sweep"], SF_DIR)
    assert second == first


def test_cost_keys_cover_all_join_shuffle_kinds():
    # the gate's contract: every scale-negative operator class is a cost key
    for k in ("cartesian", "bnlj", "smj", "shj", "python_eval",
              "shuffle_hash", "shuffle_range", "shuffle_single",
              "shuffle_rr", "sort", "window"):
        assert k in COST_KEYS
