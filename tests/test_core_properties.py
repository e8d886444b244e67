"""Property tests for the core dataflow (SURVEY §5.2.3): random
(ids, priority, arrival) workloads through the REAL transforms, asserting
the invariants extracted from the reference (src/app.js:36-42, 122-138,
51/76/88):

- chunks partition the id list in order, each |chunk| ≤ 3
- dequeue order respects (priority_level DESC, created_at ASC, batch_seq)
- rollup matches a brute-force Python recomputation incl. vacuous-completed

hypothesis drives the workload shapes; one Spark round-trip per example is
slow, so examples are capped and deadlines disabled.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_api_system_spark.ingestion.core import (
    chunk_batches,
    ingestions_from_requests,
    priority_order,
    status_rollup,
    validate,
)
from data_ingestion_api_system_spark.schemas import (
    BATCH_SIZE,
    INGEST_REQUEST_SCHEMA,
    MAX_ID,
)

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

requests_strategy = st.lists(
    st.tuples(
        st.lists(st.integers(min_value=1, max_value=MAX_ID), max_size=11),
        st.sampled_from(["HIGH", "MEDIUM", "LOW"]),
        st.integers(min_value=0, max_value=5),  # arrival offset seconds
    ),
    min_size=1,
    max_size=6,
)


def _df(spark, workload):
    rows = [
        Row(
            request_id=i,
            ids=[int(x) for x in ids],
            priority=prio,
            arrival_ts=BASE_TS + timedelta(seconds=off),
        )
        for i, (ids, prio, off) in enumerate(workload)
    ]
    return spark.createDataFrame(rows, INGEST_REQUEST_SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(workload=requests_strategy)
def test_chunking_partitions_in_order(spark, workload):
    df = _df(spark, workload)
    valid, rejected = validate(df)
    assert rejected.count() == 0
    batches = chunk_batches(valid).collect()
    by_req: dict[int, list] = {}
    for b in sorted(batches, key=lambda r: (r.request_id, r.batch_seq)):
        assert 1 <= len(b.ids) <= BATCH_SIZE
        by_req.setdefault(b.request_id, []).extend(b.ids)
    for i, (ids, _, _) in enumerate(workload):
        assert by_req.get(i, []) == [int(x) for x in ids]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(workload=requests_strategy)
def test_queue_order_invariant(spark, workload):
    df = _df(spark, workload)
    valid, _ = validate(df)
    ordered = priority_order(chunk_batches(valid)).collect()
    keys = [
        (-r.priority_level, r.created_at, r.request_id, r.batch_seq) for r in ordered
    ]
    assert keys == sorted(keys)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    workload=requests_strategy,
    statuses=st.lists(st.sampled_from(["yet_to_start", "triggered", "completed"]), min_size=30, max_size=30),
)
def test_rollup_matches_bruteforce(spark, workload, statuses):
    df = _df(spark, workload)
    valid, _ = validate(df)
    ing = ingestions_from_requests(valid)
    batches = chunk_batches(valid).collect()
    assigned = [
        Row(**{**b.asDict(), "status": statuses[i % len(statuses)]})
        for i, b in enumerate(
            sorted(batches, key=lambda r: (r.request_id, r.batch_seq))
        )
    ]
    bdf = spark.createDataFrame(assigned, chunk_batches(valid).schema) if assigned else chunk_batches(valid)
    rolled = {r.ingestion_id: r for r in status_rollup(ing, bdf).collect()}
    # brute force
    per_ing: dict[str, list[str]] = {f"ing-{i}": [] for i in range(len(workload))}
    for b in assigned:
        per_ing[b.ingestion_id].append(b.status)
    assert set(rolled) == set(per_ing)
    for ing_id, sts in per_ing.items():
        if all(s == "completed" for s in sts):  # vacuously true when empty
            expect = "completed"
        elif any(s == "triggered" for s in sts):
            expect = "triggered"
        else:
            expect = "yet_to_start"
        assert rolled[ing_id].status == expect, (ing_id, sts)
        assert rolled[ing_id].n_batches == len(sts)


def test_validation_edge_cases(spark):
    rows = [
        Row(request_id=0, ids=[1, MAX_ID], priority="HIGH", arrival_ts=BASE_TS),
        Row(request_id=1, ids=[], priority="LOW", arrival_ts=BASE_TS),  # valid
        Row(request_id=2, ids=[0], priority="LOW", arrival_ts=BASE_TS),  # id < 1
        Row(request_id=3, ids=[MAX_ID + 1], priority="LOW", arrival_ts=BASE_TS),
        Row(request_id=4, ids=[1], priority="urgent", arrival_ts=BASE_TS),
        Row(request_id=5, ids=None, priority="LOW", arrival_ts=BASE_TS),
        Row(request_id=6, ids=[1, None, 3], priority="LOW", arrival_ts=BASE_TS),
    ]
    df = spark.createDataFrame(rows, INGEST_REQUEST_SCHEMA)
    valid, rejected = validate(df)
    assert sorted(r.request_id for r in valid.collect()) == [0, 1]
    assert sorted(r.request_id for r in rejected.collect()) == [2, 3, 4, 5, 6]
    # the empty-ids request produces zero batches but still rolls up 'completed'
    ing = ingestions_from_requests(valid)
    rolled = {
        r.ingestion_id: r.status
        for r in status_rollup(ing, chunk_batches(valid)).collect()
    }
    assert rolled["ing-1"] == "completed"
