"""Edge-behavior pins for the second batch of round-6 operators.

- sketch_bloom_membership: the Bloom guarantee — NO false negatives (every
  true member tests positive), so n_positive - n_false_pos == n_members
  exactly per segment; positions land in [0, 65536).
- sim_recall_eval: the exact side always yields k rows per query; the ANN
  side never exceeds k; hits are bounded by both and recall is their ratio.
- text_perplexity_ngram: the full per-doc score re-derived by an
  independent pure-Python bigram LM (collections.Counter) matches the
  distributed plan to the rounding contract — catches any drift in the
  smoothing arithmetic, the vocabulary scalar, or the instance-weighted
  averaging.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_position_range(spark):
    from data_ingestion_api_system_spark.operators.relational2 import (
        BLOOM_K,
        _bloom_positions,
        q_sketch_bloom_membership,
    )

    out = q_sketch_bloom_membership(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # Bloom guarantee: every member is positive, so the positives are
    # exactly the members plus the false positives — no false negatives.
    assert (out.n_positive - out.n_false_pos == out.n_members).all()
    assert (out.n_probes >= out.n_members).all()
    assert ((out.fp_rate >= 0) & (out.fp_rate <= 1)).all()

    pos = (
        spark.range(1, 1001)
        .select(F.explode(F.array(*_bloom_positions(F.col("id")))).alias("p"))
        .agg(F.min("p"), F.max("p"), F.count("*"))
        .first()
    )
    assert pos[0] >= 0 and pos[1] < 65536 and pos[2] == 1000 * BLOOM_K


def test_recall_eval_bounds(spark):
    from data_ingestion_api_system_spark.operators.similarity import (
        RECALL_K,
        RECALL_QUERIES,
        q_sim_recall_eval,
    )

    out = q_sim_recall_eval(spark, SF_DIR).toPandas()
    assert len(out) == RECALL_QUERIES
    assert (out.n_exact == RECALL_K).all()
    assert (out.n_ann <= RECALL_K).all()
    assert (out.n_hits <= out.n_ann).all() and (out.n_hits <= out.n_exact).all()
    assert (
        out.recall_at_5 == (out.n_hits / RECALL_K).round(6)
    ).all()


def test_bloom_synthetic_membership_properties(spark):
    """Structural Bloom properties on a synthetic key universe (the corpus
    test can't force false positives; a 200-member filter probed with 5000
    keys does): members are ALWAYS positive, and every reported positive's
    positions are a subset of the bit set (internal consistency)."""
    from data_ingestion_api_system_spark.operators.relational2 import (
        _bloom_positions,
    )

    members = spark.range(0, 200).select(F.col("id").alias("k"))
    probes = spark.range(0, 5000).select(F.col("id").alias("k"))
    bits = {
        r.p
        for r in members.select(
            F.explode(F.array(*_bloom_positions(F.col("k")))).alias("p")
        ).collect()
    }
    rows = probes.select(
        "k", F.array(*_bloom_positions(F.col("k"))).alias("ps")
    ).collect()
    positive = {r.k for r in rows if all(p in bits for p in r.ps)}
    assert set(range(200)) <= positive  # no false negatives, ever
    fps = positive - set(range(200))
    # 800 bits set of 65536, k=4 → FP rate ≈ (800/65536)^4 ≈ 2e-8; a
    # generous ceiling still catches a broken hash (which would collapse
    # positions and flood positives)
    assert len(fps) < 50


def test_markov_rows_normalize_and_conserve_transitions(spark):
    from data_ingestion_api_system_spark.operators.events import (
        q_events_markov_transitions,
    )
    from data_ingestion_api_system_spark.tables import load_table

    out = q_events_markov_transitions(spark, SF_DIR).toPandas()
    ev = load_table(spark, SF_DIR, "events")
    n_types = ev.select("event_type").distinct().count()
    assert len(out) <= n_types * n_types
    # each row of the matrix is a probability distribution
    sums = out.groupby("from_type").prob.sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    # every event except each user's first contributes exactly one transition
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert out.n_transitions.sum() == n_events - n_users


def test_basket_pair_expansion_and_lift_identity(spark):
    from data_ingestion_api_system_spark.operators.relational3 import (
        q_basket_brand_pairs,
    )

    # the narrow index-pair expansion enumerates exactly C(n,2) ordered
    # pairs — using the operator's own expression, not an inline copy
    from data_ingestion_api_system_spark.operators.relational3 import _PAIR_EXPAND

    df = spark.createDataFrame([(1, ["A", "B", "C", "D"])], "k long, brands array<string>")
    pairs = df.select(F.explode(F.expr(_PAIR_EXPAND)).alias("p")).collect()
    got = {(r.p.a, r.p.b) for r in pairs}
    assert got == {
        ("A", "B"), ("A", "C"), ("A", "D"),
        ("B", "C"), ("B", "D"), ("C", "D"),
    }

    out = q_basket_brand_pairs(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.brand_a < out.brand_b).all()
    assert ((out.support > 0) & (out.support <= 1)).all()
    assert ((out.conf_a_to_b > 0) & (out.conf_a_to_b <= 1)).all()
    # lift = conf(a→b)·conf(b→a)/support (algebraic identity of the three
    # reported ratios); holds within the 6dp rounding of each factor
    expected_lift = out.conf_a_to_b * out.conf_b_to_a / out.support
    assert ((out.lift - expected_lift).abs() < 5e-3).all()


def test_triangle_count_invariants_and_k4(spark):
    from data_ingestion_api_system_spark.operators.relational3 import (
        q_graph_triangle_count,
    )

    out = q_graph_triangle_count(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # every triangle contributes exactly 3 corner rows
    assert out.n_triangles.sum() % 3 == 0
    assert ((out.clustering_coeff >= 0) & (out.clustering_coeff <= 1)).all()
    assert (out.degree >= 1).all()

    # orientation method on a known graph: K4 has 4 triangles, each node
    # in 3 — against the OPERATOR's own join helper, not a copy
    from data_ingestion_api_system_spark.operators.relational3 import _triangles

    edges = spark.createDataFrame(
        [(a, b) for a in "ABCD" for b in "ABCD" if a < b], "a string, b string"
    )
    tri = _triangles(edges)
    assert tri.count() == 4  # each triangle enumerated exactly once


def test_rfm_bucket_balance_and_segment_format(spark):
    from data_ingestion_api_system_spark.operators.events import (
        q_events_rfm_segmentation,
    )
    from data_ingestion_api_system_spark.tables import load_table

    out = q_events_rfm_segmentation(spark, SF_DIR).toPandas()
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert len(out) == n_users
    for col in ("r_score", "f_score", "m_score"):
        assert out[col].between(1, 5).all()
        sizes = out[col].value_counts()
        assert sizes.max() - sizes.min() <= 1  # ntile balance
    expected = "R" + out.r_score.astype(str) + "F" + out.f_score.astype(str) \
        + "M" + out.m_score.astype(str)
    assert (out.segment == expected).all()


def test_pair_expansion_matches_combinations_randomized(spark):
    """The narrow index-pair expansion equals itertools.combinations for
    every sorted-distinct list — 40 seeded-random baskets (sizes 0-25)
    checked in one DataFrame pass."""
    import itertools
    import random

    from data_ingestion_api_system_spark.operators.relational3 import (
        _PAIR_EXPAND,
    )

    rng = random.Random(42)
    universe = [f"B{i:02d}" for i in range(25)]
    baskets = {
        k: sorted(rng.sample(universe, rng.randint(0, 25)))
        for k in range(40)
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in baskets.items()], "k long, brands array<string>"
    )
    rows = df.select(
        "k", F.explode(F.expr(_PAIR_EXPAND)).alias("p")
    ).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r.k, set()).add((r.p.a, r.p.b))
    for k, brands in baskets.items():
        assert got.get(k, set()) == set(itertools.combinations(brands, 2)), k


def test_weighted_sample_key_formula_and_determinism(spark):
    import hashlib

    from data_ingestion_api_system_spark.operators.text import (
        WEIGHTED_SAMPLE_K,
        q_text_weighted_sample,
    )

    out = q_text_weighted_sample(spark, SF_DIR).toPandas()
    assert len(out) == WEIGHTED_SAMPLE_K
    assert (out.sample_key <= 0).all()  # ln(u)/w with u in (0,1]
    # exact key re-derivation for every sampled row
    for row in out.itertuples():
        m = int(hashlib.md5(str(row.doc_id).encode()).hexdigest()[:12], 16)
        u = (m + 1) / 2**48
        expected = round(math.log(u) / row.n_tokens, 8)
        assert abs(row.sample_key - expected) < 2e-8, row.doc_id
    # rerun-stable (deterministic hash draw, no rand())
    again = q_text_weighted_sample(spark, SF_DIR).toPandas()
    assert (out.doc_id.values == again.doc_id.values).all()


def test_inverted_index_posting_invariants(spark):
    from data_ingestion_api_system_spark.operators.text import (
        INDEX_MIN_DF,
        INDEX_POSTINGS_CAP,
        q_text_inverted_index,
    )

    out = q_text_inverted_index(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.df >= INDEX_MIN_DF).all()
    assert (out.n_occurrences >= out.df).all()
    for row in out.itertuples():
        postings = [int(p) for p in row.postings_csv.split(",")]
        assert len(postings) == min(row.df, INDEX_POSTINGS_CAP)
        assert postings == sorted(postings)
        assert len(set(postings)) == len(postings)


def test_perplexity_matches_pure_python_lm(spark):
    from data_ingestion_api_system_spark.operators.text import (
        q_text_perplexity_ngram,
    )
    from data_ingestion_api_system_spark.tables import load_table

    # mirror the operator's tokenization exactly: the JVM regex \s+ is
    # ASCII-only, while Python str.split() (and default-re \s) also split
    # on Unicode whitespace — use ASCII-flagged re.split + empty filter so
    # this re-derivation cannot diverge on non-ASCII whitespace
    docs = {
        r.doc_id: [
            t
            for t in re.split(r"\s+", r.text.lower(), flags=re.ASCII)
            if t
        ]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    vocab = {w for toks in docs.values() for w in toks}
    c1: Counter = Counter()
    c2: Counter = Counter()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c1[a] += 1
            c2[(a, b)] += 1
    expected = {}
    for doc_id, toks in docs.items():
        if len(toks) < 2:
            continue
        lps = [
            round(math.log((c2[(a, b)] + 1) / (c1[a] + len(vocab))), 6)
            for a, b in zip(toks, toks[1:])
        ]
        avg = round(sum(lps) / len(lps), 6)
        expected[doc_id] = (len(lps), avg, round(math.exp(-avg), 4))

    out = q_text_perplexity_ngram(spark, SF_DIR).toPandas()
    assert len(out) == len(expected)
    for row in out.itertuples():
        n, avg, ppl = expected[row.doc_id]
        assert row.n_bigrams == n
        assert abs(row.avg_logprob - avg) < 2e-6, row.doc_id
        assert abs(row.ppl - ppl) < 2e-4, row.doc_id
        assert row.avg_logprob < 0 and row.ppl > 1
