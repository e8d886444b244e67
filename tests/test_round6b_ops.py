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


def test_perplexity_matches_pure_python_lm(spark):
    from data_ingestion_api_system_spark.operators.text import (
        q_text_perplexity_ngram,
    )
    from data_ingestion_api_system_spark.tables import load_table

    docs = {
        r.doc_id: r.text.lower().split()
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
