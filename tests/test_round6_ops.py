"""Edge-behavior pins for the round-6 operators (the oracle comparison
certifies whole-result equality; these tests isolate the edges that the
synthetic corpus may not exercise every round).

- text_cross_doc_spans: sub-span docs keep a row with zero counts; a span
  repeated INSIDE one doc doesn't make that doc 'shared' with itself.
- text_tfidf_topk: the per-doc cut is exactly TFIDF_TOPK and equal scores
  break ties by term ascending.
- window_time_range_frame: RANGE peers (duplicate timestamps) share one
  frame; events outside the 600 s horizon fall out.
- sim_pq_codes: a codebook seed vector assigns to itself with zero error.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_cross_doc_spans_row_universe_and_zero_span_docs(spark):
    from data_ingestion_api_system_spark.operators.text import (
        SPAN_N,
        q_text_cross_doc_spans,
    )
    from data_ingestion_api_system_spark.tables import load_table

    out = q_text_cross_doc_spans(spark, SF_DIR).toPandas()
    docs = load_table(spark, SF_DIR, "documents")
    # same row universe as the corpus (left join keeps span-less docs)
    assert len(out) == docs.count()
    short = docs.filter(
        F.size(F.split("text", r"\s+")) < SPAN_N
    ).count()
    zero = out[out.n_spans == 0]
    assert len(zero) >= short
    assert (zero.n_shared == 0).all() and (zero.boilerplate == 0).all()
    assert ((out.shared_frac >= 0) & (out.shared_frac <= 1)).all()


def test_cross_doc_spans_intra_doc_repeat_not_shared(spark):
    from data_ingestion_api_system_spark.operators.text import SPAN_N

    # doc 1 repeats one span twice internally; doc 2 shares nothing
    words = " ".join(["w%d" % i for i in range(SPAN_N)])
    df = spark.createDataFrame(
        [(1, f"{words} {words}", "en"), (2, "x " * (SPAN_N * 2), "en")],
        "doc_id long, text string, lang string",
    )
    from data_ingestion_api_system_spark.functions import tokens, word_ngrams

    spans = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams(F.transform(tokens("text"), F.lower), SPAN_N))
        ).alias("span"),
    )
    counts = spans.groupBy("span").agg(F.count("*").alias("n")).toPandas()
    # the internally-repeated span counts ONCE per doc (distinct before explode)
    assert (counts.n == 1).sum() >= 1


def test_tfidf_topk_cut_and_tiebreak(spark):
    from data_ingestion_api_system_spark.operators.text import (
        TFIDF_TOPK,
        q_text_tfidf_topk,
    )

    out = q_text_tfidf_topk(spark, SF_DIR).toPandas()
    per_doc = out.groupby("doc_id")["rank"].agg(["max", "count"])
    assert (per_doc["max"] <= TFIDF_TOPK).all()
    assert (per_doc["count"] <= TFIDF_TOPK).all()
    # within a doc, scores descend; equal scores order by term ascending
    for _, g in out.groupby("doc_id"):
        g = g.sort_values("rank")
        s = list(g.score)
        assert all(a >= b for a, b in zip(s, s[1:]))
        for (_, a), (_, b) in zip(g.iterrows(), g.iloc[1:].iterrows()):
            if a.score == b.score:
                assert a.term < b.term


def test_time_range_frame_peers_and_horizon(spark):
    from data_ingestion_api_system_spark.operators.windows import (
        q_window_time_range_frame,
    )
    import pandas as pd

    out = q_window_time_range_frame(spark, SF_DIR).toPandas()
    # brute-force recheck for the busiest user
    busiest = out.user_id.value_counts().index[0]
    g = out[out.user_id == busiest]
    for _, row in g.sample(n=min(25, len(g)), random_state=0).iterrows():
        in_frame = g[
            (g.epoch_us <= row.epoch_us)
            & (g.epoch_us >= row.epoch_us - 600_000_000)
        ]
        assert row.n_10min == len(in_frame), (row.event_id, busiest)
    # peers: duplicate epoch rows agree on the full frame aggregate
    dup = g[g.duplicated("epoch_us", keep=False)]
    if len(dup):
        agree = dup.groupby("epoch_us")[["n_10min", "sum_value_10min"]].nunique()
        assert (agree == 1).all().all()
    assert isinstance(out, pd.DataFrame)


def test_pq_seed_vectors_self_assign(spark):
    from data_ingestion_api_system_spark.operators.similarity import (
        PQ_CODES,
        q_sim_pq_codes,
    )

    out = q_sim_pq_codes(spark, SF_DIR).toPandas()
    seeds = out[out.vec_id < PQ_CODES].sort_values("vec_id")
    for _, row in seeds.iterrows():
        assert row.codes_csv == ",".join([str(int(row.vec_id))] * 4)
        assert row.quant_error == 0.0
    # every corpus vector got a full code tuple
    assert (out.codes_csv.str.count(",") == 3).all()
    assert (out.quant_error >= 0).all()


def test_histogram_sketch_brackets_exact_quantiles(spark):
    """The sketch's guarantee: the reported upper-edge estimate is >= the
    exact q-quantile and within one bin width of it (DuckDB computes the
    exact discrete quantile on the same file)."""
    import duckdb

    from data_ingestion_api_system_spark.operators.relational2 import (
        HIST_W,
        q_sketch_histogram_quantiles,
    )

    out = q_sketch_histogram_quantiles(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    for _, row in out.iterrows():
        exact = con.execute(
            f"SELECT quantile_disc(l_extendedprice, {row.q}) FROM lineitem"
        ).fetchone()[0]
        assert row.quantile_est >= exact - 1e-9, (row.q, exact, row.quantile_est)
        assert row.quantile_est - exact <= HIST_W + 1e-9, (row.q, exact)
    con.close()
    # cumulative counts are sane: rank target met, total consistent
    assert (out.cum_at_bin >= out.target_rank).all()
    assert out.n_total.nunique() == 1


def test_dsir_probe_exclusion_and_positive_weights(spark):
    from data_ingestion_api_system_spark.operators.selection import (
        DECON_PROBE_MOD,
        q_prep_dsir_weights,
    )

    out = q_prep_dsir_weights(spark, SF_DIR).toPandas()
    # the probe (target) slice never appears in the scored corpus
    assert not (out.doc_id % DECON_PROBE_MOD == 0).any()
    assert (out.importance > 0).all()
    # this corpus has no gram-less docs, so every row carries evidence
    assert (out.n_grams > 0).all()
    assert (out.num >= out.n_grams).all() and (out.den >= out.n_grams).all()
