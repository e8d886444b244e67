"""Round-12 newborn re-derivations (growth 3 ≤ 5 per VERDICT r11 #5).

Each new registry entry gets its standard third source: the full
computation re-derived in pure Python from the parquet (no SQL engine in
the loop) and compared row-for-row against the Spark query. The Zipf OLS
mirrors the module ln discipline (round-half-up to 6 decimals, exact
Decimal sums, float arithmetic only in the final closed form); the Gini
re-derivation takes the per-user totals from DuckDB's pinned exact-sum
fragment and rebuilds the rank estimator; the RRF re-derivation rebuilds
both cosine rankings with the engines' sequential left-to-right fold.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from data_ingestion_api_system_spark.operators.events import (
    q_events_gini_concentration,
)
from data_ingestion_api_system_spark.operators.similarity import (
    FUSED_TOPK,
    FUSION_POOL,
    MATRYOSHKA_PREFIX,
    RECALL_QUERIES,
    RRF_K,
    q_sim_rank_fusion,
)
from data_ingestion_api_system_spark.operators.text import q_text_zipf_fit

SF_DIR = "/root/testdata/sf0.001"

_Q6 = Decimal("0.000001")


def _ln6(v: float) -> Decimal:
    return Decimal(repr(math.log(v))).quantize(_Q6, rounding=ROUND_HALF_UP)


def test_zipf_fit_matches_pure_python(spark):
    rows = {r.lang: r for r in q_text_zipf_fit(spark, SF_DIR).collect()}
    docs = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    freqs: dict[str, dict[str, int]] = {}
    for lang, text in docs:
        d = freqs.setdefault(lang, {})
        for w in text.split():
            w = w.lower()
            d[w] = d.get(w, 0) + 1
    for lang, d in freqs.items():
        ranked = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        n = len(ranked)
        sx = sy = sxy = sxx = Decimal(0)
        for i, (_, f) in enumerate(ranked, 1):
            x, y = _ln6(float(i)), _ln6(float(f))
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
        nf, sxf, syf, sxyf, sxxf = (
            float(n), float(sx), float(sy), float(sxy), float(sxx),
        )
        det = nf * sxxf - sxf * sxf
        slope = round((nf * sxyf - sxf * syf) / det, 6)
        intercept = round((sxxf * syf - sxf * sxyf) / det, 6)
        r = rows[lang]
        assert r.n_vocab == n
        assert r.total_tokens == sum(d.values())
        assert abs(r.zipf_slope - slope) < 1e-9, (lang, r.zipf_slope, slope)
        assert abs(r.zipf_intercept - intercept) < 1e-9
        # a frequency-ranked corpus always fits a negative slope
        assert r.zipf_slope < 0


def test_gini_matches_pure_python(spark):
    rows = {
        r.event_type: r
        for r in q_events_gini_concentration(spark, SF_DIR).collect()
    }
    per_user = duckdb.sql(
        f"""SELECT event_type, user_id,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(25,4))), 2) AS DOUBLE) AS tv
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2"""
    ).fetchall()
    by_type: dict[str, list[tuple[float, int]]] = {}
    for et, uid, tv in per_user:
        by_type.setdefault(et, []).append((tv, uid))
    for et, users in by_type.items():
        users.sort()
        n = len(users)
        sv = sum((Decimal(repr(tv)) for tv, _ in users), Decimal(0))
        siv = sum(
            (i * Decimal(repr(tv)) for i, (tv, _) in enumerate(users, 1)),
            Decimal(0),
        )
        sv_d, siv_d = float(sv), float(siv)
        gini = round((2.0 * siv_d - (n + 1) * sv_d) / (n * sv_d), 6)
        top = round(float(Decimal(repr(max(tv for tv, _ in users)))) / sv_d, 6)
        r = rows[et]
        assert r.n_users == n
        assert abs(r.total_value - sv_d) < 1e-9
        assert abs(r.gini - gini) < 1e-9, (et, r.gini, gini)
        assert abs(r.top_user_share - top) < 1e-9
        # positive values: the estimator is bounded by (n-1)/n < 1
        assert 0.0 <= r.gini < 1.0


def test_grouped_global_rank_matches_window_form(spark):
    """The TeraSort per-group rank must equal row_number() OVER
    (PARTITION BY g ORDER BY v, id) on skewed synthetic data — one hot
    group spanning many partitions, one singleton group, duplicate order
    values broken by the id tiebreak — and plan NO window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_ingestion_api_system_spark.operators import (
        grouped_global_rank,
        release_pins,
    )
    from data_ingestion_api_system_spark.plans import formatted_plan

    rows = (
        [("hot", (i * 37) % 11, i) for i in range(500)]
        + [("mid", i % 5, i) for i in range(40)]
        + [("one", 0, 0)]
        # NULL group: its own partition in window semantics (ADVICE r12) —
        # the recipe must keep and rank these rows, not drop them.
        + [(None, i % 3, i) for i in range(25)]
    )
    df = spark.createDataFrame(rows, "g string, v int, id int").repartition(8)
    got = grouped_global_rank(df, "g", ["v", "id"], "rnk")
    assert "windowspecdefinition" not in formatted_plan(got)
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = df.select("g", "v", "id", F.row_number().over(w).alias("rnk"))
    key = lambda t: tuple((x is None, x) for x in t)
    assert sorted(map(tuple, got.select("g", "v", "id", "rnk").collect()), key=key) == \
        sorted(map(tuple, want.collect()), key=key)
    release_pins()


def test_grouped_global_cumsum_matches_window_form(spark):
    """The TeraSort per-group running sum must equal SUM() OVER
    (PARTITION BY g ORDER BY id ROWS UNBOUNDED PRECEDING) on the same
    skewed shape (hot group spanning partitions, singleton group)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_ingestion_api_system_spark.operators import (
        grouped_global_cumsum,
        release_pins,
    )

    rows = (
        [("hot", i, (i * 13) % 7 + 1) for i in range(500)]
        + [("mid", i, i % 3 + 1) for i in range(40)]
        + [("one", 0, 5)]
        + [(None, i, i % 4 + 1) for i in range(25)]  # NULL group kept (ADVICE r12)
    )
    df = spark.createDataFrame(rows, "g string, id int, v int").repartition(8)
    got = grouped_global_cumsum(df, "g", ["id"], "v", "cum")
    w = (
        Window.partitionBy("g")
        .orderBy(F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.select("g", "id", "v", F.sum("v").over(w).alias("cum"))
    key = lambda t: tuple((x is None, x) for x in t)
    assert sorted(map(tuple, got.select("g", "id", "v", "cum").collect()), key=key) == \
        sorted(map(tuple, want.collect()), key=key)
    release_pins()


def _seq_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y  # sequential left-to-right, matching F.aggregate
    return acc


def _seq_norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return math.sqrt(acc)


def test_rank_fusion_matches_pure_python(spark):
    got = sorted(
        (
            (r.query_id, r.fused_rank, r.vec_id, r.r_full, r.r_trunc,
             r.rrf_score)
            for r in q_sim_rank_fusion(spark, SF_DIR).collect()
        )
    )
    emb = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    queries = [(vid, v) for vid, v in emb if vid < RECALL_QUERIES]
    cands = [(vid, v) for vid, v in emb if vid >= RECALL_QUERIES]
    expected = []
    for qid, bv in queries:
        scored = []
        for vid, av in cands:
            cf = round(_seq_dot(av, bv) / (_seq_norm(av) * _seq_norm(bv)), 6)
            pa, pb = av[:MATRYOSHKA_PREFIX], bv[:MATRYOSHKA_PREFIX]
            ct = round(_seq_dot(pa, pb) / (_seq_norm(pa) * _seq_norm(pb)), 6)
            scored.append((vid, cf, ct))
        rf = {
            vid: i
            for i, (vid, _, _) in enumerate(
                sorted(scored, key=lambda s: (-s[1], s[0])), 1
            )
        }
        rt = {
            vid: i
            for i, (vid, _, _) in enumerate(
                sorted(scored, key=lambda s: (-s[2], s[0])), 1
            )
        }
        fused = []
        for vid, _, _ in scored:
            f, t = rf[vid], rt[vid]
            if f > FUSION_POOL and t > FUSION_POOL:
                continue
            term_f = 1.0 / (RRF_K + f) if f <= FUSION_POOL else 0.0
            term_t = 1.0 / (RRF_K + t) if t <= FUSION_POOL else 0.0
            fused.append(
                (vid, f if f <= FUSION_POOL else 0,
                 t if t <= FUSION_POOL else 0, round(term_f + term_t, 9))
            )
        fused.sort(key=lambda s: (-s[3], s[0]))
        for rank, (vid, f, t, score) in enumerate(fused[:FUSED_TOPK], 1):
            expected.append((qid, rank, vid, f, t, score))
    expected.sort()
    assert len(got) == len(expected) == RECALL_QUERIES * FUSED_TOPK
    for g, e in zip(got, expected):
        assert g[:5] == e[:5], (g, e)
        assert abs(g[5] - e[5]) < 1e-12
