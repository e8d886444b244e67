"""Round-14 ablation-cohort pins: pure-Python re-derivations (third source —
no SQL engine involved) for the session's three newborns, plus the
behavioral edge each exists for: the CCNet terciles partition every
language's passages with the floor-boundary sizes; the contamination
matrix is DENSE (a zero cell is the result the audit exists to show); and
the vocab-transfer table is monotone in K (a bigger vocabulary can never
increase OOV or fertility).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb

from data_ingestion_api_system_spark.operators.curation import (
    PASSAGE_W,
    REP_NS,
    q_text_ccnet_buckets,
    q_text_repetition_filters,
)
from data_ingestion_api_system_spark.operators.selection import (
    DECON_NGRAM,
    DECON_PROBE_MOD,
    q_prep_contamination_matrix,
)
from data_ingestion_api_system_spark.operators.text import (
    _BPE_CHARS_PER_PIECE,
    VOCAB_TRANSFER_KS,
    q_text_vocab_transfer,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t]


# --- text_ccnet_buckets -----------------------------------------------------


def _ccnet_python():
    docs = [(d, _toks(t), lang) for d, t, lang, _ in _docs()]
    c2: Counter = Counter()
    for _, t, _lang in docs:
        lt = [w.lower() for w in t]
        for a, b in zip(lt, lt[1:]):
            c2[(a, b)] += 1
    c1: Counter = Counter()
    for (a, _b), c in c2.items():
        c1[a] += c
    scored = []  # (lang, score, doc_id, pos)
    for doc_id, t, lang in docs:
        lt = [w.lower() for w in t]
        for p in range(len(lt) // PASSAGE_W):
            seg = lt[p * PASSAGE_W : (p + 1) * PASSAGE_W]
            ppms = [
                (1_000_000 * c2[(a, b)]) // c1[a] for a, b in zip(seg, seg[1:])
            ]
            scored.append((lang, sum(ppms) // len(ppms), doc_id, p))
    out: dict = {}
    by_lang: defaultdict = defaultdict(list)
    for lang, s, d, p in scored:
        by_lang[lang].append((s, d, p))
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        n = len(rows)
        for rk0, (s, d, p) in enumerate(rows):
            rk = rk0 + 1
            bucket = (
                "head" if rk * 3 <= n else ("middle" if rk * 3 <= 2 * n else "tail")
            )
            key = (lang, bucket)
            acc = out.setdefault(key, [0, set(), 0, None, None])
            acc[0] += 1
            acc[1].add(d)
            acc[2] += s
            acc[3] = s if acc[3] is None else min(acc[3], s)
            acc[4] = s if acc[4] is None else max(acc[4], s)
    return {
        k: (v[0], len(v[1]), v[2] // v[0], v[3], v[4]) for k, v in out.items()
    }


def test_ccnet_buckets_match_pure_python(spark):
    got = {
        (r.lang, r.bucket): (
            r.n_passages,
            r.n_docs,
            r.mean_score_ppm,
            r.min_score_ppm,
            r.max_score_ppm,
        )
        for r in q_text_ccnet_buckets(spark, SF_DIR).collect()
    }
    assert got == _ccnet_python()


def test_ccnet_tercile_sizes_are_floor_boundaries(spark):
    """Per language: head = floor(n/3), head+middle = floor(2n/3) — the
    integer-boundary contract the rk*3 <= n comparison encodes."""
    rows = q_text_ccnet_buckets(spark, SF_DIR).collect()
    per_lang: defaultdict = defaultdict(dict)
    for r in rows:
        per_lang[r.lang][r.bucket] = r.n_passages
    assert per_lang  # corpus always yields passages
    for lang, b in per_lang.items():
        n = sum(b.values())
        assert b.get("head", 0) == n // 3, lang
        assert b.get("head", 0) + b.get("middle", 0) == (2 * n) // 3, lang
        # head scores >= tail scores: min of head's bucket >= max of tail's
    by_key = {(r.lang, r.bucket): r for r in rows}
    for (lang, bucket), r in by_key.items():
        if bucket == "head" and (lang, "tail") in by_key:
            assert r.min_score_ppm >= by_key[(lang, "tail")].max_score_ppm


# --- text_repetition_filters --------------------------------------------------


def _repetition_python():
    out = {}
    for doc_id, text, lang, _src in _docs():
        lt = [w.lower() for w in _toks(text)]
        if len(lt) < 2:
            continue
        row = [len(text)]
        for n in REP_NS:
            grams = [" ".join(lt[i : i + n]) for i in range(len(lt) - n + 1)]
            if not grams:
                row += [0, 0, 0]
                continue
            counts = Counter(grams)
            top_cnt = max(counts.values())
            top_g = min(g for g, c in counts.items() if c == top_cnt)
            row += [
                (len(grams) - len(counts)) * 1_000_000 // len(grams),
                top_cnt,
                top_cnt * len(top_g) * 1_000_000 // len(text),
            ]
        out[(doc_id, lang)] = tuple(row)
    return out


def test_repetition_filters_match_pure_python(spark):
    got = {
        (r.doc_id, r.lang): (
            r.txt_chars,
            r.dup2_ppm,
            r.top2_cnt,
            r.top2_char_ppm,
            r.dup3_ppm,
            r.top3_cnt,
            r.top3_char_ppm,
        )
        for r in q_text_repetition_filters(spark, SF_DIR).collect()
    }
    assert got == _repetition_python()


def test_repetition_filters_flag_synthetic_loop(spark):
    """The behavioral edge the filter exists for: a document that is one
    phrase looped has dup2_ppm near 1e6 and its top 2-gram covering most
    chars — strictly above every organic doc's. Built via lsh_front-style
    direct invocation on a synthetic frame."""
    from data_ingestion_api_system_spark.operators import tune

    tune(spark)
    looped = ("spam ham " * 50).strip()
    organic = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, looped, "en"), (2, organic, "en")], "doc_id long, text string, lang string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        # the query reads documents.parquet from an sf dir — synthesize one
        df.write.parquet(f"{tmp}/documents.parquet")
        rows = {r.doc_id: r for r in q_text_repetition_filters(spark, tmp).collect()}
    assert rows[1].dup2_ppm > 900_000 > rows[2].dup2_ppm
    assert rows[1].top2_char_ppm > rows[2].top2_char_ppm


# --- prep_contamination_matrix ----------------------------------------------


def _grams(t: list[str]) -> set:
    return {
        " ".join(t[i : i + DECON_NGRAM])
        for i in range(len(t) - DECON_NGRAM + 1)
    }


def _contam_python():
    docs = [(d, _grams(_toks(t)), lang, src) for d, t, lang, src in _docs()]
    bench: defaultdict = defaultdict(set)
    for d, gs, lang, _src in docs:
        if d % DECON_PROBE_MOD == 0:
            bench[lang] |= gs
    corpus = [(d, gs, src) for d, gs, _lang, src in docs if d % DECON_PROBE_MOD]
    src_docs: Counter = Counter(src for _, _, src in corpus)
    out = {}
    for bl, bgs in bench.items():
        for src in src_docs:
            hit_grams: set = set()
            contaminated: set = set()
            instances = 0
            for d, gs, s in corpus:
                if s != src:
                    continue
                inter = gs & bgs
                if inter:
                    hit_grams |= inter
                    contaminated.add(d)
                    instances += len(inter)
            out[(bl, src)] = (
                len(bgs),
                src_docs[src],
                len(hit_grams),
                len(contaminated),
                instances,
                len(hit_grams) * 1_000_000 // len(bgs),
                len(contaminated) * 1_000_000 // src_docs[src],
            )
    return out


def test_contamination_matrix_matches_pure_python(spark):
    got = {
        (r.bench_lang, r.source): (
            r.bench_grams,
            r.n_docs_source,
            r.hit_grams,
            r.contaminated_docs,
            r.overlap_instances,
            r.gram_hit_ppm,
            r.doc_contam_ppm,
        )
        for r in q_prep_contamination_matrix(spark, SF_DIR).collect()
    }
    assert got == _contam_python()


def test_contamination_matrix_is_dense(spark):
    """Every (benchmark, source) pair has a row — zero-overlap cells emit
    explicit zeros instead of vanishing from the report."""
    rows = q_prep_contamination_matrix(spark, SF_DIR).collect()
    langs = {r.bench_lang for r in rows}
    sources = {r.source for r in rows}
    assert len(rows) == len(langs) * len(sources)
    for r in rows:
        if r.hit_grams == 0:
            assert r.contaminated_docs == 0 == r.overlap_instances
            assert r.gram_hit_ppm == 0 == r.doc_contam_ppm


# --- text_vocab_transfer ------------------------------------------------------


def _vocab_transfer_python():
    docs = [( _toks(t), lang) for _d, t, lang, _src in _docs()]
    lw: Counter = Counter()
    for t, lang in docs:
        for w in t:
            lw[(lang, w.lower())] += 1
    wc: Counter = Counter()
    for (_lang, w), c in lw.items():
        wc[w] += c
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    rank = {w: i + 1 for i, (w, _c) in enumerate(ranked[: max(VOCAB_TRANSFER_KS)])}
    out = {}
    for k in VOCAB_TRANSFER_KS:
        agg: defaultdict = defaultdict(lambda: [0, 0, 0, 0, 0])
        for (lang, w), cnt in lw.items():
            iv = 1 if rank.get(w, 10**9) <= k else 0
            pieces = (
                1
                if iv
                else (len(w) + _BPE_CHARS_PER_PIECE - 1) // _BPE_CHARS_PER_PIECE
            )
            a = agg[lang]
            a[0] += cnt
            a[1] += 1
            a[2] += (1 - iv) * cnt
            a[3] += 1 - iv
            a[4] += pieces * cnt
        for lang, (nt, ty, oovt, oovy, pieces) in agg.items():
            out[(k, lang)] = (
                nt,
                ty,
                oovt,
                oovy,
                oovt * 1_000_000 // nt,
                pieces * 1_000_000 // nt,
            )
    return out


def test_vocab_transfer_matches_pure_python(spark):
    got = {
        (r.k, r.lang): (
            r.n_tokens,
            r.n_types,
            r.n_oov_tokens,
            r.n_oov_types,
            r.oov_ppm,
            r.fertility_ppm,
        )
        for r in q_text_vocab_transfer(spark, SF_DIR).collect()
    }
    assert got == _vocab_transfer_python()


def test_vocab_transfer_monotone_in_k(spark):
    """A larger vocabulary can never increase OOV or fertility: for each
    lang, both ppm columns are non-increasing as K grows — the sanity
    property the ablation table is read by."""
    rows = q_text_vocab_transfer(spark, SF_DIR).collect()
    per_lang: defaultdict = defaultdict(dict)
    for r in rows:
        per_lang[r.lang][r.k] = (r.oov_ppm, r.fertility_ppm)
    ks = sorted(VOCAB_TRANSFER_KS)
    for lang, by_k in per_lang.items():
        assert set(by_k) == set(VOCAB_TRANSFER_KS), lang
        for a, b in zip(ks, ks[1:]):
            assert by_k[b][0] <= by_k[a][0], (lang, "oov")
            assert by_k[b][1] <= by_k[a][1], (lang, "fertility")


# --- sim_bitext_margin ------------------------------------------------------


def _bitext_python():
    """Pure-Python re-derivation (third source, no SQL engine): left-to-
    right double folds for dot/norm exactly as both engines compute them,
    HALF_UP micro-unit rounding, integer margin arithmetic."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from data_ingestion_api_system_spark.operators.similarity import (
        BITEXT_K,
        BITEXT_MARGIN_PPM,
    )

    vecs = duckdb.sql(
        f"SELECT vec_id, label, CAST(embedding AS DOUBLE[]) "
        f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    xs = [(i, l, v) for i, l, v in vecs if i % 7 == 0]
    ys = [(i, l, v) for i, l, v in vecs if i % 7 != 0]

    def norm(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return math.sqrt(acc)

    def cos6(av, bv):
        acc = 0.0
        for x, y in zip(av, bv):
            acc = acc + x * y
        c = acc / (norm(av) * norm(bv))
        return int(
            Decimal(c * 1000000).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )

    pairs = {}  # (x_id, y_id) -> (x_label, y_label, cos6)
    for xi, xl, xv in xs:
        for yi, yl, yv in ys:
            pairs[(xi, yi)] = (xl, yl, cos6(yv, xv))
    xstat = {}
    for xi, _, _ in xs:
        cands = sorted(
            ((pairs[(xi, yi)][2], yi) for yi, _, _ in ys),
            key=lambda t: (-t[0], t[1]),
        )[:BITEXT_K]
        xstat[xi] = (sum(c for c, _ in cands), len(cands))
    ystat = {}
    for yi, _, _ in ys:
        cands = sorted(
            ((pairs[(xi, yi)][2], xi) for xi, _, _ in xs),
            key=lambda t: (-t[0], t[1]),
        )[:BITEXT_K]
        ystat[yi] = (sum(c for c, _ in cands), len(cands))
    margins = {}
    for (xi, yi), (xl, yl, c6) in pairs.items():
        xn, xc = xstat[xi]
        yn, yc = ystat[yi]
        den = xn * yc + yn * xc
        if c6 > 0 and den > 0:
            margins[(xi, yi)] = (xl, yl, c6, 2 * c6 * xc * yc * 1000000 // den)
    back_best = {}
    for yi, _, _ in ys:
        cands = sorted(
            (
                (m[3], xi)
                for (xi, y2), m in margins.items()
                if y2 == yi
            ),
            key=lambda t: (-t[0], t[1]),
        )
        if cands:
            back_best[yi] = cands[0][1]
    out = {}
    for xi, _, _ in xs:
        cands = sorted(
            (
                (m[3], yi, m)
                for (x2, yi), m in margins.items()
                if x2 == xi
            ),
            key=lambda t: (-t[0], t[1]),
        )
        if not cands:
            continue
        mppm, yi, (xl, yl, c6, _) = cands[0]
        if mppm >= BITEXT_MARGIN_PPM:
            out[(xi, yi)] = (xl, yl, c6, mppm, back_best.get(yi) == xi)
    return out


def test_bitext_margin_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.similarity import (
        q_sim_bitext_margin,
    )

    got = {
        (r.x_id, r.y_id): (r.x_label, r.y_label, r.cos6, r.margin_ppm, r.mutual)
        for r in q_sim_bitext_margin(spark, SF_DIR).collect()
    }
    assert got == _bitext_python()
    assert got, "threshold mined nothing at sf0.001 — not a useful pin"


def test_bitext_margin_deflates_hubs(spark):
    """The behavioral edge margin mining exists for (Artetxe & Schwenk
    2019 §3): a hub vector with the highest RAW cosine to every query
    loses to each query's true partner once the kNN-average normalizer
    deflates it. Synthetic geometry: x_i = 0.6 e_i + 0.8 h (hub-leaning),
    partner y_i = 0.98 e_i + 0.199 h (raw cos 0.747 < hub's 0.8), hub =
    h. Raw-cosine best for every x is the hub; margin best must be the
    partner, mutual both ways."""
    import tempfile

    from data_ingestion_api_system_spark.operators import tune
    from data_ingestion_api_system_spark.operators.similarity import (
        DIMS,
        q_sim_bitext_margin,
    )

    tune(spark)
    m = 5

    def vec(i, a, b):
        v = [0.0] * DIMS
        v[i] = a
        v[DIMS - 1] = b
        return v

    rows = []
    for i in range(m):
        rows.append((i * 7, 0, vec(i, 0.6, 0.8)))  # x_i  (id % 7 == 0)
        rows.append((i * 7 + 1, 0, vec(i, 0.98, 0.199)))  # partner y_i
    rows.append((2 + 7 * m, 0, vec(0, 0.0, 1.0)))  # hub (id % 7 != 0)
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/embeddings.parquet")
        mined = {
            r.x_id: r for r in q_sim_bitext_margin(spark, tmp).collect()
        }
    assert set(mined) == {i * 7 for i in range(m)}
    for i in range(m):
        r = mined[i * 7]
        assert r.y_id == i * 7 + 1, "margin best must be the partner, not the hub"
        assert r.mutual
        assert r.margin_ppm >= 1_100_000
