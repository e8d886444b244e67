"""Independent re-derivations for the round-8 operators — interval merge,
Pareto frontier, label propagation, length buckets, hard negatives, the
Misra-Gries heavy-hitter sketch, the Benford audit, the streaming windowed
top-k, and the CSV roundtrip. The oracle gate certifies Spark == DuckDB;
these tests certify both against a THIRD computation (pure Python / numpy),
so a shared misunderstanding between the twin SQL dialects cannot slip
through.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from tests.conftest import SF_DIR

from data_ingestion_api_system_spark.operators.events import (
    INTERVAL_TTL_SECONDS,
    q_events_interval_merge,
)
from data_ingestion_api_system_spark.operators.insights import (
    BENFORD_PPM,
    q_dq_benford_check,
)
from data_ingestion_api_system_spark.operators.io import q_io_csv_roundtrip
from data_ingestion_api_system_spark.operators.relational2 import (
    HH_K,
    q_sketch_heavy_hitters,
)
from data_ingestion_api_system_spark.operators.relational3 import (
    LABEL_PROP_ROUNDS,
    TOP_EDGES,
    q_graph_label_prop,
    q_orders_pareto_frontier,
)
from data_ingestion_api_system_spark.operators.similarity import (
    q_sim_hard_negatives,
)
from data_ingestion_api_system_spark.operators.text import (
    LENGTH_BUCKETS,
    q_text_length_buckets,
)
from data_ingestion_api_system_spark.streaming.jobs import (
    q_streaming_windowed_topk,
)


def _event_epochs(sf_dir: str):
    """(user_id, epoch_s) rows; epoch computed by duckdb (used here only as
    a parquet/timestamp LOADER — all merging/windowing logic below is pure
    Python)."""
    return duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()


# ---------------------------------------------------------------------------
# events_interval_merge
# ---------------------------------------------------------------------------

def test_interval_merge_matches_pure_python(spark):
    out = {r.user_id: r for r in q_events_interval_merge(spark, SF_DIR).collect()}
    per_user: dict[int, list[int]] = defaultdict(list)
    for uid, s in _event_epochs(SF_DIR):
        per_user[uid].append(s)
    assert set(out) == set(per_user)
    for uid, starts in per_user.items():
        spans = []
        for s in sorted(starts):
            e = s + INTERVAL_TTL_SECONDS
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e)
                spans[-1][2] += 1
            else:
                spans.append([s, e, 1])
        r = out[uid]
        assert r.n_spans == len(spans)
        assert r.n_events == sum(c for _, _, c in spans)
        assert r.covered_seconds == sum(e - s for s, e, _ in spans)
        assert r.longest_span_seconds == max(e - s for s, e, _ in spans)
        # merged spans are disjoint by construction: coverage can never
        # exceed events x ttl and never undercut one ttl
        assert INTERVAL_TTL_SECONDS <= r.covered_seconds <= r.n_events * INTERVAL_TTL_SECONDS


# ---------------------------------------------------------------------------
# orders_pareto_frontier — vs the O(n^2) dominance definition
# ---------------------------------------------------------------------------

def test_pareto_frontier_matches_naive_dominance(spark):
    got = {
        (r.o_orderpriority, r.o_orderkey)
        for r in q_orders_pareto_frontier(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT o_orderpriority, o_orderkey, CAST(o_orderdate AS DATE), "
        f"o_totalprice FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    by_prio = defaultdict(list)
    for prio, key, day, price in rows:
        by_prio[prio].append((key, day, price))
    want = set()
    for prio, orders in by_prio.items():
        for key, day, price in orders:
            # frontier member iff nothing same-priority is strictly better
            # on price among everything at/before its date
            dominated = any(
                d2 <= day and p2 > price for _, d2, p2 in orders
            )
            if not dominated:
                want.add((prio, key))
    assert got == want
    assert want  # non-degenerate: every priority class has a frontier


# ---------------------------------------------------------------------------
# graph_label_prop
# ---------------------------------------------------------------------------

def _topk_edges(pairs):
    """Round-11 shared edge rule re-derived: top-K (a,b) by
    (support DESC, a, b) over (a, b, n) tuples."""
    return [
        (a, b)
        for a, b, _n in sorted(pairs, key=lambda t: (-t[2], t[0], t[1]))[:TOP_EDGES]
    ]


def test_label_prop_matches_pure_python(spark):
    out = {r.node: (r.community, r.community_size)
           for r in q_graph_label_prop(spark, SF_DIR).collect()}
    pairs = duckdb.sql(
        f"""
        WITH b AS (
          SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS brands
          FROM read_parquet('{SF_DIR}/lineitem.parquet') li
          JOIN read_parquet('{SF_DIR}/part.parquet') p ON l_partkey = p_partkey
          GROUP BY l_orderkey
        ), i AS (SELECT l_orderkey, unnest(brands) AS brand FROM b)
        SELECT ua.brand, ub.brand, count(*) FROM i ua JOIN i ub
          ON ua.l_orderkey = ub.l_orderkey AND ua.brand < ub.brand
        GROUP BY 1, 2
        """
    ).fetchall()
    adj: dict[str, list[str]] = defaultdict(list)
    for a, b in _topk_edges(pairs):
        adj[a].append(b)
        adj[b].append(a)
    labels = {v: v for v in adj}
    for _ in range(LABEL_PROP_ROUNDS):
        nxt = {}
        for v, nbrs in adj.items():
            votes = Counter(labels[u] for u in nbrs)
            # max count, min label — the deterministic argmax both engines rank
            nxt[v] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    sizes = Counter(labels.values())
    want = {v: (l, sizes[l]) for v, l in labels.items()}
    assert out == want


# ---------------------------------------------------------------------------
# text_length_buckets
# ---------------------------------------------------------------------------

def test_length_buckets_match_pure_python(spark):
    out = {r.bucket_tokens: r for r in q_text_length_buckets(spark, SF_DIR).collect()}
    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    per_bucket = defaultdict(lambda: [0, 0])  # n_docs, sum_tokens
    gmax = 0
    for (text,) in docs:
        # ASCII-flagged to mirror the JVM \s+ exactly (see test_round6b)
        n = len([t for t in re.split(r"\s+", text, flags=re.ASCII) if t])
        gmax = max(gmax, n)
        bucket = next((b for b in LENGTH_BUCKETS if n <= b), LENGTH_BUCKETS[-1] * 2)
        per_bucket[bucket][0] += 1
        per_bucket[bucket][1] += n
    assert set(out) == set(per_bucket)
    for bucket, (n_docs, sum_tokens) in per_bucket.items():
        r = out[bucket]
        assert r.n_docs == n_docs
        assert r.sum_tokens == sum_tokens
        pad = n_docs * bucket - sum_tokens
        assert r.pad_tokens == pad
        assert r.waste_ppm == (1_000_000 * pad) // (n_docs * bucket)
        assert r.naive_waste_ppm == (
            1_000_000 * (n_docs * gmax - sum_tokens)
        ) // (n_docs * gmax)
        # bucketing can only improve on pad-to-global-max — except in the
        # corpus's TOP bucket when the static ladder cap exceeds the
        # observed max length (pad-to-128 loses to pad-to-99); a real
        # dataloader sets the top rung to max_seq_len, which the ladder
        # models as configuration, not data
        if bucket <= gmax:
            assert r.waste_ppm <= r.naive_waste_ppm


# ---------------------------------------------------------------------------
# sim_hard_negatives
# ---------------------------------------------------------------------------

def test_hard_negatives_match_pure_python(spark):
    rows = q_sim_hard_negatives(spark, SF_DIR).collect()
    vecs = {}
    labels = {}
    for vid, lab, v in duckdb.sql(
        f"SELECT vec_id, label, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall():
        vecs[vid], labels[vid] = list(v), lab

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):  # sequential L-to-R like F.aggregate
            acc += x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return acc ** 0.5

    got = defaultdict(list)
    for r in rows:
        got[r.anchor_id].append((r.rk, r.vec_id, r.cand_label, r.cosine))
    for aid in range(8):
        scored = []
        for vid, v in vecs.items():
            if labels[vid] == labels[aid]:
                continue
            c = round(fold_dot(v, vecs[aid]) / (norm(v) * norm(vecs[aid])), 6)
            scored.append((-c, vid))
        scored.sort()
        want = [(i + 1, vid, labels[vid], -negc)
                for i, (negc, vid) in enumerate(scored[:3])]
        assert sorted(got[aid]) == want
        # hard negatives are by definition wrong-label
        assert all(lab != labels[aid] for _, _, lab, _ in want)


# ---------------------------------------------------------------------------
# sketch_heavy_hitters
# ---------------------------------------------------------------------------

def test_heavy_hitters_exact_set(spark):
    out = {r.user_id: r for r in q_sketch_heavy_hitters(spark, SF_DIR).collect()}
    counts = Counter(uid for uid, _ in _event_epochs(SF_DIR))
    n = sum(counts.values())
    want = {u: c for u, c in counts.items() if c * HH_K > n}
    assert set(out) == set(want)
    for u, c in want.items():
        assert out[u].n_events == c
        assert out[u].share_ppm == (1_000_000 * c) // n


def test_partition_heavy_candidate_superset_invariant():
    """The vectorized candidate rule (emit keys with partition count*K >
    n_p — VERDICT r8 #3 replaced the per-row MG decrement loop) must have
    the same two properties the operator relies on: (1) the union over
    partitions contains every GLOBALLY phi=1/K-heavy key (counts sum
    across partitions, so a global heavy key is partition-heavy
    somewhere); (2) strict inequality bounds each partition's emission to
    < K keys. Checked on an adversarial split where the heavy key is
    spread thin across partitions and one partition is pure noise."""
    k = 8
    partitions = [
        [0] * 90 + list(range(1, 601)),   # 0 is 90/690 > 1/8? no: diluted
        [0] * 500 + list(range(601, 701)),  # 0 heavy here
        list(range(701, 1401)),             # pure noise, no candidate
    ]
    union: set[int] = set()
    for part in partitions:
        n_p = len(part)
        local = Counter(part)
        emitted = {key for key, c in local.items() if c * k > n_p}
        assert len(emitted) < k, f"partition emitted {len(emitted)} >= K keys"
        union |= emitted
    flat = [u for part in partitions for u in part]
    n = len(flat)
    true_counts = Counter(flat)
    globally_heavy = {key for key, c in true_counts.items() if c * k > n}
    assert globally_heavy, "test stream lost its heavy key"
    assert globally_heavy <= union, f"heavy keys missed: {globally_heavy - union}"
    # and the noise partition contributed nothing
    assert not union & set(range(701, 1401))


# ---------------------------------------------------------------------------
# dq_benford_check
# ---------------------------------------------------------------------------

def test_benford_matches_pure_python(spark):
    out = {r.digit: r for r in q_dq_benford_check(spark, SF_DIR).collect()}
    prices = duckdb.sql(
        f"SELECT o_totalprice FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    digits = Counter()
    for (p,) in prices:
        # Decimal(float) is the EXACT binary value — matches both engines'
        # double->DECIMAL(18,4) HALF_UP cast, unlike str(float) shortest-repr
        micros = int(
            Decimal(p).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP) * 10000
        )
        digits[int(str(micros)[0])] += 1
    n = sum(digits.values())
    assert set(out) == set(digits)
    assert sum(BENFORD_PPM) == 1_000_000
    for d, c in digits.items():
        r = out[d]
        assert r.n_orders == c
        assert r.observed_ppm == (1_000_000 * c) // n
        assert r.expected_ppm == BENFORD_PPM[d - 1]
        assert r.abs_dev_ppm == abs(r.observed_ppm - r.expected_ppm)


# ---------------------------------------------------------------------------
# streaming_windowed_topk
# ---------------------------------------------------------------------------

def test_streaming_topk_matches_pure_python(spark):
    rows = q_streaming_windowed_topk(spark, SF_DIR).collect()
    per_bucket = defaultdict(Counter)
    for et, s in duckdb.sql(
        f"SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall():
        per_bucket[(s // 21600) * 21600][et] += 1
    got = defaultdict(list)
    for r in rows:
        got[r.bucket_start].append((r.rk, r.event_type, r.n_events))
    assert set(got) == set(per_bucket)
    for bucket, counts in per_bucket.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want = [(i + 1, et, c) for i, (et, c) in enumerate(ranked)]
        assert sorted(got[bucket]) == want


# ---------------------------------------------------------------------------
# io_csv_roundtrip
# ---------------------------------------------------------------------------

def test_abc_classification_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.insights import (
        q_orders_abc_classification,
    )

    out = {r.part_class: r for r in q_orders_abc_classification(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT l_partkey, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    cent = Decimal("0.01")
    rev = defaultdict(Decimal)
    for pk, price, disc in rows:
        # mirror revenue_dec(): decimal-cast FACTORS (price 2dp, discount
        # 2dp half-up from the exact binary double), multiply exactly
        p = Decimal(price).quantize(cent, rounding=ROUND_HALF_UP)
        d = Decimal(disc).quantize(cent, rounding=ROUND_HALF_UP)
        rev[pk] += p * (1 - d)
    rev = {pk: v.quantize(cent, rounding=ROUND_HALF_UP) for pk, v in rev.items()}
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    agg = defaultdict(lambda: [0, Decimal(0)])
    cum = Decimal(0)
    for pk, v in ranked:
        cum += v
        cls = "A" if cum * 5 <= total * 4 else ("B" if cum * 20 <= total * 19 else "C")
        agg[cls][0] += 1
        agg[cls][1] += v
    assert set(out) == set(agg)
    tot_cents = int(total * 100)
    for cls, (n, s) in agg.items():
        r = out[cls]
        assert r.n_parts == n
        assert Decimal(str(r.class_revenue)) == s
        assert r.share_ppm == (1_000_000 * int(s * 100)) // tot_cents
    # the A class must dominate revenue share but not part count
    if {"A", "C"} <= set(out):
        assert out["A"].share_ppm > out["C"].share_ppm


def test_common_neighbors_match_pure_python(spark):
    from data_ingestion_api_system_spark.operators.relational3 import (
        q_graph_common_neighbors,
    )

    rows = q_graph_common_neighbors(spark, SF_DIR).collect()
    pairs = duckdb.sql(
        f"""
        WITH b AS (
          SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS brands
          FROM read_parquet('{SF_DIR}/lineitem.parquet') li
          JOIN read_parquet('{SF_DIR}/part.parquet') p ON l_partkey = p_partkey
          GROUP BY l_orderkey
        ), i AS (SELECT l_orderkey, unnest(brands) AS brand FROM b)
        SELECT ua.brand, ub.brand, count(*) FROM i ua JOIN i ub
          ON ua.l_orderkey = ub.l_orderkey AND ua.brand < ub.brand
        GROUP BY 1, 2
        """
    ).fetchall()
    nbrs: dict[str, set] = defaultdict(set)
    edge_list = []
    for a, b in _topk_edges(pairs):
        nbrs[a].add(b)
        nbrs[b].add(a)
        edge_list.append((a, b))
    assert {(r.brand_a, r.brand_b) for r in rows} == set(edge_list)
    for r in rows:
        a, b = r.brand_a, r.brand_b
        common = len(nbrs[a] & nbrs[b])
        assert r.common_neighbors == common
        assert (r.degree_a, r.degree_b) == (len(nbrs[a]), len(nbrs[b]))
        denom = len(nbrs[a]) + len(nbrs[b]) - 2 - common
        want = (1_000_000 * common) // denom if denom > 0 else 0
        assert r.jaccard_ppm == want
        # jaccard is the common set over the union of the two punctured
        # neighborhoods — the denominator identity holds exactly (no self
        # loops, and b∉N(b)/a∉N(a) keep the endpoints out of the overlap)
        union = (nbrs[a] - {b}) | (nbrs[b] - {a})
        assert denom == len(union)


def test_json_roundtrip_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.io import q_io_json_roundtrip

    out = {r.event_type: r for r in q_io_json_roundtrip(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT event_type, user_id, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for et, uid, val in rows:
        micros = int(
            Decimal(val).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP) * 10000
        )
        a = agg[et]
        a[0] += 1
        a[1].add(uid)
        a[2] += micros
        a[3] = max(a[3], uid)
    assert set(out) == set(agg)
    for et, (n, users, sm, hi) in agg.items():
        r = out[et]
        assert (r.n_events, r.n_users, r.sum_value_micros, r.max_user) == (
            n, len(users), sm, hi,
        )


def test_audio_windows_match_pure_python(spark):
    import hashlib

    from data_ingestion_api_system_spark.operators.multimodal import (
        q_multimodal_audio_windows,
    )
    from data_ingestion_api_system_spark.sources.multimodal import (
        AUDIO_HOP_BYTES,
        AUDIO_WIN_BYTES,
    )

    out = {r.doc_id: r for r in q_multimodal_audio_windows(spark, SF_DIR).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    for did, text in docs:
        payload = text.encode("utf-8")
        md5s = []
        start = 0
        while start < len(payload):
            md5s.append(
                hashlib.md5(payload[start : start + AUDIO_WIN_BYTES]).hexdigest()
            )
            start += AUDIO_HOP_BYTES
        if not md5s:
            assert did not in out
            continue
        r = out[did]
        assert r.n_windows == len(md5s)
        assert r.last_win_idx == len(md5s) - 1
        covered = sum(
            min(AUDIO_WIN_BYTES, len(payload) - i * AUDIO_HOP_BYTES)
            for i in range(len(md5s))
        )
        assert r.compute_bytes == covered
        assert r.sequence_md5 == hashlib.md5("|".join(md5s).encode()).hexdigest()


def test_lateral_topk_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.relational2 import (
        q_sql_lateral_topk,
    )

    rows = q_sql_lateral_topk(spark, SF_DIR).collect()
    spend_rows = duckdb.sql(
        f"""
        SELECT c.c_nationkey, c.c_custkey, o.o_totalprice
        FROM read_parquet('{SF_DIR}/customer.parquet') c
        JOIN read_parquet('{SF_DIR}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    nations = dict(duckdb.sql(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF_DIR}/nation.parquet')"
    ).fetchall())
    cent = Decimal("0.01")
    spend = defaultdict(Decimal)
    nat_of = {}
    for nk, ck, price in spend_rows:
        spend[ck] += Decimal(price).quantize(cent, rounding=ROUND_HALF_UP)
        nat_of[ck] = nk
    per_nation = defaultdict(list)
    for ck, s in spend.items():
        per_nation[nat_of[ck]].append((-s, ck))
    want = set()
    for nk, lst in per_nation.items():
        for negs, ck in sorted(lst)[:2]:
            want.add((nations[nk], ck, float(-negs)))
    assert {(r.n_name, r.c_custkey, r.spend) for r in rows} == want


def test_cohort_ltv_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.relational2 import (
        q_orders_cohort_ltv,
    )

    out = {(r.cohort_month, r.months_since): r
           for r in q_orders_cohort_ltv(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT o_custkey, o_totalprice, year(o_orderdate)*12 + month(o_orderdate) "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    cent = Decimal("0.01")
    first = {}
    for ck, _, m in rows:
        first[ck] = min(first.get(ck, m), m)
    cells = defaultdict(lambda: [set(), Decimal(0)])
    for ck, price, m in rows:
        m0 = first[ck]
        c = cells[(m0, m - m0)]
        c[0].add(ck)
        c[1] += Decimal(price).quantize(cent, rounding=ROUND_HALF_UP)
    # cumulative per cohort in months_since order
    by_cohort = defaultdict(list)
    for (m0, ms), (users, rev) in cells.items():
        by_cohort[m0].append((ms, users, rev))
    assert len(out) == len(cells)
    for m0, lst in by_cohort.items():
        # (m-1) decode: December (m0 % 12 == 0) must stay in ITS year as
        # month 12, not roll into '<year+1>-00'
        label = f"{(m0 - 1) // 12}-{(m0 - 1) % 12 + 1:02d}"
        cum = Decimal(0)
        for ms, users, rev in sorted(lst):
            cum += rev
            r = out[(label, ms)]
            assert r.n_active == len(users)
            assert Decimal(str(r.revenue)) == rev
            assert Decimal(str(r.cum_ltv)) == cum
    # December regression: every label's month must be 1..12 (the naive
    # m//12 decode emitted '<year+1>-00' for December cohorts)
    assert all(1 <= int(lbl.rsplit("-", 1)[1]) <= 12 for lbl, _ in out)


def test_rake_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.text import (
        STOPWORDS,
        q_text_rake_keyphrases,
    )

    rows = q_text_rake_keyphrases(spark, SF_DIR).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    # pass 1: extract phrases per doc (gaps-and-islands over stopwords)
    doc_phrases = {}
    for did, text in docs:
        toks = re.split(r"\s+", text.lower(), flags=re.ASCII)
        words = [re.sub(r"[^a-z]", "", t) for t in toks]
        phrases, cur = [], []
        for w in words:
            if w == "" or w in STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        doc_phrases[did] = phrases
    # pass 2: corpus word stats
    freq, deg = Counter(), Counter()
    for phrases in doc_phrases.values():
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p)
    # pass 3: score and rank
    got = defaultdict(list)
    for r in rows:
        got[r.doc_id].append((r.rk, r.phrase, r.score_ppm, r.n_words, r.n_occurrences))
    for did, phrases in doc_phrases.items():
        if not phrases:
            assert did not in got
            continue
        per = Counter(" ".join(p) for p in phrases)
        scoredp = {}
        for p in phrases:
            key = " ".join(p)
            scoredp[key] = (
                sum((1_000_000 * deg[w]) // freq[w] for w in p), len(p)
            )
        ranked = sorted(
            ((ph, sc, ln) for ph, (sc, ln) in scoredp.items()),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        want = [(i + 1, ph, sc, ln, per[ph]) for i, (ph, sc, ln) in enumerate(ranked)]
        assert sorted(got[did]) == want, did


def test_lsh_tuning_sweep_matches_pure_python(spark):
    """Full-algorithm re-derivation: minhash signatures, per-config
    banding (length-band suffixes included), candidate buckets, exact
    Jaccard verify — all in pure Python over the same corpus."""
    import hashlib

    from data_ingestion_api_system_spark.operators.dedup import (
        LSH_SWEEP_CONFIGS,
        SHINGLE_LEN,
        SWEEP_SAMPLE_MOD,
        q_dedup_lsh_tuning_sweep,
    )

    out = {r.cfg: r for r in q_dedup_lsh_tuning_sweep(spark, SF_DIR).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        f"WHERE doc_id % {SWEEP_SAMPLE_MOD} = 0"
    ).fetchall()
    shingles = {}
    for did, text in docs:
        if len(text) >= SHINGLE_LEN:
            s = {text[i : i + SHINGLE_LEN] for i in range(len(text) - SHINGLE_LEN + 1)}
            if s:
                shingles[did] = s
    # hash each distinct shingle once per salt (corpus-level memo)
    all_sh = set().union(*shingles.values())
    hmemo = {
        (i, s): hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:16]
        for i in range(8)
        for s in all_sh
    }
    sig = {
        did: [min(hmemo[(i, s)] for s in sset) for i in range(8)]
        for did, sset in shingles.items()
    }
    len_band = {
        did: ((len(sset)).bit_length() - 1) // 2 for did, sset in shingles.items()
    }
    cand = {}
    for nb, rpb in LSH_SWEEP_CONFIGS:
        cfg = f"{nb}x{rpb}"
        buckets = defaultdict(list)
        for did, h in sig.items():
            for bi in range(nb):
                key = "|".join(h[bi * rpb : (bi + 1) * rpb])
                for off in (0, 1):
                    buckets[(bi, f"{key}#{len_band[did] + off}")].append(did)
        pairs = set()
        for ids in buckets.values():
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
        cand[cfg] = pairs
    union_pairs = set().union(*cand.values())

    def is_dup(a, b):
        inter = len(shingles[a] & shingles[b])
        union = len(shingles[a] | shingles[b])
        # ROUND(j, 6) >= 0.35  <=>  j >= 0.3499995, exactly in integers
        return inter * 10_000_000 >= union * 3_499_995

    vpairs = {p for p in union_pairs if is_dup(*p)}
    assert set(out) == {f"{nb}x{rpb}" for nb, rpb in LSH_SWEEP_CONFIGS}
    for nb, rpb in LSH_SWEEP_CONFIGS:
        cfg = f"{nb}x{rpb}"
        r = out[cfg]
        nv = len(cand[cfg] & vpairs)
        assert (r.n_bands, r.rows_per_band) == (nb, rpb)
        assert r.n_candidates == len(cand[cfg])
        assert r.n_verified == nv
        assert r.precision_ppm == (
            (1_000_000 * nv) // len(cand[cfg]) if cand[cfg] else 0
        )
        assert r.recall_ppm == ((1_000_000 * nv) // len(vpairs) if vpairs else 0)
    # banding theory: stricter configs are subsets of looser ones
    assert cand["1x8"] <= cand["2x4"] <= cand["4x2"]
    assert out["1x8"].recall_ppm <= out["2x4"].recall_ppm <= out["4x2"].recall_ppm


def test_ivf_nprobe_sweep_matches_pure_python(spark):
    """numpy/pure-Python re-derivation of the whole sweep: centroids,
    cell ranking, per-nprobe candidates, recall@5 vs exact top-5."""
    from data_ingestion_api_system_spark.operators.similarity import (
        IVF_NPROBE_SWEEP,
        q_sim_ivf_nprobe_sweep,
    )

    out = {r.nprobe: r for r in q_sim_ivf_nprobe_sweep(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT vec_id, label, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    vecs = {vid: list(v) for vid, _, v in rows}
    labels = {vid: lab for vid, lab, _ in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return acc ** 0.5

    bv = vecs[0]
    scored = {
        vid: round(fold_dot(v, bv) / (norm(v) * norm(bv)), 6)
        for vid, v in vecs.items()
        if vid != 0
    }
    exact5 = {vid for _, vid in sorted(((-c, vid) for vid, c in scored.items()))[:5]}
    # exact decimal centroid means, as double division like both engines
    from decimal import Decimal

    by_label = defaultdict(list)
    for vid, v in vecs.items():
        by_label[labels[vid]].append(v)
    cells = {}
    for lab, vs in by_label.items():
        cv = [
            float(
                sum(
                    Decimal(v[i]).quantize(Decimal("1E-8"), rounding=ROUND_HALF_UP)
                    for v in vs
                )
            )
            / len(vs)
            for i in range(len(bv))
        ]
        cells[lab] = round(fold_dot(cv, bv) / (norm(cv) * norm(bv)), 6)
    ranked_cells = sorted(cells, key=lambda l: (-cells[l], l))
    n_corpus = len(scored)
    for np_ in IVF_NPROBE_SWEEP:
        probed = set(ranked_cells[:np_])
        cand = {vid: c for vid, c in scored.items() if labels[vid] in probed}
        top5 = {vid for _, vid in sorted(((-c, vid) for vid, c in cand.items()))[:5]}
        r = out[np_]
        assert r.n_cells_probed == len(probed)
        assert r.n_scanned == len(cand)
        assert r.scanned_ppm == (1_000_000 * len(cand)) // n_corpus
        assert r.n_hits == len(top5 & exact5)
        assert r.recall_ppm == (1_000_000 * len(top5 & exact5)) // 5
    # more probes can only scan more and recall at least as much
    rs = [out[np_] for np_ in sorted(IVF_NPROBE_SWEEP)]
    assert all(a.n_scanned <= b.n_scanned for a, b in zip(rs, rs[1:]))
    assert all(a.recall_ppm <= b.recall_ppm for a, b in zip(rs, rs[1:]))


def test_salted_join_equals_direct_join(spark):
    """The salted plan must produce EXACTLY the direct join's answer —
    re-derived here with a pure-Python dict join."""
    from data_ingestion_api_system_spark.operators.relational3 import (
        q_join_salted_skew,
    )

    out = {r.c_mktsegment: r for r in q_join_salted_skew(spark, SF_DIR).collect()}
    seg = dict(duckdb.sql(
        f"SELECT c_custkey, c_mktsegment FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall())
    rows = duckdb.sql(
        f"SELECT user_id, value FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    agg = defaultdict(lambda: [0, set(), Decimal(0), None])
    q4 = Decimal("0.0001")
    for uid, val in rows:
        if uid not in seg:
            continue
        a = agg[seg[uid]]
        a[0] += 1
        a[1].add(uid)
        a[2] += Decimal(val).quantize(q4, rounding=ROUND_HALF_UP)
        a[3] = uid if a[3] is None else min(a[3], uid)
    assert set(out) == set(agg)
    for s, (n, users, sm, lo) in agg.items():
        r = out[s]
        assert (r.n_events, r.n_users, r.min_user) == (n, len(users), lo)
        assert Decimal(str(r.sum_value)) == sm.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


def test_tokenizer_fertility_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.text import (
        BPE_PATTERN,
        q_text_tokenizer_fertility,
    )

    out = {(r.lang, r.source): r
           for r in q_text_tokenizer_fertility(spark, SF_DIR).collect()}
    # third-source tokenization: Python re (ASCII-flagged), not either
    # engine's regexp_extract_all
    raw = duckdb.sql(
        f"SELECT lang, source, n_chars, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    docs = [
        (
            lang,
            src,
            nc,
            # subword-piece estimate: (len+3)//4 pieces per pre-token
            # (de-vacuated round 12 — raw match count froze fertility at 1.0)
            sum((len(m) + 3) // 4 for m in re.findall(BPE_PATTERN, text, flags=re.ASCII)),
            len([t for t in re.split(r"\s+", text, flags=re.ASCII) if t]),
        )
        for lang, src, nc, text in raw
    ]
    agg = defaultdict(lambda: [0, 0, 0, 0, None, None])
    for lang, src, nc, bpe, words in docs:
        if bpe <= 0 or words <= 0:
            continue
        cpt = (1_000_000 * nc) // bpe
        a = agg[(lang, src)]
        a[0] += 1
        a[1] += nc
        a[2] += bpe
        a[3] += words
        a[4] = cpt if a[4] is None else min(a[4], cpt)
        a[5] = cpt if a[5] is None else max(a[5], cpt)
    assert set(out) == set(agg)
    for k, (n, sc, st, sw, lo, hi) in agg.items():
        r = out[k]
        assert (r.n_docs, r.sum_chars, r.sum_tokens, r.sum_words) == (n, sc, st, sw)
        assert r.chars_per_token_ppm == (1_000_000 * sc) // st
        assert r.tokens_per_word_ppm == (1_000_000 * st) // sw
        assert (r.min_doc_cpt_ppm, r.max_doc_cpt_ppm) == (lo, hi)
        # BPE splits at least at every whitespace word: fertility >= ~1
        assert r.sum_tokens >= r.sum_words
    # vacuity pin (round 12): the piece estimate must actually split some
    # words — fertility strictly above 1.0 somewhere, and not one frozen
    # value across all (lang, source) groups
    ferts = {r.tokens_per_word_ppm for r in out.values()}
    assert max(ferts) > 1_000_000
    assert len(ferts) > 1


def test_csv_roundtrip_matches_pure_python(spark):
    out = {r.event_type: r for r in q_io_csv_roundtrip(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT event_type, event_id, user_id, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    agg = defaultdict(lambda: [0, set(), 0, None, None])
    for et, eid, uid, val in rows:
        micros = int(
            Decimal(val).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP) * 10000
        )
        a = agg[et]
        a[0] += 1
        a[1].add(eid)
        a[2] += micros
        a[3] = uid if a[3] is None else min(a[3], uid)
        a[4] = uid if a[4] is None else max(a[4], uid)
    assert set(out) == set(agg)
    for et, (n, ids, sm, lo, hi) in agg.items():
        r = out[et]
        assert r.n_events == n
        assert r.n_distinct_ids == len(ids)
        assert r.sum_value_micros == sm
        assert (r.min_user, r.max_user) == (lo, hi)
