"""Independent re-derivations for the round-7c operators — layout /
sketch-rollup / ranking-eval / feature-extraction / sweep-line. The oracle
gate certifies Spark == DuckDB; these tests certify both against a THIRD
computation (pure Python / pandas / a naive DuckDB plan), so a shared
misunderstanding between the twin SQL dialects cannot slip through.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

from data_ingestion_api_system_spark.operators.events import q_events_ts_features
from data_ingestion_api_system_spark.operators.layout import (
    _BUCKET_SHIFT,
    _CELL_BITS,
    q_layout_zorder_skipping,
    q_sketch_hll_union_rollup,
)
from data_ingestion_api_system_spark.operators.rangejoin import (
    q_orders_backlog_sweep,
)
from data_ingestion_api_system_spark.operators.similarity import (
    _NDCG_IDCG,
    _NDCG_W,
    DIMS,
    N_LSH_BITS,
    RECALL_K,
    RECALL_QUERIES,
    q_sim_ndcg_eval,
)


# ---------------------------------------------------------------------------
# layout_zorder_skipping
# ---------------------------------------------------------------------------

def _interleave_py(cx: int, cy: int) -> int:
    z = 0
    for i in range(_CELL_BITS):
        z |= ((cx >> i) & 1) << (2 * i)
        z |= ((cy >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_zone_maps_match_pure_python(spark):
    out = q_layout_zorder_skipping(spark, SF_DIR).collect()
    li = duckdb.sql(
        f"SELECT l_partkey, l_suppkey FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    minp = min(r[0] for r in li)
    maxp = max(r[0] for r in li)
    mins = min(r[1] for r in li)
    maxs = max(r[1] for r in li)
    zones: dict[tuple[str, int], list] = {}
    for p, s in li:
        cx = (p - minp) * (1 << _CELL_BITS) // (maxp - minp + 1)
        cy = (s - mins) * (1 << _CELL_BITS) // (maxs - mins + 1)
        for layout, bucket in (
            ("zorder", _interleave_py(cx, cy) >> _BUCKET_SHIFT),
            ("linear", cx >> (_CELL_BITS - 6)),
        ):
            z = zones.setdefault((layout, bucket), [0, p, p, s, s])
            z[0] += 1
            z[1] = min(z[1], p)
            z[2] = max(z[2], p)
            z[3] = min(z[3], s)
            z[4] = max(z[4], s)
    assert len(out) == len(zones)
    for row in out:
        z = zones[(row.layout, row.bucket)]
        assert (row.n_rows, row.min_part, row.max_part, row.min_supp, row.max_supp) == tuple(z)


def test_zorder_skips_more_files_than_linear(spark):
    out = q_layout_zorder_skipping(spark, SF_DIR).collect()
    scanned = {"zorder": 0, "linear": 0}
    rows = {"zorder": 0, "linear": 0}
    for r in out:
        scanned[r.layout] += r.must_scan
        rows[r.layout] += r.n_rows
    # both layouts file the identical rows
    assert rows["zorder"] == rows["linear"]
    # the point of the operator: the 2-D box prunes more z-ordered files —
    # every linear file spans the full supp range, so the supp predicate
    # never prunes it, while aligned Z-ranges bound BOTH dims
    assert scanned["zorder"] < scanned["linear"]


# ---------------------------------------------------------------------------
# sketch_hll_union_rollup
# ---------------------------------------------------------------------------

def test_hll_rollup_verdicts_and_rollup_identity(spark):
    out = q_sketch_hll_union_rollup(spark, SF_DIR).collect()
    assert out, "no event types"
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM "
            f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    for r in out:
        assert r.est_within_5pct == 1, f"{r.event_type} sketch estimate out of bound"
        assert r.exact_users == exact[r.event_type]
        # the double-count a naive SUM rollup commits: daily distincts
        # can only overcount the period distinct
        assert r.sum_daily_users >= r.exact_users
        assert r.n_days >= 1


# ---------------------------------------------------------------------------
# sim_ndcg_eval
# ---------------------------------------------------------------------------

def _hyperplanes() -> list[list[float]]:
    planes = []
    for j in range(N_LSH_BITS):
        row = []
        for i in range(DIMS):
            nib = hashlib.md5(f"h{j}:{i}".encode()).hexdigest()[0]
            row.append(1.0 if "0123456789abcdef".index(nib) % 2 == 1 else -1.0)
        planes.append(row)
    return planes


def test_ndcg_matches_pure_python(spark):
    out = {r.query_id: r for r in q_sim_ndcg_eval(spark, SF_DIR).collect()}
    vecs = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    planes = _hyperplanes()

    def bucket(v):
        bits = ""
        for p in planes:
            acc = 0.0
            for i in range(DIMS):  # same left-to-right fold as both engines
                acc = acc + p[i] * v[i]
            bits += "1" if acc >= 0 else "0"
        return bits

    def norm(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return acc**0.5

    sigs = {vid: bucket(v) for vid, v in vecs}
    cands = [(vid, v) for vid, v in vecs if vid >= RECALL_QUERIES]
    for qid, qv in [(vid, v) for vid, v in vecs if vid < RECALL_QUERIES]:
        scored = []
        for vid, av in cands:
            acc = 0.0
            for i in range(DIMS):
                acc = acc + av[i] * qv[i]
            scored.append((vid, round(acc / (norm(av) * norm(qv)), 6)))
        exact_top = {
            vid
            for vid, _ in sorted(scored, key=lambda t: (-t[1], t[0]))[:RECALL_K]
        }
        in_bucket = [t for t in scored if sigs[t[0]] == sigs[qid]]
        ann_top = sorted(in_bucket, key=lambda t: (-t[1], t[0]))[:RECALL_K]
        dcg = sum(
            _NDCG_W[rank]
            for rank, (vid, _) in enumerate(ann_top, start=1)
            if vid in exact_top
        )
        r = out[qid]
        assert r.n_ann == len(ann_top)
        assert r.n_hits == sum(1 for vid, _ in ann_top if vid in exact_top)
        assert r.dcg_ppm == dcg
        assert r.ndcg_ppm == dcg * 1_000_000 // _NDCG_IDCG


# ---------------------------------------------------------------------------
# events_ts_features
# ---------------------------------------------------------------------------

def test_ts_features_match_pandas(spark):
    out = (
        q_events_ts_features(spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "event_idx"])
        .reset_index(drop=True)
    )
    ev = duckdb.sql(
        f"SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value "
        f"FROM read_parquet('{SF_DIR}/events.parquet') ORDER BY user_id, ts_s, event_id"
    ).df()
    g = ev.groupby("user_id")
    ev["event_idx"] = g.cumcount() + 1
    ev["gap_s"] = ev["ts_s"] - g["ts_s"].shift(1)
    ev["prev_value"] = g["value"].shift(1)
    # decimal(25,4) sum == exact over 2-decimal inputs; pandas float is
    # fine here because the window is only 3 values (no accumulation)
    ev["roll3_sum"] = (
        g["value"].rolling(3, min_periods=1).sum().reset_index(level=0, drop=True)
    ).round(2)
    ev["since_first_s"] = ev["ts_s"] - g["ts_s"].transform("first")
    ev = ev.sort_values(["user_id", "event_idx"]).reset_index(drop=True)
    assert len(out) == len(ev)
    pd.testing.assert_series_equal(out["event_idx"].astype("int64"), ev["event_idx"].astype("int64"), check_names=False)
    pd.testing.assert_series_equal(out["gap_s"].astype("float64"), ev["gap_s"].astype("float64"), check_names=False)
    pd.testing.assert_series_equal(out["prev_value"].astype("float64"), ev["prev_value"].astype("float64"), check_names=False)
    pd.testing.assert_series_equal(out["roll3_sum"].astype("float64"), ev["roll3_sum"].astype("float64"), check_names=False)
    pd.testing.assert_series_equal(out["since_first_s"].astype("int64"), ev["since_first_s"].astype("int64"), check_names=False)


# ---------------------------------------------------------------------------
# orders_backlog_sweep
# ---------------------------------------------------------------------------

def test_backlog_matches_naive_interval_count(spark):
    out = {
        r.day: (r.n_opened, r.n_closed, r.backlog)
        for r in q_orders_backlog_sweep(spark, SF_DIR).collect()
    }
    # naive third computation: for every active day, COUNT intervals
    # containing it (open_d <= day <= ship_d) — the O(days × rows) plan
    # the sweep-line replaces
    naive = duckdb.sql(
        f"""
        WITH iv AS (
          SELECT least(CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS open_d,
                 greatest(CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS ship_d
          FROM read_parquet('{SF_DIR}/lineitem.parquet') l
          JOIN read_parquet('{SF_DIR}/orders.parquet') o
            ON l.l_orderkey = o.o_orderkey
        ),
        days AS (
          SELECT DISTINCT day FROM (
            SELECT open_d AS day FROM iv
            UNION ALL SELECT ship_d + 1 FROM iv)
        )
        SELECT strftime(d.day, '%Y-%m-%d'),
               (SELECT count(*) FROM iv
                WHERE iv.open_d <= d.day AND d.day <= iv.ship_d)
        FROM days d
        """
    ).fetchall()
    assert len(naive) == len(out)
    for day, backlog in naive:
        assert out[day][2] == backlog, day
    # sweep bookkeeping invariants: totals balance and the log drains
    assert sum(v[0] for v in out.values()) == sum(v[1] for v in out.values())
    assert out[max(out)][2] == 0


# ---------------------------------------------------------------------------
# join_incremental_delta
# ---------------------------------------------------------------------------

def test_ivm_merge_equals_pandas_flat_join(spark):
    from data_ingestion_api_system_spark.operators.relational3 import (
        IVM_CUTOFF,
        q_join_incremental_delta,
    )

    out = {
        r.o_orderpriority: (r.n_items, r.revenue)
        for r in q_join_incremental_delta(spark, SF_DIR).collect()
    }
    o = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, o_orderdate FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).df()
    l = duckdb.sql(  # noqa: E741
        f"SELECT l_orderkey, l_shipdate, l_extendedprice, l_discount FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).df()
    j = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    # third computation: flat pandas join + float sum (tolerance compare)
    import math

    for prio, grp in j.groupby("o_orderpriority"):
        rev = float((grp.l_extendedprice * (1 - grp.l_discount)).sum())
        assert out[prio][0] == len(grp)
        assert math.isclose(out[prio][1], rev, rel_tol=1e-9)
    # both sides of the cutoff must be non-degenerate or the 4-branch
    # decomposition silently collapses to a plain join
    assert (o.o_orderdate.astype(str) < IVM_CUTOFF).any()
    assert (o.o_orderdate.astype(str) >= IVM_CUTOFF).any()
    assert (l.l_shipdate.astype(str) < IVM_CUTOFF).any()
    assert (l.l_shipdate.astype(str) >= IVM_CUTOFF).any()


# ---------------------------------------------------------------------------
# events_path_mining
# ---------------------------------------------------------------------------

def test_path_mining_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.events import (
        PATH_MIN_SUPPORT,
        q_events_path_mining,
    )

    out = {
        r.path: (r.n_occurrences, r.n_users)
        for r in q_events_path_mining(spark, SF_DIR).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type FROM read_parquet('{SF_DIR}/events.parquet') "
        f"ORDER BY user_id, ts, event_id"
    ).fetchall()
    from collections import defaultdict

    seqs = defaultdict(list)
    for uid, et in rows:
        seqs[uid].append(et)
    counts: dict[str, int] = defaultdict(int)
    users: dict[str, set] = defaultdict(set)
    for uid, seq in seqs.items():
        for i in range(len(seq) - 2):
            p = ">".join(seq[i : i + 3])
            counts[p] += 1
            users[p].add(uid)
    expect = {
        p: (c, len(users[p]))
        for p, c in counts.items()
        if c >= PATH_MIN_SUPPORT
    }
    assert out == expect


# ---------------------------------------------------------------------------
# sim_centroid_drift
# ---------------------------------------------------------------------------

def test_centroid_drift_matches_numpy(spark):
    import numpy as np

    from data_ingestion_api_system_spark.operators.similarity import (
        q_sim_centroid_drift,
    )

    out = {r.label: r for r in q_sim_centroid_drift(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT label, vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    from collections import defaultdict

    snap = defaultdict(lambda: {0: [], 1: []})
    for label, vid, v in rows:
        snap[label][vid % 2].append(v)
    for label, halves in snap.items():
        a = np.array(halves[0]).mean(axis=0).round(6)
        b = np.array(halves[1]).mean(axis=0).round(6)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        l2 = float(np.linalg.norm(a - b))
        r = out[label]
        assert r.n_a == len(halves[0]) and r.n_b == len(halves[1])
        # numpy uses pairwise float summation (different order than the
        # exact-decimal plan), so compare with a small tolerance
        assert abs(r.centroid_cosine - cos) < 1e-5
        assert abs(r.l2_shift - l2) < 1e-5
        assert -1.0 <= r.centroid_cosine <= 1.0


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_matches_pure_python(spark):
    from data_ingestion_api_system_spark.operators.text import (
        NOVELTY_NGRAM,
        q_text_ngram_novelty,
    )

    out = {
        r.doc_id: (r.n_distinct_ngrams, r.n_novel, r.novelty_ppm)
        for r in q_text_ngram_novelty(spark, SF_DIR).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    import re

    grams: dict[int, set] = {}
    for did, text in docs:
        # ASCII-flagged to mirror the JVM \s+ exactly (see test_round6b)
        toks = [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]
        grams[did] = {
            " ".join(toks[i : i + NOVELTY_NGRAM])
            for i in range(len(toks) - NOVELTY_NGRAM + 1)
        }
    first: dict[str, int] = {}
    for did in sorted(grams):
        for g in grams[did]:
            if g not in first:
                first[g] = did
    for did, gs in grams.items():
        if not gs:
            assert did not in out
            continue
        novel = sum(1 for g in gs if first[g] == did)
        assert out[did] == (len(gs), novel, novel * 1_000_000 // len(gs))


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
