"""Independent re-derivations for the round-7e operators — A/B readout,
OLS trend, compaction planning, and count-min join-size estimation. The
oracle gate certifies Spark == DuckDB; these tests certify both against a
THIRD computation (pure Python / numpy), so a shared misunderstanding
between the twin SQL dialects cannot slip through.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from tests.conftest import SF_DIR

from data_ingestion_api_system_spark.operators.events import (
    AB_CONVERT_VALUE,
    AB_SALT,
    q_events_ab_test,
    q_events_linreg_trend,
)
from data_ingestion_api_system_spark.operators.layout import (
    COMPACT_BINS,
    q_layout_compaction_bins,
    q_sketch_join_size_estimate,
)


def _arm(uid: int) -> int:
    return int(hashlib.md5(f"{AB_SALT}{uid}".encode()).hexdigest()[0], 16) % 2


# ---------------------------------------------------------------------------
# events_ab_test
# ---------------------------------------------------------------------------

def test_ab_test_matches_pure_python(spark):
    out = {r.event_type: r for r in q_events_ab_test(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT user_id, event_type, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    users = {uid for uid, _, _ in rows}
    n = [sum(1 for u in users if _arm(u) == a) for a in (0, 1)]
    conv: dict[str, set] = {}
    for uid, et, v in rows:
        if v >= AB_CONVERT_VALUE:
            conv.setdefault(et, set()).add(uid)
    assert n[0] + n[1] == len(users) and n[0] > 0 and n[1] > 0
    for et, r in out.items():
        c = [sum(1 for u in conv.get(et, ()) if _arm(u) == a) for a in (0, 1)]
        assert (r.n_c, r.conv_c, r.n_t, r.conv_t) == (n[0], c[0], n[1], c[1])
        assert r.rate_c_ppm == c[0] * 1_000_000 // n[0]
        assert r.rate_t_ppm == c[1] * 1_000_000 // n[1]
        tot = c[0] + c[1]
        if tot == 0 or tot == n[0] + n[1]:
            assert r.z_score == 0.0
        else:
            p = tot / (n[0] + n[1])
            z = (c[1] / n[1] - c[0] / n[0]) / math.sqrt(
                p * (1 - p) * (1 / n[0] + 1 / n[1])
            )
            assert abs(r.z_score - z) < 1e-6


# ---------------------------------------------------------------------------
# events_linreg_trend
# ---------------------------------------------------------------------------

def test_linreg_matches_numpy_polyfit(spark):
    import numpy as np

    out = {r.event_type: r for r in q_events_linreg_trend(spark, SF_DIR).collect()}
    daily = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day, count(*) FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    day0 = min(d for _, d, _ in daily)
    series: dict[str, list] = {}
    for et, d, y in daily:
        series.setdefault(et, []).append(((d - day0).days, y))
    for et, pts in series.items():
        xs = np.array([x for x, _ in pts], dtype=float)
        ys = np.array([y for _, y in pts], dtype=float)
        r = out[et]
        assert r.n_days == len(pts)
        assert r.total_events == int(ys.sum())
        if len({x for x, _ in pts}) == 1:
            assert (r.slope, r.intercept) == (0.0, 0.0)
        else:
            slope, intercept = np.polyfit(xs, ys, 1)
            assert abs(r.slope - slope) < 1e-5
            assert abs(r.intercept - intercept) < 1e-5


# ---------------------------------------------------------------------------
# layout_compaction_bins
# ---------------------------------------------------------------------------

def test_compaction_matches_pure_python_sorted_fill(spark):
    out = {r.bin: r for r in q_layout_compaction_bins(spark, SF_DIR).collect()}
    files = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), count(*) FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    total = sum(n for _, _, n in files)
    target = (total + COMPACT_BINS - 1) // COMPACT_BINS
    bins: dict[int, list] = {}
    cum = 0
    for _, _, size in sorted(files, key=lambda f: (-f[2], f[0], f[1])):
        bins.setdefault(cum // target, []).append(size)
        cum += size
    assert set(out) == set(bins)
    for b, sizes in bins.items():
        r = out[b]
        assert r.n_files == len(sizes)
        assert r.bin_rows == sum(sizes)
        assert (r.min_file_rows, r.max_file_rows) == (min(sizes), max(sizes))
        assert r.fill_ppm == sum(sizes) * 1_000_000 // target
    # every bin but possibly the last should be filled to >= target by the
    # first straddling file, so the plan really compacts (no empty bins)
    assert sum(r.bin_rows for r in out.values()) == total


# ---------------------------------------------------------------------------
# sketch_join_size_estimate
# ---------------------------------------------------------------------------

def test_join_size_estimate_matches_pure_python_cm(spark):
    from data_ingestion_api_system_spark.operators.layout import (
        JS_A,
        JS_B,
        JS_P,
        JS_WIDTH as CM_WIDTH,
    )

    CM_DEPTH = len(JS_A)
    [r] = q_sketch_join_size_estimate(spark, SF_DIR).collect()
    okeys = [
        k for (k,) in duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    lkeys = [
        k for (k,) in duckdb.sql(
            f"SELECT l_orderkey FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        ).fetchall()
    ]

    def bucket(k: int, j: int) -> int:
        return (((k % JS_P + JS_P) % JS_P * JS_A[j] + JS_B[j]) % JS_P) % CM_WIDTH

    def sketch(keys):
        grid = [[0] * CM_WIDTH for _ in range(CM_DEPTH)]
        for k in keys:
            for j in range(CM_DEPTH):
                grid[j][bucket(k, j)] += 1
        return grid

    ga, gb = sketch(okeys), sketch(lkeys)
    est = min(
        sum(ga[j][b] * gb[j][b] for b in range(CM_WIDTH)) for j in range(CM_DEPTH)
    )
    from collections import Counter

    fa, fb = Counter(okeys), Counter(lkeys)
    exact = sum(c * fb.get(k, 0) for k, c in fa.items())
    assert r.exact_join_size == exact
    assert r.cm_estimate == est
    assert r.overestimate == est - exact >= 0  # one-sided guarantee
    assert r.ratio_ppm == est * 1_000_000 // exact


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
