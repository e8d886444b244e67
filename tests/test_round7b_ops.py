"""Independent re-derivations and edge pins for the round-7b operators
(the oracle gate certifies Spark==DuckDB; these tests certify both against
a THIRD implementation — pure Python over the same parquet — plus the
invariants the synthetic corpus may not exercise).

- cdc_apply_log: last-writer-wins fold re-derived with a dict walk.
- attribution_multi_touch: per-user credit conserves exactly 1,000,000 ppm.
- events_decay_value: re-derived with Fraction arithmetic (weights are
  dyadic rationals, so Fraction is exact end-to-end).
- dq_skew_report: re-derived with collections.Counter.
- revenue_share_hier: per-region shares sum to ≤ 1,000,000 ppm with the
  deficit strictly smaller than the number of nations (floor division).
- multimodal_phash_dedup: bucket cap is lossless on this corpus; pair
  invariants (doc_a < doc_b, 2 ≤ shared ≤ 4).
- prep_source_kl_drift: KL ≥ ~0 (up to the 6-dp log rounding) and exact
  agreement with a pure-Python KL on the same rounding discipline.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _events_pdf():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM '{SF_DIR}/events.parquet'"
    ).df()


def test_cdc_apply_log_matches_pure_python_fold(spark):
    from data_ingestion_api_system_spark.operators.insights import q_cdc_apply_log

    out = q_cdc_apply_log(spark, SF_DIR).toPandas().set_index("user_id")

    ev = _events_pdf()
    op = {"signup": "I", "error": "D"}
    state: dict = {}
    counts: Counter = Counter()
    deletes: Counter = Counter()
    # walk the log in (ts, event_id) order — the fold the operator windows
    for r in ev.sort_values(["ts", "event_id"]).itertuples():
        o = op.get(r.event_type, "U")
        counts[r.user_id] += 1
        if o == "D":
            deletes[r.user_id] += 1
        state[r.user_id] = (o, r.value, r.ts)
    expected = {
        u: (o, v, ts) for u, (o, v, ts) in state.items() if o != "D"
    }
    assert set(out.index) == set(expected)
    for u, (o, v, ts) in expected.items():
        row = out.loc[u]
        assert row.last_op == o
        assert row.last_value == v
        assert row.n_ops == counts[u]
        assert row.n_deletes == deletes[u]
        assert row.last_ts == int(ts.timestamp())


def test_attribution_credit_conserves_one_million_per_user(spark):
    from data_ingestion_api_system_spark.operators.insights import (
        q_attribution_multi_touch,
    )

    out = q_attribution_multi_touch(spark, SF_DIR).toPandas()

    ev = _events_pdf()
    fp = (
        ev[ev.event_type == "purchase"]
        .groupby("user_id")["ts"]
        .min()
        .to_dict()
    )
    touches = ev[
        ev.event_type.isin(["view", "click"])
        & ev.user_id.map(lambda u: u in fp)
    ]
    touches = touches[
        touches.apply(lambda r: r.ts < fp[r.user_id], axis=1)
    ].sort_values(["user_id", "ts", "event_id"])

    per_channel: Counter = Counter()
    n_first: Counter = Counter()
    n_last: Counter = Counter()
    n_touch: Counter = Counter()
    users_with_touches = 0
    for _, g in touches.groupby("user_id"):
        n = len(g)
        users_with_touches += 1
        credits = []
        if n == 1:
            credits = [1_000_000]
        elif n == 2:
            credits = [500_000, 500_000]
        else:
            mid = n - 2
            each = 200_000 // mid
            mids = [each] * mid
            mids[-1] = 200_000 - each * (mid - 1)
            credits = [400_000, *mids, 400_000]
        assert sum(credits) == 1_000_000  # exact conservation, every user
        for (_, r), c in zip(g.iterrows(), credits):
            per_channel[r.event_type] += c
            n_touch[r.event_type] += 1
        n_first[g.iloc[0].event_type] += 1
        n_last[g.iloc[-1].event_type] += 1

    got = out.set_index("channel")
    assert set(got.index) == set(per_channel)
    for ch in per_channel:
        assert got.loc[ch].credit_ppm_total == per_channel[ch]
        assert got.loc[ch].n_touches == n_touch[ch]
        assert got.loc[ch].n_first == n_first[ch]
        assert got.loc[ch].n_last == n_last[ch]
    assert int(out.credit_ppm_total.sum()) == 1_000_000 * users_with_touches


def test_decay_value_matches_fraction_arithmetic(spark):
    from data_ingestion_api_system_spark.operators.insights import (
        q_events_decay_value,
    )

    out = q_events_decay_value(spark, SF_DIR).toPandas().set_index("user_id")

    ev = _events_pdf()
    anchor = ev.ts.dt.normalize().max()
    acc: dict = defaultdict(Fraction)
    for r in ev.itertuples():
        k = min(int((anchor - r.ts.normalize()).days) // 7, 4)
        # value is generated with 2 decimals: Fraction(str(v)) is exact
        acc[r.user_id] += Fraction(str(r.value)) / (2**k)
    for u, frac in acc.items():
        got = out.loc[u].decayed_value
        # both engines ROUND half-up on DECIMAL; Python's round() is
        # half-even, and the dyadic sums DO land on .xxxx5 boundaries
        q = frac * 10_000
        units = q.numerator // q.denominator
        if (q - units) * 2 >= 1:
            units += 1
        want = units / 10_000
        assert math.isclose(got, want, abs_tol=1e-9), (u, got, want)


def test_skew_report_matches_counter(spark):
    from data_ingestion_api_system_spark.operators.insights import q_dq_skew_report

    out = (
        q_dq_skew_report(spark, SF_DIR).toPandas().set_index("key_col")
    )
    ev = _events_pdf()
    c = Counter(ev.user_id)
    row = out.loc["events.user_id"]
    assert row.n_rows == len(ev)
    assert row.n_keys == len(c)
    mx = max(c.values())
    assert row.max_rows_per_key == mx
    assert row.hot_key == min(k for k, v in c.items() if v == mx)
    assert row.skew_ppm == mx * len(c) * 1_000_000 // len(ev)
    # uniform lower bound: max >= mean, so skew_ppm >= ~1e6 (floor can shave
    # at most 1)
    assert (out.skew_ppm >= 999_999).all()


def test_revenue_share_sums_to_million_within_floor_slack(spark):
    from data_ingestion_api_system_spark.operators.insights import (
        q_revenue_share_hier,
    )

    out = q_revenue_share_hier(spark, SF_DIR).toPandas()
    for region, g in out.groupby("r_name"):
        total = g.share_ppm.sum()
        assert 1_000_000 - len(g) < total <= 1_000_000, (region, total)
        # ranks are a permutation with ties broken (rank over distinct units
        # + name tiebreak can still tie only on equal revenue AND name —
        # impossible), so they must be exactly 1..n
        assert sorted(g.rank_in_region) == list(range(1, len(g) + 1))


def test_phash_dedup_bucket_cap_is_lossless_and_pairs_valid(spark):
    from data_ingestion_api_system_spark.operators.multimodal import (
        PHASH_BUCKET_CAP,
        q_multimodal_phash_dedup,
    )
    from data_ingestion_api_system_spark.sources.multimodal import (
        binary_documents,
        phash_frames,
    )

    frames = phash_frames(binary_documents(spark, SF_DIR)).toPandas()
    bucket_sizes = frames.groupby(["frame_idx", "frame_hash"]).size()
    # the cap must not bite on this corpus (guard is for web-scale
    # boilerplate); if the generator ever changes, this fails loudly
    assert bucket_sizes.max() <= PHASH_BUCKET_CAP

    out = q_multimodal_phash_dedup(spark, SF_DIR).toPandas()
    if len(out):
        assert (out.doc_a < out.doc_b).all()
        assert out.shared_frames.between(2, 4).all()
        assert (out.sim_pct == out.shared_frames * 25).all()
        assert (out.keep_doc == out.doc_a).all()
        assert (out.drop_doc == out.doc_b).all()
    # python re-derivation of shared-frame counts
    idx = defaultdict(list)
    for r in frames.itertuples():
        idx[(r.frame_idx, r.frame_hash)].append(r.doc_id)
    pairs: Counter = Counter()
    for docs in idx.values():
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pairs[(docs[i], docs[j])] += 1
    expected = {p: c for p, c in pairs.items() if c >= 2}
    got = {(r.doc_a, r.doc_b): r.shared_frames for r in out.itertuples()}
    assert got == expected


def test_kl_drift_nonnegative_and_matches_python(spark):
    from data_ingestion_api_system_spark.operators.selection import (
        q_prep_source_kl_drift,
    )

    out = q_prep_source_kl_drift(spark, SF_DIR).toPandas().set_index("source")
    # true KL >= 0; the per-term 6-dp log rounding can shift the sum by at
    # most 5e-7 per term
    assert (out.kl_to_corpus > -1e-4).all()

    import re

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).df()
    csw: Counter = Counter()
    for r in docs.itertuples():
        for t in re.split(r"\s+", r.text.lower(), flags=re.ASCII):
            if t:
                csw[(r.source, t)] += 1
    cw: Counter = Counter()
    ns: Counter = Counter()
    vocab: Counter = Counter()
    for (s, w), c in csw.items():
        cw[w] += c
        ns[s] += c
        vocab[s] += 1
    n = sum(cw.values())
    from decimal import Decimal

    num: dict = defaultdict(Decimal)
    for (s, w), c in csw.items():
        logr = round(math.log((c * n) / (ns[s] * cw[w])), 6)
        num[s] += Decimal(str(logr)) * c
    for s in ns:
        want = round(float(num[s]) / ns[s], 6)
        row = out.loc[s]
        assert row.n_tokens == ns[s]
        assert row.n_vocab == vocab[s]
        assert math.isclose(row.kl_to_corpus, want, abs_tol=1e-9), (
            s,
            row.kl_to_corpus,
            want,
        )
