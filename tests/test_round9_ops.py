"""Round-9 hardening tests: the hub-degree cap on the common-neighbors
wedge join (VERDICT r8 #4) and the bench-record overwrite guard's
load-comparison rule (VERDICT r8 #2).
"""

from __future__ import annotations

from collections import Counter

from data_ingestion_api_system_spark.operators.relational3 import (
    CN_DEGREE_CAP,
    _capped_adj,
)


def _symmetrize(edges):
    out = []
    for a, b in edges:
        out.append((a, b))
        out.append((b, a))
    return out


def test_capped_adj_bounds_wedge_count(spark):
    """Adversarial hub: node 0 adjacent to 1..200. Uncapped, the wedge
    join through center 0 produces C(200,2) = 19900 pairs; with the cap
    at K it must produce exactly C(K,2), and the kept neighbors must be
    the deterministic smallest-src rule regardless of input order."""
    from pyspark.sql import functions as F

    hub_deg = 200
    cap = 16
    edges = [(0, i) for i in range(1, hub_deg + 1)]
    # shuffled input order must not change which rows survive the cap
    rows = _symmetrize(edges)
    rows = rows[1::2] + rows[0::2]
    adj = spark.createDataFrame(rows, "src int, dst int")

    capped = _capped_adj(adj, cap)
    per_dst = Counter(r.dst for r in capped.collect())
    assert max(per_dst.values()) <= cap
    # deterministic rule: the cap smallest src values per dst survive
    kept_for_hub = sorted(
        r.src for r in capped.filter(F.col("dst") == 0).collect()
    )
    assert kept_for_hub == list(range(1, cap + 1))

    x = capped.select(F.col("src").alias("wa"), F.col("dst").alias("c"))
    y = capped.select(F.col("src").alias("wb"), F.col("dst").alias("c"))
    wedges = x.join(y, "c").filter(F.col("wa") < F.col("wb"))
    n_wedges = wedges.count()
    assert n_wedges == cap * (cap - 1) // 2  # vs 19900 uncapped
    # every wedge is through the hub and within the capped neighborhood
    assert wedges.filter(F.col("c") != 0).count() == 0


def test_registry_cap_is_above_brand_graph_max_degree(spark):
    """The registry entry must stay hash-exact: CN_DEGREE_CAP has to
    exceed the brand graph's maximum possible degree (|brands| − 1), so
    the cap filter is a no-op on real data."""
    from tests.conftest import SF_DIR

    import duckdb

    (n_brands,) = duckdb.sql(
        f"SELECT count(DISTINCT p_brand) FROM read_parquet('{SF_DIR}/part.parquet')"
    ).fetchone()
    assert CN_DEGREE_CAP > n_brands - 1


def test_capped_adj_noop_below_cap(spark):
    """A graph whose max degree is under the cap passes through
    unchanged (row-set equality)."""
    edges = [(1, 2), (1, 3), (2, 3), (4, 1)]
    adj = spark.createDataFrame(_symmetrize(edges), "src int, dst int")
    before = sorted((r.src, r.dst) for r in adj.collect())
    after = sorted((r.src, r.dst) for r in _capped_adj(adj, 8).collect())
    assert before == after


def test_length_buckets_overflow_clamped(spark, tmp_path):
    """ADVICE r8: a doc longer than the top ladder rung (2*8192 tokens)
    must land in the explicit overflow bucket 0 with pad 0 / waste 0 —
    previously it fell into the 16384 rung with NEGATIVE pad_tokens, and
    both engines agreed so the oracle gate couldn't see it. Runs the real
    Spark query AND the real oracle SQL on a synthetic long-doc table and
    checks both against hand-computed expectations."""
    import duckdb
    import pandas as pd

    from data_ingestion_api_system_spark.operators.text import (
        _ORACLE_LENGTH_BUCKETS,
        q_text_length_buckets,
    )

    lengths = [10, 16, 8193, 16384, 16385, 50000]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(lengths)),
            "text": ["w " * n for n in lengths],
            "lang": ["en"] * len(lengths),
            "source": ["synthetic"] * len(lengths),
            "n_chars": [2 * n for n in lengths],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    rows = {
        r.bucket_tokens: r
        for r in q_text_length_buckets(spark, str(tmp_path)).collect()
    }
    # expectations: 10,16 -> 16; 8193,16384 -> 16384; 16385,50000 -> overflow 0
    assert set(rows) == {16, 16384, 0}
    assert rows[16].n_docs == 2 and rows[16].pad_tokens == (16 - 10) + 0
    assert rows[16384].n_docs == 2
    assert rows[16384].pad_tokens == (16384 - 8193) + 0
    over = rows[0]
    assert over.n_docs == 2
    assert over.sum_tokens == 16385 + 50000
    assert over.pad_tokens == 0 and over.waste_ppm == 0
    assert all(r.pad_tokens >= 0 and r.waste_ppm >= 0 for r in rows.values())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = {
        int(b): (int(nd), int(st), int(pt), int(w))
        for b, nd, st, pt, w, _ in con.execute(_ORACLE_LENGTH_BUCKETS).fetchall()
    }
    spark_side = {
        int(b): (
            int(r.n_docs),
            int(r.sum_tokens),
            int(r.pad_tokens),
            int(r.waste_ppm),
        )
        for b, r in rows.items()
    }
    assert oracle == spark_side


def test_documents_text_is_ascii_all_sfs():
    """multimodal_audio_windows' Spark side hashes BYTE windows of the
    utf-8 payload while its DuckDB oracle slices CHARACTERS (DuckDB has no
    BLOB substring) — parity therefore requires documents.text to be pure
    ASCII. ADVICE r8: that invariant was only a comment; pin it against
    every generated scale factor so a testdata regeneration with
    multi-byte codepoints fails HERE with a clear message instead of as an
    opaque sequence_md5 mismatch."""
    import glob

    import duckdb

    sf_dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert sf_dirs, "no testdata directories found"
    for sf in sf_dirs:
        (n_non_ascii,) = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet') "
            f"WHERE octet_length(encode(text)) != length(text)"
        ).fetchone()
        assert n_non_ascii == 0, (
            f"{sf}/documents.parquet has {n_non_ascii} non-ASCII docs — "
            "multimodal_audio_windows byte-vs-char window boundaries will "
            "diverge from the DuckDB oracle"
        )


def test_bench_overwrite_guard_rule(tmp_path):
    """The bench divert rule: a contaminated run (load > 4.0) must not
    replace an existing clean record; clean runs always write the main
    path. Exercised on the same predicate bench.py uses (replicated here
    because bench.main() needs a full Spark run)."""
    import json

    def out_path_for(load_now, existing):
        path = tmp_path / "BENCH_LOCAL.json"
        if existing is not None:
            path.write_text(json.dumps({"load_1m_at_start": existing}))
        elif path.exists():
            path.unlink()
        out = str(path)
        if load_now > 4.0:
            try:
                existing_load = json.loads(path.read_text()).get(
                    "load_1m_at_start"
                )
            except (OSError, ValueError):
                existing_load = None
            if existing_load is not None and existing_load <= 4.0:
                out = str(path.with_suffix(".live.json"))
        return out

    clean = str(tmp_path / "BENCH_LOCAL.json")
    diverted = str(tmp_path / "BENCH_LOCAL.live.json")
    assert out_path_for(0.4, None) == clean          # clean, first run
    assert out_path_for(0.4, 0.3) == clean           # clean over clean
    assert out_path_for(5.7, 0.4) == diverted        # contaminated over clean
    assert out_path_for(5.7, None) == clean          # nothing to protect
    assert out_path_for(5.7, 6.0) == clean           # contaminated over same
