"""Round-12 pins: the de-vacuated entries from the generalized vacuity
sweep (frozen-constant class, VERDICT r11 #3).

The round-12 `tools/vacuity_check.py` extension flags numeric oracle
columns frozen at ONE value at every SF. Its first run caught five real
vacuities; this suite pins that each fix actually fires both ways on the
generated data, plus the negative control the `text_heaps_vocab_growth`
allowlist entry cites (the decile bucket rule does grow on an OPEN
vocabulary — the production corpus saturates only because the generator
vocabulary is closed at 31 words).
"""

from __future__ import annotations

import duckdb

from data_ingestion_api_system_spark.operators.events import (
    q_events_error_budget_burn,
)
from data_ingestion_api_system_spark.operators.prep import (
    N_FUZZY_PROBES,
    q_fuzzy_name_match,
)
from data_ingestion_api_system_spark.operators.text import (
    q_text_bpe_tokens,
    q_text_quality_score,
)

SF_DIR = "/root/testdata/sf0.001"


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_match_distance_varies_and_matches_pure_python(spark):
    rows = q_fuzzy_name_match(spark, SF_DIR).collect()
    # vacuity pin: parity-varying corruption gives both 1- and 2-edit
    # probes, so the min distance is no longer one frozen constant
    assert {r.dist for r in rows} == {1, 2}
    # pure-python re-derivation: corrupt, score every candidate, take the
    # (dist, name) minimum — third source, no SQL engine involved
    cust = duckdb.sql(
        f"SELECT c_custkey, c_name FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()
    names = [n for _, n in cust]
    expected = {}
    for key, name in cust:
        if key >= N_FUZZY_PROBES:
            continue
        probe = name + "x" if key % 2 == 0 else name[1:] + "x"
        expected[probe] = min(
            (( _levenshtein(probe, c), c) for c in names),
        )
    assert {r.probe: (r.dist, r.matched_name) for r in rows} == expected


def test_error_budget_breach_flag_takes_both_states(spark):
    flags = {r.breached for r in q_events_error_budget_burn(spark, SF_DIR).collect()}
    assert flags == {0, 1}


def test_quality_tok_len_band_splits_corpus(spark):
    rows = q_text_quality_score(spark, SF_DIR).collect()
    assert {r.tok_len_ok for r in rows} == {0, 1}


def test_bpe_piece_estimate_splits_long_words(spark):
    rows = q_text_bpe_tokens(spark, SF_DIR).collect()
    # 5-8 char words cost 2 pieces under the (len+3) DIV 4 rule, so
    # fertility must sit strictly above 1 token/word on this corpus
    assert all(r.tokens_per_word > 1.0 for r in rows)
    assert all(r.total_bpe_tokens > r.total_words for r in rows)


def test_heaps_bucket_rule_grows_on_open_vocab():
    """Negative control for the `text_heaps_vocab_growth.n_vocab`
    allowlist entry: on an OPEN vocabulary (every doc introduces a new
    word) the decile first-occurrence rule yields a strictly growing
    vocabulary curve — the production corpus's flat 31 is the closed
    generator vocabulary saturating, not the operator ignoring its
    input."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        "SELECT r AS doc_id, 'w' || CAST(r AS VARCHAR) || ' common' AS text "
        "FROM range(1, 101) t(r)"
    )
    rows = con.execute(
        """
        WITH mx AS (SELECT max(doc_id) AS maxid FROM documents),
        words AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        fw AS (SELECT w, min(doc_id) AS doc_id FROM words GROUP BY 1),
        vb AS (
          SELECT ((((doc_id * 100 + maxid - 1) // maxid) + 9) // 10) * 10 AS b,
                 count(*) AS nv
          FROM fw CROSS JOIN mx GROUP BY 1
        ),
        grid AS (SELECT r * 10 AS prefix_pct FROM range(1, 11) t(r))
        SELECT prefix_pct,
               COALESCE((SELECT sum(nv) FROM vb WHERE b <= prefix_pct), 0) AS n_vocab
        FROM grid ORDER BY prefix_pct
        """
    ).fetchall()
    curve = [int(nv) for _, nv in rows]
    assert all(b > a for a, b in zip(curve, curve[1:]))
    assert curve[-1] == 101  # 100 unique words + 'common'
