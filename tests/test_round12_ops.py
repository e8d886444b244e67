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
from pyspark.sql import functions as F

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


def test_partsupp_suppkeys_all_exist_in_supplier(spark):
    """ADVICE r11: a 1-based or sparse s_suppkey domain would make derived
    ps_suppkey rows silently vanish from every join IDENTICALLY in both
    engines — invisible to the oracle hash. Pin the containment here."""
    from data_ingestion_api_system_spark.operators.tpch_ps import (
        derived_partsupp,
    )

    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        ps = derived_partsupp(spark, sf_dir)
        supp = {
            r.s_suppkey
            for r in spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .select("s_suppkey")
            .collect()
        }
        keys = {r.ps_suppkey for r in ps.select("ps_suppkey").distinct().collect()}
        assert keys <= supp
        # and each part carries exactly 4 DISTINCT suppliers (stride rule)
        counts = (
            ps.groupBy("ps_partkey")
            .agg(F.countDistinct("ps_suppkey").alias("k"))
            .select("k")
            .distinct()
            .collect()
        )
        assert {r.k for r in counts} == {4}


def test_derived_partsupp_raises_below_four_suppliers(spark, tmp_path):
    """The s_total >= 4 guard (ADVICE r11): with S < 4 the stride
    collapses all four offsets onto one suppkey — both the Spark
    derivation and the SQL prefix must fail loudly instead."""
    import pandas as pd
    import pytest
    from pyspark.errors import SparkRuntimeException

    from data_ingestion_api_system_spark.operators.tpch_ps import (
        _SQL_PARTSUPP,
        derived_partsupp,
    )

    pd.DataFrame({"p_partkey": [0, 1, 2]}).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame({"s_suppkey": [0, 1]}).to_parquet(tmp_path / "supplier.parquet")
    with pytest.raises(SparkRuntimeException, match="supplier count >= 4"):
        derived_partsupp(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    for t in ("part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    with pytest.raises(duckdb.InvalidInputException, match="supplier count >= 4"):
        con.execute(f"WITH {_SQL_PARTSUPP} SELECT * FROM partsupp").fetchall()


def test_q16_supplier_exclusion_is_live():
    """ADVICE r11: the s_acctbal < 0 exclusion matches no supplier at
    sf0.001 (documented in the docstring); pin that it removes >0
    suppliers at sf0.01+, so the anti-join under test is exercised."""
    for sf, expect_live in (("sf0.001", False), ("sf0.01", True), ("sf0.1", True)):
        n = duckdb.sql(
            f"SELECT count(*) FROM "
            f"read_parquet('/root/testdata/{sf}/supplier.parquet') "
            f"WHERE s_acctbal < 0"
        ).fetchone()[0]
        assert (n > 0) == expect_live, (sf, n)


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
