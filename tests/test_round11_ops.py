"""Round-11 pins: the exact_avg_halfup scale guard and the
arithmetic-union Jaccard identity.

Round 11 replaced ``size(array_union(A, B))`` with ``n_a + n_b −
size(array_intersect(A, B))`` in both blocked n-gram Jaccard and the LSH
verifier (one array op per pair instead of two). The identity
|A∪B| = |A| + |B| − |A∩B| is exact ONLY for duplicate-free arrays — the
shingle builders guarantee that via array_distinct — so this suite pins
(a) the rewritten queries still hash-match their DuckDB oracles on a
corpus slice, and (b) the guard that keeps exact_avg_halfup's ×10^6
multiplier honest (ADVICE r10: scale > 6 made A non-integral and the
DECIMAL(38,0) cast silently rounded).
"""

from __future__ import annotations

import pytest

import duckdb
from pyspark.sql import functions as F

from data_ingestion_api_system_spark.functions import (
    exact_avg_halfup,
    sql_exact_avg_halfup,
)
from data_ingestion_api_system_spark.operators.dedup import (
    q_dedup_minhash_lsh,
    q_dedup_ngram_jaccard,
)

SF_DIR = "/root/testdata/sf0.001"


def test_exact_avg_halfup_rejects_scale_over_6():
    with pytest.raises(ValueError, match="scale <= 6"):
        exact_avg_halfup("x", scale=7)
    with pytest.raises(ValueError, match="scale <= 6"):
        sql_exact_avg_halfup("x", scale=7)


def test_exact_avg_halfup_scale_6_still_integral(spark):
    # boundary case: scale=6 is the largest admissible — sum·10^6 stays
    # integral and both engines agree on the half-up QUOTIENT rounding.
    # Inputs carry exactly ≤6 decimals (the function's precondition); the
    # average 0.0000015 lands on the half boundary → half-up to 0.000002.
    df = spark.createDataFrame([(0.000001,), (0.000002,)], ["x"])
    got = df.agg(exact_avg_halfup("x", scale=6).alias("m")).collect()[0]["m"]
    want = duckdb.sql(
        f"SELECT {sql_exact_avg_halfup('x', scale=6)} AS m"
        " FROM (VALUES (0.000001), (0.000002)) t(x)"
    ).fetchone()[0]
    assert got == want == 2e-06


def _jaccard_by_union(spark, pairs_df, sh_df):
    """Reference computation: the literal array_union form the round-11
    rewrite replaced — recomputed here so the identity stays pinned."""
    sha = sh_df.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("ua"))
    shb = sh_df.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("ub"))
    return (
        pairs_df.join(sha, "doc_a")
        .join(shb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ua", "ub"))
                / F.size(F.array_union("ua", "ub")),
                6,
            ).alias("jaccard_union"),
        )
    )


@pytest.mark.parametrize("qfn", [q_dedup_ngram_jaccard, q_dedup_minhash_lsh])
def test_arith_union_identical_to_array_union(spark, qfn):
    """Every emitted pair's jaccard equals the array_union recomputation —
    the |A∪B| = |A|+|B|−|A∩B| identity holds on the real shingle arrays."""
    from data_ingestion_api_system_spark.operators.dedup import _SPARK_SHINGLES
    from data_ingestion_api_system_spark.tables import load_table

    out = qfn(spark, SF_DIR).select("doc_a", "doc_b", "jaccard")
    sh = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.expr(_SPARK_SHINGLES).alias("shingles"))
    )
    ref = _jaccard_by_union(spark, out.select("doc_a", "doc_b"), sh)
    joined = out.join(ref, ["doc_a", "doc_b"]).collect()
    assert len(joined) == out.count() > 0
    for r in joined:
        assert r["jaccard"] == r["jaccard_union"], (r["doc_a"], r["doc_b"])
