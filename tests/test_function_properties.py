"""Property tests for the shared column-expression helpers — the pieces
several operator families now build on (n-grams feed decontamination,
repetition, cross-doc spans, DSIR; the byte-size parser feeds the narrow-scan
probe every query's spread() runs through).

One Spark round-trip per hypothesis example is the cost ceiling, so the
example counts stay modest (the helpers are pure expressions; the properties
are structural, not statistical).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

words = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=5), min_size=0, max_size=14
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=words, n=st.integers(min_value=1, max_value=6))
def test_word_ngrams_count_and_arity(spark, toks, n):
    """len(ngrams) == max(0, len(toks)-n+1); every gram joins exactly n
    tokens; grams reconstruct the original token windows in order."""
    from data_ingestion_api_system_spark.functions import word_ngrams

    df = spark.createDataFrame([(toks,)], "t array<string>")
    [row] = df.select(word_ngrams(F.col("t"), n).alias("g")).collect()
    grams = row.g
    expect = max(0, len(toks) - n + 1)
    assert len(grams) == expect
    for i, g in enumerate(grams):
        assert g == " ".join(toks[i : i + n])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=words, n=st.integers(min_value=1, max_value=6))
def test_word_ngrams_spark_matches_duckdb(spark, toks, n):
    """The Spark expression and its DuckDB twin produce identical gram
    lists for arbitrary token arrays — the cross-engine contract every
    n-gram operator's oracle rests on."""
    import duckdb

    from data_ingestion_api_system_spark.functions import (
        sql_word_ngrams,
        word_ngrams,
    )

    df = spark.createDataFrame([(toks,)], "t array<string>")
    [row] = df.select(word_ngrams(F.col("t"), n).alias("g")).collect()
    con = duckdb.connect()
    [want] = con.execute(
        f"SELECT {sql_word_ngrams('$tok$', n)}".replace(
            "$tok$", "[" + ", ".join("'" + t + "'" for t in toks) + "]::VARCHAR[]"
        )
    ).fetchone()
    con.close()
    assert row.g == want


def test_size_bytes_parser_units():
    from data_ingestion_api_system_spark.operators import _size_bytes

    assert _size_bytes("134217728") == 128 * 2**20
    assert _size_bytes("134217728b") == 128 * 2**20
    assert _size_bytes("128m") == 128 * 2**20
    assert _size_bytes("1g") == 2**30
    assert _size_bytes("64k") == 64 * 2**10
    assert _size_bytes("garbage", default=7) == 7


@given(
    history=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=9),
    )
)
@settings(max_examples=50, deadline=None)
def test_staleness_fill_orders_by_history(history):
    """Never-certified entries always sort before any certified entry, and
    certified entries sort by ascending last-green round; ties keep input
    order (sort stability) so the fill is deterministic."""
    from data_ingestion_api_system_spark.operators import staleness_fill

    tail = ["a", "b", "c", "d", "e"]
    out = staleness_fill(tail, history=history or {"z": 1})
    keys = [history.get(n, -1) for n in out]
    assert keys == sorted(keys)
    assert sorted(out) == sorted(tail)
