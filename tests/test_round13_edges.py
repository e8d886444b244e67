"""Curation-cohort edge pins on synthetic corpora (round 13): the
behavioral boundaries the sf-table tests can't isolate — exact passage-width
cutoffs, keep-first ownership across and within docs, the domain cap at
exactly-cap and over-cap group sizes, and the calibration sweep under a
single-class corpus.
"""

from __future__ import annotations

import pytest

from data_ingestion_api_system_spark.operators.curation import (
    DOMAIN_CAP,
    PASSAGE_W,
    q_dedup_exact_substr,
    q_prep_domain_caps,
    q_text_quality_calibration,
)


def _sf_dir(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _words(n, offset=0):
    return " ".join(f"w{i + offset}" for i in range(n))


def test_exact_substr_width_cutoff_and_ownership(spark, tmp_path):
    """Docs under the passage width vanish from the report; an exact-width
    doc yields one owned (non-removable) passage; a doc duplicated at a
    higher doc_id is 100% removable while the first owner keeps all of it;
    a within-doc repeat is removable at its second position."""
    dup_text = _words(PASSAGE_W * 2)
    rows = [
        (1, _words(PASSAGE_W - 1), "en", "s", 0),  # below width: excluded
        (2, _words(PASSAGE_W, offset=100), "en", "s", 0),  # exactly one passage
        (5, dup_text, "en", "s", 0),  # first owner
        (9, dup_text, "en", "s", 0),  # exact duplicate, higher id
        # same W-token passage twice inside ONE doc: pos 0 owns, pos 1 dup
        (11, _words(PASSAGE_W, offset=500) + " " + _words(PASSAGE_W, offset=500),
         "en", "s", 0),
    ]
    sf = _sf_dir(spark, tmp_path, rows)
    got = {r.doc_id: r for r in q_dedup_exact_substr(spark, sf).collect()}
    assert 1 not in got  # below-width doc contributes no passages
    assert (got[2].n_passages, got[2].n_removable) == (1, 0)
    assert (got[5].n_passages, got[5].n_removable) == (2, 0)
    assert (got[9].n_passages, got[9].n_removable) == (2, 2)
    assert got[9].removable_ratio == pytest.approx(1.0)
    assert got[9].removable_chars == len(dup_text) - 1  # join drops 1 space
    assert (got[11].n_passages, got[11].n_removable) == (2, 1)


def test_domain_caps_exact_and_over_cap(spark, tmp_path):
    """A domain with exactly DOMAIN_CAP docs drops nothing; one over-cap
    domain keeps the CAP longest docs (doc_id tiebreak) and reports the
    dropped mass; all noise variants collapse into the same domain."""
    rows = []
    # domain a-en.com: exactly at cap (ids chosen to hit www/m./utm arms)
    for i in range(DOMAIN_CAP):
        rows.append((i, "t", "en", "a", 100 + i))
    # domain b-en.com: cap + 3, two docs tie on n_chars (tiebreak: doc_id)
    for j in range(DOMAIN_CAP + 3):
        rows.append((100 + j, "t", "en", "b", 200 if j < 2 else 300 - j))
    sf = _sf_dir(spark, tmp_path, rows)
    got = {r.domain: r for r in q_prep_domain_caps(spark, sf).collect()}
    assert set(got) == {"a-en.com", "b-en.com"}
    a = got["a-en.com"]
    assert (a.n_docs, a.n_kept, a.n_dropped) == (DOMAIN_CAP, DOMAIN_CAP, 0)
    b = got["b-en.com"]
    assert (b.n_docs, b.n_kept, b.n_dropped) == (DOMAIN_CAP + 3, DOMAIN_CAP, 3)
    # expected keep-set: sort by n_chars DESC, doc_id ASC, take cap
    sized = sorted(
        ((200 if j < 2 else 300 - j, 100 + j) for j in range(DOMAIN_CAP + 3)),
        key=lambda t: (-t[0], t[1]),
    )[:DOMAIN_CAP]
    assert b.kept_chars == sum(c for c, _ in sized)
    assert b.first_kept_doc == min(d for _, d in sized)


def test_calibration_single_class_corpus(spark, tmp_path):
    """All-English corpus: fp = 0 at every threshold, recall degrades as
    the threshold rises past the docs' scores, precision is 1.0 wherever
    anything is flagged and NULL (not a crash, not 0) where nothing is."""
    # 30 tokens, avg token length 3 (< 4.0 band), zero stopwords →
    # score_milli = 300 (length_ok only) → bin 6, so thresholds above
    # 0.3 flag nothing
    text = " ".join(f"x{i % 9}0" for i in range(30))
    rows = [(i, text, "en", "s", 0) for i in range(6)]
    sf = _sf_dir(spark, tmp_path, rows)
    out = q_text_quality_calibration(spark, sf).collect()
    assert all(r.fp == 0 for r in out)
    assert all(r.tp + r.fn == 6 for r in out)
    for r in out:
        if r.n_flagged > 0:
            assert r.precision == pytest.approx(1.0)
        else:
            assert r.precision is None
    recalls = [r.recall for r in sorted(out, key=lambda r: r.threshold)]
    assert recalls[0] == pytest.approx(1.0)
    assert recalls[-1] == pytest.approx(0.0)  # no doc scores in the top bin
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))  # monotone


def test_epoch_allocator_zero_token_slice(spark, tmp_path):
    """A slice whose docs all tokenize to zero tokens must yield NULL
    epoch columns (DuckDB x/0 semantics), not Spark ANSI's
    DIVIDE_BY_ZERO — and must not disturb the arithmetic of the other
    slices."""
    from data_ingestion_api_system_spark.operators.curation import (
        EPOCH_BUDGET_MULT,
        q_prep_epoch_allocator,
    )

    rows = [
        (1, _words(10), "en", "s0", 0),
        (2, _words(30), "en", "s0", 0),
        (3, "", "xx", "s1", 0),  # zero-token slice (empty text)
        (4, "   ", "xx", "s1", 0),  # whitespace-only also tokenizes to []
    ]
    sf = _sf_dir(spark, tmp_path, rows)
    got = {(r.lang, r.source): r for r in q_prep_epoch_allocator(spark, sf).collect()}
    assert set(got) == {("en", "s0"), ("xx", "s1")}
    dead = got[("xx", "s1")]
    assert (dead.n_docs, dead.n_tokens) == (2, 0)
    assert dead.full_epochs is None
    assert dead.epochs is None
    assert dead.effective_tokens is None
    assert dead.utilization is None
    live = got[("en", "s0")]
    # t_corpus = 40, n_slices = 2 -> alloc = MULT*40 // 2 per slice
    alloc = (EPOCH_BUDGET_MULT * 40) // 2
    assert (live.n_tokens, live.alloc_tokens, live.full_epochs) == (
        40,
        alloc,
        alloc // 40,
    )
