"""Property tests for the round-5 batch-H operator (RAKE keyphrase
extraction), beyond the DuckDB oracle equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.llmops.text import STOPWORDS

from .conftest import SF_SMOKE


def test_rake_shape_and_ordering(spark):
    rows = suite.QUERIES["tx_rake_keyphrases"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 15
    sw = set(STOPWORDS["en"])
    for r in rows:
        toks = r.phrase.split(" ")
        assert 1 <= len(toks) <= 3
        assert not (set(toks) & sw), r.phrase  # no stopword inside a phrase
        assert r.n_occurrences >= 1
        assert r.rake_score > 0
    for a, b in zip(rows, rows[1:]):
        assert a.rake_score >= b.rake_score


def test_rake_handmade_phrases(spark):
    """'fast scan of the big table' with stopwords {of, the} splits
    into phrases 'fast scan' and 'big table'; scores follow
    degree/frequency exactly."""
    df = spark.createDataFrame(
        [(1, "fast scan of the big table", "en", "s", 6),
         (2, "fast scan and the fast table", "en", "s", 6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import covid_19_fl_spark.suite_r5h as h
    from unittest import mock

    with mock.patch.object(h, "_t", lambda spark, sf, name: df):
        out = h.tx_rake_keyphrases(spark, "x").collect()
    # doc1 -> [fast scan] [big table]; doc2 -> [fast scan] [fast table]
    # word scores: every word has deg/freq = 2.0 here, so every phrase
    # scores 4.0; ties break by occurrences desc then phrase asc
    assert [(r.phrase, r.n_occurrences, r.rake_score) for r in out] == [
        ("fast scan", 2, 4.0),
        ("big table", 1, 4.0),
        ("fast table", 1, 4.0),
    ]
