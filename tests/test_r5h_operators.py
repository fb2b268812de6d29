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


def test_cdc_merge_slicing_invariant(spark, tmp_path):
    """Applying the change feed in 1 batch vs 3 batches must converge
    to the same table (the associative-LWW claim)."""
    from covid_19_fl_spark.sinks.batch import ParquetTable
    from pyspark.sql import functions as F

    rows = [(i % 5, i, i * 100) for i in range(30)]
    full = spark.createDataFrame(rows, "k long, w long, price_c long")

    def apply_batches(batches, path):
        table = ParquetTable(spark, str(path))
        for b in batches:
            agg = b.groupBy("k").agg(
                F.max("w").alias("last_writer"),
                F.max_by("price_c", "w").alias("price_c"),
                F.count("*").cast("long").alias("n_versions"),
            )
            if table.exists():
                merged = (
                    table.read()
                    .unionByName(agg)
                    .groupBy("k")
                    .agg(
                        F.max("last_writer").alias("last_writer"),
                        F.max_by("price_c", "last_writer").alias("price_c"),
                        F.sum("n_versions").cast("long").alias("n_versions"),
                    )
                )
                table.overwrite(merged)
            else:
                table.overwrite(agg)
        return sorted(map(tuple, table.read().collect()))

    one = apply_batches([full], tmp_path / "one")
    three = apply_batches(
        [
            full.filter(F.col("w") < 10),
            full.filter((F.col("w") >= 10) & (F.col("w") < 20)),
            full.filter(F.col("w") >= 20),
        ],
        tmp_path / "three",
    )
    assert one == three
    # LWW: every key's last writer is its max w; version count is 6
    for k, lw, pc, nv in one:
        assert lw == max(w for kk, w, _ in rows if kk == k)
        assert pc == lw * 100
        assert nv == 6
