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


def test_allen_relations_partition_pairs(spark):
    """The 7 canonical relation counts must sum to exactly C(n,2)
    summed over users (every same-user pair classified once)."""
    from covid_19_fl_spark import suite as s

    ev = s._t(spark, SF_SMOKE, "events").filter(
        (F.col("event_type") == "view")
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    per_user = ev.groupBy("user_id").count().collect()
    want = sum(r["count"] * (r["count"] - 1) // 2 for r in per_user)
    rows = suite.QUERIES["x_allen_relations"](spark, SF_SMOKE).collect()
    assert sum(r.n_pairs for r in rows) == want
    allowed = {"equals", "starts", "before", "meets",
               "overlaps", "finished_by", "contains"}
    assert {r.relation for r in rows} <= allowed


def test_allen_relations_handmade(spark):
    """Hand-classified fixture: [0,10) vs [0,10) equals; [0,5) vs
    [0,10) starts; [0,5) before [7,9); [0,5) meets [5,8);
    [0,6) overlaps [4,9); [0,9) finished_by [4,9); [0,20) contains
    [4,9)."""
    from pyspark.sql import functions as F
    import covid_19_fl_spark.suite_r5h as h

    rows = [  # (event_id, user, s_minutes, e_minutes) one pair per user
        (1, 1, 0, 10), (2, 1, 0, 10),
        (3, 2, 0, 5), (4, 2, 0, 10),
        (5, 3, 0, 5), (6, 3, 7, 9),
        (7, 4, 0, 5), (8, 4, 5, 8),
        (9, 5, 0, 6), (10, 5, 4, 9),
        (11, 6, 0, 9), (12, 6, 4, 9),
        (13, 7, 0, 20), (14, 7, 4, 9),
    ]
    iv = spark.createDataFrame(
        [(e, u, s * 60_000_000, t * 60_000_000) for e, u, s, t in rows],
        "event_id long, user_id long, s long, e long",
    )
    a, b = iv.alias("a"), iv.alias("b")
    canon = (F.col("a.s") < F.col("b.s")) | (
        (F.col("a.s") == F.col("b.s")) & (F.col("a.e") < F.col("b.e"))
    ) | (
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.e") == F.col("b.e"))
        & (F.col("a.event_id") < F.col("b.event_id"))
    )
    pairs = a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & canon).select(
        F.col("a.user_id").alias("u"),
        F.col("a.s").alias("s1"), F.col("a.e").alias("e1"),
        F.col("b.s").alias("s2"), F.col("b.e").alias("e2"),
    )
    rel = (
        F.when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")), "starts")
        .when(F.col("e1") < F.col("s2"), "before")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when(F.col("e1") < F.col("e2"), "overlaps")
        .when(F.col("e1") == F.col("e2"), "finished_by")
        .otherwise("contains")
    )
    got = {r.u: r.rel for r in pairs.select("u", rel.alias("rel")).collect()}
    assert got == {1: "equals", 2: "starts", 3: "before", 4: "meets",
                   5: "overlaps", 6: "finished_by", 7: "contains"}
