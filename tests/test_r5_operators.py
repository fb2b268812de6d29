"""Property tests for the round-5 suite additions, beyond the DuckDB
oracle equality the driver gate enforces."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from covid_19_fl_spark import suite

from .conftest import SF_SMOKE


def test_ridge_shrinks_slopes_vs_ols(spark):
    ols = suite.QUERIES["ml_ols_normal_eq"](spark, SF_SMOKE).collect()[0]
    ridge = suite.QUERIES["ml_ridge_regression"](spark, SF_SMOKE).collect()[0]
    assert ridge.n == ols.n
    # the L2 penalty must actually bite (coefficients move), and the
    # penalized slopes shrink in magnitude
    assert (ridge.beta_q, ridge.beta_d) != (ols.beta_q, ols.beta_d)
    assert abs(ridge.beta_q) <= abs(ols.beta_q)
    assert abs(ridge.beta_d) <= abs(ols.beta_d)


def test_nelson_aalen_monotone_and_dominates_km_log(spark):
    na = (
        suite.QUERIES["x_nelson_aalen"](spark, SF_SMOKE)
        .orderBy("t_months")
        .collect()
    )
    assert na, "no event times"
    hazards = [r.cum_hazard for r in na]
    assert hazards == sorted(hazards)  # cumulative hazard never drops
    at_risk = [r.at_risk for r in na]
    assert at_risk == sorted(at_risk, reverse=True)  # risk set shrinks
    assert all(r.hazard_var >= 0 for r in na)
    # classical inequality: H_NA(t) <= -ln(S_KM(t)) with equality only
    # in the continuous limit (1-x <= e^-x per factor)
    import math

    km = {
        r.t_months: r.survival
        for r in suite.QUERIES["x_kaplan_meier"](spark, SF_SMOKE).collect()
    }
    for r in na:
        if km.get(r.t_months, 0) > 0:
            assert r.cum_hazard <= -math.log(km[r.t_months]) + 1e-9


def test_percent_rank_global_matches_naive_window(spark):
    got = {
        r.l_partkey: (r.rnk, r.pct_rank, r.cume)
        for r in suite.QUERIES["x_percent_rank_global"](
            spark, SF_SMOKE
        ).collect()
    }
    li = suite._t(spark, SF_SMOKE, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).alias("revenue")
    )
    w = Window.orderBy("revenue")
    naive = parts.select(
        "l_partkey",
        F.rank().over(w).alias("rnk"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    ).collect()
    assert len(naive) == len(got)
    for r in naive:
        assert got[r.l_partkey] == (r.rnk, r.pr, r.cd)


def test_connected_components_partition_nodes(spark):
    comps = suite.QUERIES["x_connected_components"](spark, SF_SMOKE).collect()
    li = (
        suite._t(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    n_nodes = (
        edges.select(F.col("u").alias("x"))
        .union(edges.select(F.col("v").alias("x")))
        .distinct()
        .count()
    )
    assert sum(r.n_nodes for r in comps) == n_nodes
    # component ids are member-min labels, hence distinct node ids
    assert len({r.component_id for r in comps}) == len(comps)


def test_append_wm_counts_are_prefix_of_complete_mode(spark):
    """The watermarked append drain must emit a PREFIX (by day) of the
    complete-mode daily counts: identical rows for every finalized
    day, nothing for the withheld tail."""
    app = {
        str(r.event_date): (r.n_events, r.total_value)
        for r in suite.QUERIES["st_windowed_counts_append_wm"](
            spark, SF_SMOKE
        ).collect()
    }
    full = {
        str(r.event_date): (r.n_events, r.total_value)
        for r in suite.QUERIES["st_stream_daily_counts"](
            spark, SF_SMOKE
        ).collect()
    }
    assert app, "append drain emitted nothing"
    assert set(app) < set(full)  # strictly fewer days (tail withheld)
    for day, vals in app.items():
        assert full[day] == vals
    # the withheld days are exactly the trailing ones
    emitted_max = max(app)
    assert all(day > emitted_max for day in set(full) - set(app))


def test_ks_two_sample_properties(spark):
    row = suite.QUERIES["x_ks_two_sample"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row.d_stat <= 1.0
    assert row.d_numerator <= row.n1 * row.n2
    # D reproduces from the numerator exactly
    assert row.d_stat == round(row.d_numerator / (row.n1 * row.n2), 9)


def test_matryoshka_recall_bounds_and_selfhit(spark):
    rows = suite.QUERIES["ss_matryoshka_recall"](spark, SF_SMOKE).collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3, 4, 5, 6, 7}
    for r in rows:
        assert r.k_exact == 5
        assert 0 <= r.n_hit <= 5
        assert r.recall == round(r.n_hit / 5, 6)
    # truncated search with ALL dims must reproduce the exact search
    from covid_19_fl_spark.llmops import similarity

    emb = suite._t(spark, SF_SMOKE, "embeddings")
    full = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, [0, 1], k=5).collect()
    }
    t64 = emb.select("vec_id", F.slice("embedding", 1, 64).alias("embedding"))
    again = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(t64, [0, 1], k=5).collect()
    }
    assert full == again


def test_grouped_components_isolation_and_min_labels(spark):
    # edges NEVER cross groups; labels must be the per-component min
    # and components in different groups must not merge even when
    # they share node ids
    from covid_19_fl_spark.operators.graph import grouped_components

    edges = spark.createDataFrame(
        [
            ("a", 1, 2), ("a", 2, 3),          # a: {1,2,3} -> 1
            ("a", 10, 11),                      # a: {10,11} -> 10
            ("b", 2, 3), ("b", 3, 7),          # b: {2,3,7} -> 2
        ],
        "grp string, id_a long, id_b long",
    ).repartition(8)
    out = {
        (r.grp, r.id): r.cluster_id
        for r in grouped_components(edges, ["grp"]).collect()
    }
    assert out == {
        ("a", 1): 1, ("a", 2): 1, ("a", 3): 1,
        ("a", 10): 10, ("a", 11): 10,
        ("b", 2): 2, ("b", 3): 2, ("b", 7): 2,
    }


def test_jaccard_prefix_pairs_lossless_vs_naive(spark):
    # prefix + length filtering must find EXACTLY the naive all-pairs
    # result over 3-gram shingle sets
    from covid_19_fl_spark.llmops import dedup

    docs = [
        (1, "red green blue yellow orange"),
        (2, "red green blue yellow purple"),   # shares 2 of its 3 grams
        (3, "red cyan magenta teal lime"),     # low overlap
        (4, "red green blue yellow orange"),   # exact dup of 1, J=1
        (5, "unrelated words entirely here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_prefix_pairs(df, "text", "doc_id", 40).collect()
    }
    # naive check in python over raw shingle strings (hashing is
    # collision-free here, so set sizes agree)
    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {i: grams(t) for i, t in docs}
    want = {}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            inter, uni = len(a & b), len(a | b)
            if inter * 100 >= 40 * uni:
                want[(ids[i], ids[j])] = round(inter / uni, 6)
    assert got == want
    assert (1, 4) in got and got[(1, 4)] == 1.0
    assert (1, 2) in got and got[(1, 2)] == 0.5


def test_bitmap_distinct_word_boundaries(spark):
    # ids straddling the 63-bit word boundary must not collide
    from covid_19_fl_spark import suite  # noqa: F401

    df = spark.createDataFrame(
        [(i,) for i in [0, 62, 63, 64, 125, 126, 189]],
        "user_id long",
    )
    words = (
        df.select(
            F.floor(F.col("user_id") / 63).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    total = words.agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n")
    ).collect()[0].n
    assert total == 7


def test_theil_sen_known_series(spark):
    # hand-checkable: days 0..3, counts 1,2,4,3 -> slopes
    # (1,2,1.5) d=1..; all pairs: (2-1)/1=1,(4-1)/2=1.5,(3-1)/3=2/3,
    # (4-2)/1=2,(3-2)/2=0.5,(3-4)/1=-1 -> sorted [-1,.5,.667,1,1.5,2]
    # median = (0.666..+1)/2 = 0.8333333
    import datetime

    rows = []
    eid = 0
    for d, n in [(0, 1), (1, 2), (2, 4), (3, 3)]:
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + d), "click")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = suite.QUERIES["x_theil_sen"](spark, td).collect()[0]
    assert out.n_pairs == 6
    assert abs(out.theil_sen_slope - 0.833333333) < 1e-8


def test_cdc_chunks_survive_a_prefix_edit(spark):
    # THE content-defined-chunking property: prepending tokens must
    # re-chunk only the affected prefix — every chunk of the original
    # document except the first reappears verbatim (same fingerprint)
    # in the edited document. Fixed-width chunking fails this test.
    import random

    from covid_19_fl_spark.llmops import dedup

    rnd = random.Random(7)
    words = [f"w{rnd.randrange(500)}" for _ in range(300)]
    doc1 = " ".join(words)
    doc2 = " ".join(["zzz1", "zzz2", "zzz3"] + words)
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    g = df.select(
        "doc_id",
        F.posexplode(dedup.hashed_word_grams(F.col("text"), 4)).alias(
            "pos", "h"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    ch = g.withColumn(
        "cid",
        F.sum(F.when(F.col("h") % 16 == 0, 1).otherwise(0)).over(w),
    )
    fp = ch.groupBy("doc_id", "cid").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "h"))),
                lambda s: s["h"],
            ),
            F.lit(0).cast("long"),
            lambda a, x: (a * dedup.SHINGLE_BASE + x)
            % dedup.PORTABLE_PRIME,
        ).alias("fp")
    )
    rows = fp.collect()
    c1 = sorted((r.cid, r.fp) for r in rows if r.doc_id == 1)
    c2 = {r.fp for r in rows if r.doc_id == 2}
    assert len(c1) > 5, "series too short to exercise chunking"
    missing = [fp for _, fp in c1[1:] if fp not in c2]
    assert not missing, f"non-prefix chunks changed: {len(missing)}"
