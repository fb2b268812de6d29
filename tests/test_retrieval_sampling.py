"""Weighted sampling, RRF hybrid fusion, and Markov transitions —
round-3 operator tests (properties the DuckDB gate can't express:
partition invariance, weighting law direction, fusion arithmetic)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark import suite  # noqa: F401 — registers all queries
from covid_19_fl_spark.llmops.sampling import weighted_sample
from covid_19_fl_spark.llmops.similarity import rrf_fuse

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_partition_invariant(spark):
    df = spark.range(0, 2_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    a = weighted_sample(df, "doc_id", F.col("w"), k=25).collect()
    b = weighted_sample(
        df.repartition(17, "doc_id"), "doc_id", F.col("w"), k=25
    ).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_weighted_sample_prefers_heavy_rows(spark):
    # Two strata with a 50× weight gap: the heavy stratum must dominate
    # the sample (inclusion probability rises with weight under A-ES).
    df = spark.range(0, 1_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(50.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = weighted_sample(df, "doc_id", F.col("w"), k=50).collect()
    heavy = sum(1 for r in got if r.doc_id < 500)
    assert heavy >= 40  # overwhelmingly from the heavy half


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = weighted_sample(df, "doc_id", F.col("w"), k=100).collect()
    assert all(r.doc_id % 2 == 1 for r in got)
    assert len(got) == 50


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------


@pytest.fixture()
def ranked_lists(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, lex_rank int"
    )
    sem = spark.createDataFrame(
        [(11, 1), (13, 2), (10, 3)], "doc_id long, sem_rank int"
    )
    return lex, sem


def test_rrf_scores_exact(spark, ranked_lists):
    lex, sem = ranked_lists
    got = {r.doc_id: r for r in rrf_fuse(lex, sem, k=10).collect()}
    assert math.isclose(got[11].rrf_score, 1 / 62 + 1 / 61)
    assert math.isclose(got[10].rrf_score, 1 / 61 + 1 / 63)
    assert math.isclose(got[12].rrf_score, 1 / 63)  # lexical-only
    assert math.isclose(got[13].rrf_score, 1 / 62)  # semantic-only
    assert got[12].sem_rank is None and got[13].lex_rank is None


def test_rrf_rank_order_and_k(spark, ranked_lists):
    lex, sem = ranked_lists
    rows = rrf_fuse(lex, sem, k=2).collect()
    assert [r.doc_id for r in rows] == [11, 10]  # both-list docs outrank singles
    assert [r.fused_rank for r in rows] == [1, 2]


# ---------------------------------------------------------------------------
# x_markov_transitions
# ---------------------------------------------------------------------------


def test_markov_rows_normalize_to_one(spark):
    out = suite.QUERIES["x_markov_transitions"](spark, SF).collect()
    assert out, "no transitions at sf0.001?"
    by_prev: dict[str, float] = {}
    for r in out:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p_next
    for prev, total in by_prev.items():
        assert math.isclose(total, 1.0, abs_tol=1e-4), (prev, total)


# ---------------------------------------------------------------------------
# incremental view maintenance (join_view_delta / merge_agg_view)
# ---------------------------------------------------------------------------


def test_ivm_delta_equals_full_recompute(spark):
    from covid_19_fl_spark.incremental import join_view_delta, merge_agg_view

    a = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(40)], "k long, grp string"
    )
    b = spark.createDataFrame(
        [(i % 20, float(i)) for i in range(60)], "k long, v double"
    )
    a_old, da = a.filter("k % 4 != 0"), a.filter("k % 4 = 0")
    b_old, db = b.filter("v < 30"), b.filter("v >= 30")

    def agg(df):
        return df.groupBy("grp").agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(28,4)")).alias("sv"),
        )

    full = {
        r.grp: (r.n, r.sv)
        for r in agg(a.join(b, "k")).collect()
    }
    v_old = agg(a_old.join(b_old, "k"))
    delta = join_view_delta(a_old, da, b_old, db, "k")
    merged = {
        r.grp: (r.n, r.sv)
        for r in merge_agg_view(v_old, agg(delta), keys=["grp"]).collect()
    }
    assert merged == full


def test_ivm_delta_counts_each_pair_once(spark):
    from covid_19_fl_spark.incremental import join_view_delta

    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    # all of a, b are "delta" (empty old sides): ΔV must be the full join
    empty_a, empty_b = a.limit(0), b.limit(0)
    got = join_view_delta(empty_a, a, empty_b, b, "k").count()
    assert got == a.join(b, "k").count() == 3


# ---------------------------------------------------------------------------
# temperature_mix_weights
# ---------------------------------------------------------------------------


def test_temperature_mix_limits(spark):
    from covid_19_fl_spark.llmops.sampling import temperature_mix_weights

    df = spark.createDataFrame(
        [("s1", 900), ("s2", 90), ("s3", 10)], "src string, toks long"
    )
    nat = {r.src: r.mix_prob for r in
           temperature_mix_weights(df, "src", F.col("toks"), tau=1.0).collect()}
    flat = {r.src: r.mix_prob for r in
            temperature_mix_weights(df, "src", F.col("toks"), tau=100.0).collect()}
    assert math.isclose(nat["s1"], 0.9, abs_tol=1e-6)  # τ=1: natural shares
    for p in flat.values():  # τ→∞: → uniform
        assert abs(p - 1 / 3) < 0.02
    tot = sum(
        r.mix_prob for r in
        temperature_mix_weights(df, "src", F.col("toks"), tau=0.7).collect()
    )
    assert math.isclose(tot, 1.0, abs_tol=1e-5)
