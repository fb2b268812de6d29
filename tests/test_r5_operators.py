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
