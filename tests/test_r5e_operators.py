"""Property tests for the round-5 batch-E operators (runs test,
jackknife CI, Spearman, SPRT), beyond the DuckDB oracle equality the
driver gate enforces."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.suite_r5e import (
    _SPRT_BOUND_NANO,
    _SPRT_LA_NANO,
    _avg_rank2,
)

from .conftest import SF_SMOKE


def test_runs_test_counts_consistent(spark):
    row = suite.QUERIES["x_runs_test"](spark, SF_SMOKE).collect()[0]
    # runs are bounded by the retained sequence length and at least 1
    assert 1 <= row.n_runs <= row.n_above + row.n_below
    # expectation formula: mu = 1 + 2*n1*n2/(n1+n2)
    n1, n2 = row.n_above, row.n_below
    assert row.mu_r == round(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6)


def test_runs_test_alternating_sequence(spark):
    """A strictly alternating above/below series maximizes the run
    count: R = n. Construct it with handmade daily counts."""
    rows = [(f"2024-01-{d:02d}", 10 if d % 2 else 90) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "day string, n_orders long")
    # median of {10,90} mix is (10+90)/2 = 50 -> no value equals it,
    # signs alternate -> 10 runs
    med2 = 10 + 90
    signed = df.filter(F.col("n_orders") * 2 != med2).select(
        "day",
        F.when(F.col("n_orders") * 2 > med2, 1).otherwise(0).alias("sgn"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy("day")
    runs = signed.select(
        F.when(
            F.lag("sgn").over(w).isNull() | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("new_run")
    )
    assert runs.agg(F.sum("new_run")).collect()[0][0] == 10


def test_jackknife_se_matches_numpy(spark):
    """Recompute the jackknife SE in plain Python from the block
    totals and compare to the operator's output."""
    row = suite.QUERIES["x_jackknife_ci"](spark, SF_SMOKE).collect()[0]
    orders = suite._t(spark, SF_SMOKE, "orders")
    from covid_19_fl_spark.llmops.dedup import portable_hash

    blocks = (
        orders.groupBy(
            (portable_hash(F.col("o_orderkey").cast("string")) % 30).alias("b")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s"),
            F.count("*").alias("c"),
        )
        .collect()
    )
    S = sum(float(r.s) for r in blocks)
    N = sum(r.c for r in blocks)
    K = len(blocks)
    thetas = [
        (S - float(r.s)) / (N - r.c) for r in sorted(blocks, key=lambda r: r.b)
    ]
    tbar = sum(thetas) / K
    se = math.sqrt((K - 1) / K * sum((t - tbar) ** 2 for t in thetas))
    assert abs(row.se_jack - se) < 1e-4
    assert abs(row.mean_price - S / N) < 1e-4
    assert row.n == N


def test_avg_rank2_matches_naive_ranks(spark):
    """Doubled average ranks from the value-level prefix must equal
    2x the classic per-row average rank."""
    rows = [(v,) for v in [5.0, 1.0, 3.0, 3.0, 3.0, 9.0, 1.0]]
    df = spark.createDataFrame(rows, "v double")
    got = {
        r.v: r["_r2_v"] for r in _avg_rank2(df, "v", 1.0).collect()
    }
    # values sorted: 1,1,3,3,3,5,9 -> avg ranks: 1.5,1.5,4,4,4,6,7
    assert got == {1.0: 3, 3.0: 8, 5.0: 12, 9.0: 14}


def test_spearman_in_range_and_positive(spark):
    row = suite.QUERIES["x_spearman_corr"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= row.spearman_rho <= 1.0


def test_spearman_perfect_monotone(spark):
    """A strictly increasing mapping must give rho = 1 exactly."""
    rows = [(float(i), float(i * i)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "l_quantity double, l_extendedprice double")
    ra = _avg_rank2(df, "l_quantity", 1.0)
    rb = _avg_rank2(df, "l_extendedprice", 100.0)
    j = (
        df.join(ra, "l_quantity")
        .join(rb, "l_extendedprice")
        .select(
            F.col("_r2_l_quantity").alias("x"),
            F.col("_r2_l_extendedprice").alias("y"),
        )
    )
    m = j.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    num = m.n * m.sxy - m.sx * m.sy
    den = math.sqrt(m.n * m.sxx - m.sx**2) * math.sqrt(m.n * m.syy - m.sy**2)
    assert abs(num / den - 1.0) < 1e-12


def test_sprt_constants_and_walk(spark):
    assert _SPRT_LA_NANO == round(math.log(0.55 / 0.45) * 1e9)
    assert _SPRT_BOUND_NANO == round(math.log(19.0) * 1e9)
    rows = suite.QUERIES["x_sprt_monitor"](spark, SF_SMOKE).collect()
    assert rows
    ordered = sorted(rows, key=lambda r: r.day)
    cum = 0
    for r in ordered:
        cum += 2 * r.k - r.n
        assert r.llr_nano == cum * _SPRT_LA_NANO
        want = (
            "accept_h1"
            if r.llr_nano >= _SPRT_BOUND_NANO
            else "accept_h0"
            if r.llr_nano <= -_SPRT_BOUND_NANO
            else "continue"
        )
        assert r.state == want
