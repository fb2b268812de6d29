"""Property tests (SURVEY §5.3.4): closed-form growth sim ≡ iterative
reference loop; P4 short-token preservation; sampling determinism
under repartitioning."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from covid_19_fl_spark.llmops import sampling
from covid_19_fl_spark.operators import analytics


def test_growth_sim_closed_form_equals_iterative(spark):
    """G1: the engine computes count_i = last · gf^i via
    explode(sequence)+pow (distributable); the reference iterates
    count_i = count_{i-1} · gf (cv-stats.py:69-83). Must agree to
    float ulps for every step."""
    last_date, last_count, gf, days = dt.date(2020, 3, 28), 4038.0, 1.13, 14

    seed = spark.createDataFrame(
        [(last_date, last_count, gf)],
        "last_date date, last_count double, growth_factor double",
    )
    # r["count"], not r.count — the column name collides with Row.count()
    got = {r["date"]: r["count"] for r in analytics.simulate_growth(seed, days).collect()}

    # reference-style iterative loop (cv-stats.py:76-82)
    cur, d = last_count, last_date
    for _ in range(days):
        cur = cur * gf
        d = d + dt.timedelta(days=1)
        assert abs(got[d] - cur) <= 1e-9 * abs(cur), (d, got[d], cur)
    assert len(got) == days


@settings(max_examples=20, deadline=None)
@given(
    tokens=st.lists(
        st.text(alphabet="abcdefgNY ", min_size=1, max_size=8).map(str.strip).filter(bool),
        min_size=1, max_size=6,
    )
)
def test_split_title_preserves_short_tokens(spark, tokens):
    """P4 (cv-api.py:106): tokens with len ≤ 2 pass through verbatim
    (state codes); longer tokens are initcap'd."""
    from covid_19_fl_spark.functions.normalize import split_title_array

    raw = ";".join(tokens)
    out = spark.createDataFrame([(raw,)], "s string").select(
        split_title_array("s").alias("a")
    ).first().a
    assert len(out) == len(tokens)
    for tok, got in zip(tokens, out):
        t = tok.strip()
        if len(t) > 2:
            # initcap semantics: capitalize first letter of each
            # whitespace-separated word, lowercase the rest
            assert got == " ".join(w.capitalize() for w in t.split(" "))
        else:
            assert got == t


def test_hash_sample_stable_under_repartition(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in sampling.hash_sample(df, "doc_id", 7).collect()}
    b = {
        r.doc_id
        for r in sampling.hash_sample(df.repartition(13), "doc_id", 7).collect()
    }
    assert a == b  # content-deterministic: identical under any layout
    assert abs(len(a) / 10_000 - 0.07) < 0.01


def test_stratified_take_exactly_k(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("lang")
    )
    out = sampling.stratified_take(df, "lang", "doc_id", 10)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {i: 10 for i in range(5)}
