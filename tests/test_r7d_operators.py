"""Property tests for the round-7 batch-D operators (dataset card,
domain cap, Platt scaling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite


def test_dataset_card_invariants(spark, sf_dir):
    from covid_19_fl_spark.tables import load

    rows = suite.QUERIES["cur_dataset_card"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    assert len(rows) == docs.select("source").distinct().count()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 < r.top_lang_share <= 1.0
        assert 0.0 <= r.dup_rate <= 1.0
        assert r.p50_tokens <= r.p90_tokens
        assert r.dup_docs != 1  # a dup group contributes >= 2 docs
        assert r.n_langs >= 1


def test_domain_cap_enforced(spark, sf_dir):
    import covid_19_fl_spark.suite_r7d as r7d
    from covid_19_fl_spark.tables import load

    rows = suite.QUERIES["sp_domain_cap"](spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r.hash_rank)
    docs = load(spark, sf_dir, "documents")
    totals = {
        r.source: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    for s, ranks in per_source.items():
        expect = min(r7d._DC_CAP, totals[s])
        assert sorted(ranks) == list(range(1, expect + 1))


def test_platt_scaling_learns_positive_slope(spark, sf_dir):
    # clicks get +300 milli-score by construction, so the fitted
    # score coefficient must be positive and the fit deterministic
    rows = {r.dim: r for r in suite.QUERIES["ml_platt_scaling"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].w_micro > 0
    again = {r.dim: r.w_micro for r in suite.QUERIES["ml_platt_scaling"](spark, sf_dir).collect()}
    assert again == {d: r.w_micro for d, r in rows.items()}
