"""Semantic property tests for the round-3 operators (beyond the
oracle equality checks in test_suite_oracle.py): Bloom filters must
never produce false negatives, containment must bound Jaccard from
above, contamination flags must follow the integer threshold, and the
histogram quantiles must bracket the exact percentiles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import tables
from covid_19_fl_spark.llmops import dedup
from covid_19_fl_spark.operators import bloom

from .conftest import SF_SMOKE


def test_bloom_no_false_negatives(spark):
    """Every key inserted into the filter must pass its own probe."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    filt = bloom.bloom_build(keys, "k")
    passed = bloom.bloom_probe(keys, "k", filt)
    assert passed.count() == 500


def test_bloom_rejects_most_non_members(spark):
    """Disjoint probe keys should mostly fail (8192 bits, 500 keys,
    3 hashes → FP rate well under 10%)."""
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    probe = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    filt = bloom.bloom_build(build, "k")
    n_pass = bloom.bloom_probe(probe, "k", filt).count()
    assert n_pass < 200, f"FP rate too high: {n_pass}/2000"


def test_bloom_filter_is_compact(spark):
    """The bitmask table never exceeds ceil(bits/63) rows regardless
    of key volume — the property that makes it broadcast-able."""
    keys = spark.range(0, 5_000).select(F.col("id").alias("k"))
    assert bloom.bloom_build(keys, "k").count() <= bloom.DEFAULT_BITS // 63 + 1


def test_containment_bounds_jaccard(spark):
    """For any pair, max(contain_a, contain_b) ≥ Jaccard — containment
    catches everything Jaccard does at the same threshold."""
    docs = tables.load(spark, SF_SMOKE, "documents")
    pairs = dedup.containment_pairs(
        docs, "text", "doc_id", "lang", id_window=100, n=3, threshold=0.0
    )
    jac = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", "lang", id_window=100, n=3, threshold=0.0
    )
    joined = pairs.join(jac, ["id_a", "id_b"]).select(
        "id_a", "id_b", "contain_a", "contain_b", "jaccard"
    )
    bad = joined.filter(
        F.greatest("contain_a", "contain_b") < F.col("jaccard") - 1e-9
    ).count()
    assert bad == 0


def test_contamination_benchmark_docs_excluded(spark):
    """Benchmark rows are audited against, never audited themselves."""
    from covid_19_fl_spark.llmops import text

    docs = tables.load(spark, SF_SMOKE, "documents")
    out = text.contamination_stats(
        docs, "text", "doc_id", F.col("doc_id") % 17 == 0, n=5
    )
    assert out.filter(F.col("doc_id") % 17 == 0).count() == 0
    n_train = docs.filter(F.col("doc_id") % 17 != 0).count()
    assert out.count() == n_train


def test_contamination_flag_matches_integer_threshold(spark):
    from covid_19_fl_spark.llmops import text

    docs = tables.load(spark, SF_SMOKE, "documents")
    out = text.contamination_stats(
        docs, "text", "doc_id", F.col("doc_id") % 17 == 0, n=5, flag_pct=20
    )
    bad = out.filter(
        F.col("contaminated")
        != (
            (F.col("n_grams") > 0)
            & (F.col("n_contam") * 100 >= F.col("n_grams") * 20)
        )
    ).count()
    assert bad == 0


def test_prefix_dup_groups_have_two_plus_docs(spark):
    docs = tables.load(spark, SF_SMOKE, "documents")
    groups = dedup.prefix_dup_groups(docs, "text", "doc_id", k=10)
    assert groups.filter(F.col("n_docs") < 2).count() == 0
    # canonical id is a member: re-derive each canonical doc's fp
    assert groups.count() > 0


def test_histogram_quantiles_bracket_exact(spark):
    """The binned p50 must bracket the exact median: bin_lo ≤ exact
    median < bin_lo + width."""
    from covid_19_fl_spark import suite

    out = {
        r["pct"]: r
        for r in suite.QUERIES["x_histogram_quantiles"](spark, SF_SMOKE).collect()
    }
    li = tables.load(spark, SF_SMOKE, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50")
    ).collect()[0]["p50"]
    assert out[50]["bin_lo"] <= exact < out[50]["bin_lo"] + 1000


def test_ndcg_between_zero_and_one(spark):
    from covid_19_fl_spark import suite

    rows = suite.QUERIES["ss_ndcg_eval"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9


def test_rolling_corr_bounded(spark):
    from covid_19_fl_spark import suite

    rows = suite.QUERIES["x_rolling_corr"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["corr30"] is not None:
            assert -1.0 - 1e-9 <= r["corr30"] <= 1.0 + 1e-9


def test_logreg_gd_deterministic_and_nonzero(spark):
    """Two runs must produce bit-identical weights (the fixed-point
    contract), and three epochs on real features must move them."""
    from covid_19_fl_spark import suite

    a = sorted(tuple(r) for r in suite.QUERIES["ml_logreg_gd"](spark, SF_SMOKE).collect())
    b = sorted(tuple(r) for r in suite.QUERIES["ml_logreg_gd"](spark, SF_SMOKE).collect())
    assert a == b
    assert any(r[1] != 0 for r in a)


def test_semantic_dedup_drops_have_lower_partner(spark):
    from covid_19_fl_spark import suite

    rows = suite.QUERIES["dd_semantic_dedup"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["kept_partner"] < r["drop_id"]
        assert r["partner_cos"] >= 0.35


def test_uniform_rebalance_equal_source_counts(spark):
    from covid_19_fl_spark import suite

    out = suite.QUERIES["sp_uniform_rebalance"](spark, SF_SMOKE)
    per_src = out.groupBy("source").count().collect()
    sizes = {r["count"] for r in per_src}
    assert len(sizes) == 1  # every source capped to the same quota
