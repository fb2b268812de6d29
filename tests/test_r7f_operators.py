"""Property tests for the round-7 batch-F operators (soft-dedup
weights, Heaps'-law fit, modularity, centroid silhouette)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from covid_19_fl_spark import suite


def test_soft_dedup_weights_mass_conservation(spark, sf_dir):
    from covid_19_fl_spark.tables import load

    rows = suite.QUERIES["sp_soft_dedup_weights"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    # Σ eff_docs over all sources == number of DISTINCT texts (each
    # dup group contributes exactly 1.0 in total, split across copies)
    n_unique = (
        docs.select(
            F.md5(
                F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
            ).alias("fp")
        )
        .distinct()
        .count()
    )
    assert abs(sum(r.eff_docs for r in rows) - n_unique) < 1e-3
    for r in rows:
        assert 0 < r.eff_docs <= r.n_docs
        assert 0 < r.eff_tokens <= r.n_tokens + 1e-6


def test_heaps_law_fit_is_sane_and_deterministic(spark, sf_dir):
    row = suite.QUERIES["tx_heaps_law"](spark, sf_dir).collect()[0]
    # vocabulary grows sublinearly but does grow
    assert 0.0 < row.heaps_beta <= 1.0
    assert row.n_points > 0
    again = suite.QUERIES["tx_heaps_law"](spark, sf_dir).collect()[0]
    assert (row.heaps_beta, row.ln_k) == (again.heaps_beta, again.ln_k)


def test_modularity_bounds_and_totals(spark, sf_dir):
    rows = suite.QUERIES["x_modularity"](spark, sf_dir).collect()
    assert rows, "LPA produced no communities"
    total_q = sum(r.q_contrib for r in rows)
    assert -0.5 <= total_q <= 1.0  # Newman modularity range
    # degree sums add up to 2m; internal edges never exceed m
    m = sum(r.internal_edges for r in rows)  # lower bound on m
    assert all(r.internal_edges >= 0 and r.n_nodes >= 1 for r in rows)
    assert sum(r.degree_sum for r in rows) >= 2 * m


def test_silhouette_range_and_membership(spark, sf_dir):
    rows = suite.QUERIES["ml_silhouette"](spark, sf_dir).collect()
    kmeans = {
        r.cluster_id: r.n_members
        for r in suite.QUERIES["ml_kmeans_clusters"](spark, sf_dir).collect()
    }
    assert {r.cluster_id: r.n_members for r in rows} == kmeans
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert not math.isnan(r.mean_silhouette)
