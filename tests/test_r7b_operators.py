"""Property tests for the round-7 batch-B operators (readability,
stupid-backoff LM, feature hashing, kNN graph, clustering coefficient,
KMV sketch, calibration summary, personalized PageRank) beyond the
DuckDB oracle equality the driver gate enforces."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.llmops.similarity import knn_graph
from covid_19_fl_spark.operators.graph import (
    PR_SCALE,
    personalized_pagerank,
)


# ---------------------------------------------------------------------------
# tx_readability
# ---------------------------------------------------------------------------


def test_readability_syllable_floor_and_formula(spark, sf_dir):
    rows = suite.QUERIES["tx_readability"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every word contributes >= 1 syllable
        assert r.n_syllables >= r.n_words
        spw = r.n_syllables / r.n_words
        assert abs(r.fk_grade - round(0.39 * r.n_words + 11.8 * spw - 15.59, 6)) < 1e-9
        assert r.flesch_ease <= 206.835


# ---------------------------------------------------------------------------
# tx_trigram_backoff
# ---------------------------------------------------------------------------


def test_trigram_backoff_scores_are_logprobs(spark, sf_dir):
    df = suite.QUERIES["tx_trigram_backoff"](spark, sf_dir)
    rows = df.collect()
    assert rows
    # only held-out (odd) docs are scored
    assert all(r.doc_id % 2 == 1 for r in rows)
    for r in rows:
        if r.n_trigrams > 0:
            # stupid-backoff scores are <= ln(1) = 0 only when every
            # trigram is deterministic; in general the MEAN of ln S
            # with S <= 1 must be <= 0 (counts never exceed contexts)
            assert r.avg_logscore <= 1e-9


def test_trigram_backoff_exercises_backoff_tiers(spark, sf_dir):
    # a trigram present only in an odd (held-out) doc must fall back:
    # with a disjoint train split, at least one scored trigram is
    # unseen at sf0.001 (the corpus is random word soup)
    from covid_19_fl_spark.suite_r7b import _SB_ALPHA

    assert 0 < _SB_ALPHA < 1


# ---------------------------------------------------------------------------
# tx_hash_features
# ---------------------------------------------------------------------------


def test_hash_features_bins_and_mass(spark, sf_dir):
    df = suite.QUERIES["tx_hash_features"](spark, sf_dir)
    rows = df.collect()
    assert rows
    assert all(0 <= r.bin < 16 for r in rows)
    # |signed sum| <= token count per bucket, equality iff no collisions
    assert all(abs(r.feat_val) <= r.n_terms for r in rows)
    # total hashed terms == total whitespace tokens
    docs = suite.QUERIES["tx_readability"](spark, sf_dir)
    n_tokens = docs.agg(F.sum("n_words")).collect()[0][0]
    assert sum(r.n_terms for r in rows) == n_tokens


def test_hash_features_deterministic_sign(spark):
    # same token always lands in the same (bin, sign)
    df = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "alpha beta beta")],
        "doc_id long, text string",
    )
    import covid_19_fl_spark.suite_r7b as r7b

    tok = df.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    )
    from covid_19_fl_spark.llmops.dedup import portable_hash

    out = (
        tok.withColumn("h", portable_hash(F.col("w")))
        .select("w", F.expr(f"(h div 2) % {r7b._FH_BINS}").alias("bin"))
        .distinct()
        .groupBy("w")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in out)


# ---------------------------------------------------------------------------
# ss_knn_graph
# ---------------------------------------------------------------------------


def test_knn_graph_shape_and_mutuality(spark, sf_dir):
    df = suite.QUERIES["ss_knn_graph"](spark, sf_dir)
    rows = df.collect()
    assert rows
    by_vec = {}
    edges = set()
    for r in rows:
        assert r.vec_id != r.neighbor_id
        by_vec.setdefault(r.vec_id, []).append(r)
        edges.add((r.vec_id, r.neighbor_id))
    for vid, nbrs in by_vec.items():
        assert len(nbrs) <= 4
        ranks = sorted(n.rank for n in nbrs)
        assert ranks == list(range(1, len(nbrs) + 1))
        # ranks ordered by (cos desc, id asc)
        srt = sorted(nbrs, key=lambda n: (-n.cos_sim, n.neighbor_id))
        assert [n.rank for n in srt] == list(range(1, len(nbrs) + 1))
    for r in rows:
        assert r.mutual == ((r.neighbor_id, r.vec_id) in edges)


def test_knn_graph_matches_bruteforce_tiny(spark):
    import numpy as np

    rng = [
        (i, [float(((i * 37 + j * 11) % 17) - 8) for j in range(6)])
        for i in range(9)
    ]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    got = {
        (r.vec_id, r.rank): r.neighbor_id
        for r in knn_graph(emb, k=2).collect()
    }
    M = np.array([v for _, v in rng])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)
    for i in range(9):
        cand = [(-S[i, j], j) for j in range(9) if j != i]
        cand.sort()
        for rk in (1, 2):
            assert got[(i, rk)] == cand[rk - 1][1]


def test_knn_graph_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert knn_graph(emb, k=3).count() == 0


# ---------------------------------------------------------------------------
# x_clustering_coefficient
# ---------------------------------------------------------------------------


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = suite.QUERIES["x_clustering_coefficient"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.lcc <= 1.0
        if r.degree < 2:
            assert r.lcc == 0.0 and r.n_triangles == 0
        # tri(v) <= deg(v) choose 2
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_clustering_coefficient_triangle_mass(spark, sf_dir):
    # sum over vertices of tri(v) == 3 * global triangle count
    rows = suite.QUERIES["x_clustering_coefficient"](spark, sf_dir).collect()
    [glob] = suite.QUERIES["x_triangle_count"](spark, sf_dir).collect()
    assert sum(r.n_triangles for r in rows) == 3 * glob.n_triangles


# ---------------------------------------------------------------------------
# x_kmv_sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark, sf_dir):
    rows = suite.QUERIES["x_kmv_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_used <= 64
        if r.k_used < 64:
            # sketch is exact below capacity
            assert r.est_distinct == float(r.exact_distinct)
        else:
            # unbiased-ish: within 4 relative standard errors
            # (1/sqrt(k-2) ~ 12.7%)
            rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
            assert rel < 4 / math.sqrt(62)


# ---------------------------------------------------------------------------
# ml_ece_brier
# ---------------------------------------------------------------------------


def test_ece_brier_ranges_and_bin_consistency(spark, sf_dir):
    [row] = suite.QUERIES["ml_ece_brier"](spark, sf_dir).collect()
    assert 0.0 <= row.ece <= 1.0
    assert 0.0 <= row.brier <= 1.0
    assert row.logloss >= 0.0
    # ECE recomputed from the reliability bins matches
    bins = suite.QUERIES["ml_calibration_bins"](spark, sf_dir).collect()
    n_tot = sum(b.n for b in bins)
    assert n_tot == row.n_events
    ece = sum(b.n * b.abs_gap for b in bins) / n_tot
    # bins round per-bin gaps to 6dp; the summary rounds once — agree to 1e-5
    assert abs(ece - row.ece) < 1e-5


# ---------------------------------------------------------------------------
# x_ppr / personalized_pagerank
# ---------------------------------------------------------------------------


def test_ppr_mass_conservation_and_seed_locality(spark):
    # path graph 1-2-3-4 with seed {1}: with finitely many synchronous
    # rounds mass alternates by parity, so compare nodes of the SAME
    # distance parity — closer to the seed always carries more mass
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "node_id long")
    pr = {
        r.node_id: r.pr
        for r in personalized_pagerank(edges, seeds, iterations=3).collect()
    }
    assert pr[1] > pr[3] >= 0  # even-distance chain
    assert pr[2] > pr[4] >= 0  # odd-distance chain
    # seed keeps at least its own teleport share
    assert pr[1] >= PR_SCALE * 15 // 100
    # total mass stays <= SCALE (floor-division dust only leaks down)
    assert sum(pr.values()) <= PR_SCALE


def test_ppr_no_seed_raises(spark):
    import pytest

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "node_id long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, seeds, iterations=1)


def test_ppr_query_only_reachable(spark, sf_dir):
    rows = suite.QUERIES["x_ppr"](spark, sf_dir).collect()
    assert rows
    assert all(r.pr > 0 for r in rows)


def test_knn_graph_guard_trips_loudly(spark, monkeypatch):
    import covid_19_fl_spark.llmops.similarity as sim
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(sim, "KNN_GRAPH_MAX_ROWS", 3)
    with pytest.raises(RuntimeError, match="bounded-corpus guard"):
        sim.knn_graph(emb, k=2)
