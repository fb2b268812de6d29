"""operators.graph.pagerank — deterministic fixed-point iteration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.operators.graph import PR_SCALE, pagerank


@pytest.fixture(scope="module")
def star(spark):
    # hub node 0 ↔ leaves 1..4 (undirected as two directed edges each)
    pairs = [(0, i) for i in range(1, 5)]
    edges = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(edges, "src: long, dst: long")


def test_star_hub_outranks_leaves(spark, star):
    ranks = {r.node_id: r.pr for r in pagerank(star, iterations=10).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    assert all(ranks[0] > ranks[i] for i in range(1, 5))
    # leaves are symmetric → identical fixed-point values, exactly
    assert len({ranks[i] for i in range(1, 5)}) == 1


def test_mass_is_conserved_up_to_floor_dust(spark, star):
    total = (
        pagerank(star, iterations=5)
        .agg(F.sum("pr").alias("t"))
        .first()
        .t
    )
    # floor division leaks at most a few units per node per round
    assert 0.99 * PR_SCALE <= total <= PR_SCALE


def test_partitioning_invariance_bit_exact(spark, star):
    """The int64 update is associative — any partitioning yields the
    byte-identical result (the property float PageRank lacks)."""
    a = sorted(map(tuple, pagerank(star, iterations=6).collect()))
    b = sorted(map(tuple, pagerank(star.repartition(7), iterations=6).collect()))
    assert a == b


def test_checkpoint_cadence_does_not_change_values(spark, star):
    a = sorted(map(tuple, pagerank(star, iterations=5, checkpoint_every=2).collect()))
    b = sorted(map(tuple, pagerank(star, iterations=5, checkpoint_every=100).collect()))
    assert a == b


def test_dangling_sink_accumulates(spark):
    """src-only chain a→b→c: c has no out-edges (dangling); with the
    simplified update its rank exceeds the teleport floor while a
    (no in-edges) sits exactly at it."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src: long, dst: long")
    ranks = {r.node_id: r.pr for r in pagerank(edges, iterations=8).collect()}
    n = 3
    teleport = (PR_SCALE * 15 // 100) // n
    assert ranks[1] == teleport
    assert ranks[3] > ranks[2] > ranks[1]
