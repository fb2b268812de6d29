"""operators.graph.ra_link_scores + suite_r7._lpa_labels — pinned
against hand-computed expectations on a small graph (the oracle gate
covers the full corpus; this covers the operator internals on known
topology). The expectations are shape-independent: they survived the
round-10 neighbor-array rewrite and the round-11 wedge-join rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark import suite as _suite  # noqa: F401  (registry import order)
from covid_19_fl_spark.operators.graph import ra_link_scores
from covid_19_fl_spark.suite_r7 import _lpa_labels


@pytest.fixture(scope="module")
def path4(spark):
    # path 1-2-3-4 plus a triangle 1-2-5: degrees 1:3, 2:3, 3:2, 4:1, 5:2
    edges = [(1, 2), (2, 3), (3, 4), (1, 5), (2, 5)]
    return spark.createDataFrame(edges, "u: long, v: long")


def test_ra_scores_match_hand_computation(spark, path4):
    rows = {
        (r.u, r.w): (r.cn, r.ra) for r in ra_link_scores(path4).collect()
    }
    # Non-adjacent pairs with >=1 common neighbor:
    #  (1,3): common z=2 (deg 3)            → cn 1, ra 1/3
    #  (2,4): common z=3 (deg 2)            → cn 1, ra 1/2
    #  (3,5): common z=2 (deg 3)            → cn 1, ra 1/3
    #  (1,4), (4,5): no common neighbor     → absent
    # Adjacent pairs (e.g. (1,2) via z=5) must be anti-joined away.
    assert rows == {
        (1, 3): (1, round(1 / 3, 6)),
        (2, 4): (1, 0.5),
        (3, 5): (1, round(1 / 3, 6)),
    }


def test_ra_scores_degree_fold_is_sorted(spark):
    # square 1-2-3-4-1 with a chord 2-4: pair (1,3) has common
    # neighbors z=2 (deg 3) and z=4 (deg 3) → ra folds the SORTED
    # degree list [3.0, 3.0]: (0 + 1/3) + 1/3
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]
    df = spark.createDataFrame(edges, "u: long, v: long")
    rows = {(r.u, r.w): (r.cn, r.ra) for r in ra_link_scores(df).collect()}
    assert rows[(1, 3)] == (2, round((0.0 + 1 / 3) + 1 / 3, 6))


def test_lpa_argmax_tie_breaks_to_smallest_label(spark):
    # Triangle 1-2-3: every node sees two distinct neighbor labels
    # (count 1 each) every round — the tie must resolve to the SMALLEST
    # label, so after round 1 everyone except node 1 adopts label 1,
    # and the fixed point is all-1.
    edges = [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "u: long, v: long")
    labels, nbrs = _lpa_labels(df)
    # explicit synchronous trace (3 rounds, ties to min):
    # r0: 1→1, 2→2, 3→3
    # r1: 1 sees {2,3}→2; 2 sees {1,3}→1; 3 sees {1,2}→1
    # r2: 1 sees {1,1}→1; 2 sees {2,1}→1; 3 sees {2,1}→1
    # r3: 1 sees {1,1}→1; 2 sees {1,1}→1; 3 sees {1,1}→1
    got = {(r.node, r.label) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}
    # degrees read off the checkpointed neighbor arrays
    degs = {
        r.b: r.d
        for r in nbrs.select("b", F.size("dsts").alias("d")).collect()
    }
    assert degs == {1: 2, 2: 2, 3: 2}
