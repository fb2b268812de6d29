"""operators.sketch.count_min_topk — mergeable frequency sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.operators.sketch import count_min_topk


@pytest.fixture(scope="module")
def skewed(spark):
    # key 7 appears 60×, key 11 30×, the rest once each
    rows = [(7,)] * 60 + [(11,)] * 30 + [(i,) for i in range(100, 140)]
    return spark.createDataFrame(rows, "uid: long")


def test_estimates_never_undercount(spark, skewed):
    est = {r.key: r.est_count for r in count_min_topk(skewed, "uid", k=100).collect()}
    true = {
        str(r.uid): r.c
        for r in skewed.groupBy("uid").agg(F.count("*").alias("c")).collect()
    }
    for k, t in true.items():
        if k in est:
            assert est[k] >= t, (k, est[k], t)


def test_heavy_hitters_surface_first(spark, skewed):
    top = count_min_topk(skewed, "uid", k=2).collect()
    assert [r.key for r in top] == ["7", "11"]
    # width 256 ≫ 42 distinct keys → collisions unlikely; the heavy
    # keys' estimates equal their true counts here
    assert top[0].est_count >= 60 and top[1].est_count >= 30


def test_partitioning_invariance(spark, skewed):
    a = [tuple(r) for r in count_min_topk(skewed, "uid", k=50).collect()]
    b = [tuple(r) for r in count_min_topk(skewed.repartition(13), "uid", k=50).collect()]
    assert a == b
