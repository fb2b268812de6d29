"""Deterministic Lloyd k-means (llmops/clustering.py): Lloyd's
monotone-inertia law, partition invariance, and tie-breaking."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import tables
from covid_19_fl_spark.llmops import clustering

SF = "/root/testdata/sf0.001"


def _total_inertia(spark, emb, rounds):
    assigned = clustering.kmeans_lloyd(emb, rounds=rounds)
    return (
        assigned.agg(F.sum(F.col("rdist").cast("decimal(28,6)")).alias("i"))
        .first()
        .i
    )


def test_inertia_never_increases_across_rounds(spark):
    emb = tables.load(spark, SF, "embeddings")
    inertias = [float(_total_inertia(spark, emb, r)) for r in (1, 2, 3)]
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-6, inertias


def test_assignment_partition_invariant(spark):
    emb = tables.load(spark, SF, "embeddings")
    a = clustering.kmeans_lloyd(emb, rounds=2).collect()
    b = clustering.kmeans_lloyd(emb.repartition(13), rounds=2).collect()
    assert sorted((r.vec_id, r.cluster_id, r.rdist) for r in a) == sorted(
        (r.vec_id, r.cluster_id, r.rdist) for r in b
    )


def test_assign_nearest_breaks_ties_by_lowest_cluster(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [0.0, 1.0])], "cluster_id int, centroid array<double>"
    )
    got = clustering.assign_nearest(emb, cents, "vec_id", "embedding").collect()
    assert len(got) == 1 and got[0].cluster_id == 3  # equidistant → lowest id


def test_every_vector_assigned_exactly_once(spark):
    emb = tables.load(spark, SF, "embeddings")
    n = emb.count()
    assigned = clustering.kmeans_lloyd(emb, rounds=2)
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
