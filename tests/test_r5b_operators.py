"""Property tests for the round-5 batch-B operators (edit-distance
join, merkle diff, FD profiling, record linkage, weighted SSSP),
beyond the DuckDB oracle equality the driver gate enforces."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.llmops import dedup

from .conftest import SF_SMOKE


def test_edit_distance_pairs_covers_all_edit_kinds(spark):
    # the deletion-neighborhood join must catch every ed<=1 relation:
    # exact dup, substitution, insertion, deletion — and nothing at
    # distance 2.
    rows = [
        (1, "banana"),
        (2, "banana"),   # ed 0 to 1
        (3, "banxna"),   # substitution, ed 1 to 1/2
        (4, "bananna"),  # insertion, ed 1 to 1/2
        (5, "banan"),    # deletion, ed 1 to 1/2 (and ed 2 to 4)
        (6, "bxnxna"),   # ed 2 to banana — must NOT appear with 1
        (7, "zzz"),      # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, s string").repartition(3)
    got = {
        (r.id_a, r.id_b): r.ed
        for r in dedup.edit_distance_pairs(df, "s", "doc_id").collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(1, 4)] == 1 and got[(2, 4)] == 1
    assert got[(1, 5)] == 1 and got[(2, 5)] == 1
    assert (1, 6) not in got and (2, 6) not in got
    # 6 is ed-1 from 3 only ("banxna" -> "bxnxna" is one substitution)
    assert {p for p in got if 6 in p} == {(3, 6)}
    assert not any(7 in p for p in got)
    assert all(ed <= 1 for ed in got.values())


def test_merkle_diff_localizes_to_drifted_buckets(spark):
    from covid_19_fl_spark.suite_r5b import _MD_BUCKETS, _MD_DEL, _MD_UPD

    out = suite.QUERIES["x_merkle_diff"](spark, SF_SMOKE).collect()
    keys = [
        r.k
        for r in suite.QUERIES["x_merkle_diff"]
        .__globals__["_t"](spark, SF_SMOKE, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .collect()
    ]
    deleted = {k for k in keys if k % _MD_DEL == 0}
    updated = {k for k in keys if k % _MD_UPD == 0 and k % _MD_DEL != 0}
    want_buckets = {k % _MD_BUCKETS for k in deleted | updated}
    got_buckets = {r.bucket for r in out}
    assert got_buckets == want_buckets
    # every drifted row shows up exactly once on the correct side
    assert sum(r.rows_only_a for r in out) == len(deleted) + len(updated)
    assert sum(r.rows_only_b for r in out) == len(updated)
    # counts: A has all bucket rows, B misses only the deleted ones
    assert sum(r.n_a - r.n_b for r in out) == len(deleted)


def test_fd_violations_bounds_and_totals(spark):
    out = {r.fd: r for r in suite.QUERIES["x_fd_violations"](spark, SF_SMOKE).collect()}
    assert len(out) == 5
    for r in out.values():
        # g3 error is at most (rows - groups): one keeper per group
        assert 0 <= r.violations <= r.n_rows - r.n_lhs_groups
        assert 0.0 <= r.violation_rate <= 1.0
        assert r.n_lhs_groups <= r.n_rows
    # hand-recompute one FD's g3 error directly
    cust = suite.QUERIES["x_fd_violations"].__globals__["_t"](
        spark, SF_SMOKE, "customer"
    )
    per = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .count()
        .groupBy("c_nationkey")
        .agg(F.sum("count").alias("n"), F.max("count").alias("m"))
        .agg(F.sum(F.col("n") - F.col("m")).alias("v"))
        .collect()[0]
        .v
    )
    assert out["customer: c_nationkey -> c_mktsegment"].violations == per


def test_record_linkage_finds_true_entities(spark):
    rows = {
        r.link_class: r
        for r in suite.QUERIES["er_record_linkage"](spark, SF_SMOKE).collect()
    }
    assert set(rows) <= {"match", "possible", "nonmatch"}
    n_cust = (
        suite.QUERIES["er_record_linkage"]
        .__globals__["_t"](spark, SF_SMOKE, "customer")
        .count()
    )
    # every original meets its twin inside its own block, so true
    # pairs across all classes must equal the customer count
    assert sum(r.n_true_entity for r in rows.values()) == n_cust
    # the match class is dominated by true entities (precision), and
    # match+possible together capture nearly all of them (recall)
    m = rows["match"]
    assert m.n_true_entity >= 0.9 * m.n_pairs
    assert m.n_true_entity >= 0.8 * n_cust
    recall_pool = m.n_true_entity + rows.get(
        "possible", type("r", (), {"n_true_entity": 0})
    ).n_true_entity
    assert recall_pool >= 0.95 * n_cust
    # non-matches exist and are mostly false pairs (a handful of
    # doubly-dirtied twins legitimately score low)
    nm = rows["nonmatch"]
    assert nm.n_pairs > 0 and nm.n_true_entity <= 0.05 * nm.n_pairs


def test_sssp_weighted_dominates_bfs_hops(spark):
    # with unit lower-bounded weights, weighted distance >= hop count;
    # and the source set (node % 89 = 0) must sit at distance 0
    hist = {
        r.dist: r.n_nodes
        for r in suite.QUERIES["x_sssp_weighted"](spark, SF_SMOKE).collect()
    }
    assert hist, "empty histogram"
    assert all(d == -1 or d >= 0 for d in hist)
    # max reachable distance is bounded by rounds * max weight
    assert max(d for d in hist if d >= 0) <= 4 * 5
    # 0-distance nodes are exactly the sources present in the graph
    assert hist.get(0, 0) >= 1
