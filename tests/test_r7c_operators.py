"""Property tests for the round-7 batch-C operators (TextRank,
windowFunnel, residual-quantization ADC) beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.llmops.similarity import rq_adc_topk, rq_encode


# ---------------------------------------------------------------------------
# tx_textrank
# ---------------------------------------------------------------------------


def test_textrank_topk_shape(spark, sf_dir):
    rows = suite.QUERIES["tx_textrank"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # ranks are 1..n in (pr desc, word asc) order
    srt = sorted(rows, key=lambda r: (-r.pr, r.word))
    assert [r.rank for r in srt] == list(range(1, len(rows) + 1))
    assert all(r.pr > 0 for r in rows)


def test_textrank_hub_word_wins(spark):
    # star graph: "hub" co-occurs with every spoke -> hub ranks first
    docs = spark.createDataFrame(
        [(i, f"hub spoke{i}") for i in range(6)],
        "doc_id long, text string",
    )
    import covid_19_fl_spark.suite_r7c as r7c
    from covid_19_fl_spark.operators.graph import pagerank

    toks = docs.select(F.split(F.trim(F.lower("text")), r"\s+").alias("ws"))
    adjp = toks.select(
        F.element_at("ws", 1).alias("w1"), F.element_at("ws", 2).alias("w2")
    )
    pairs = adjp.select(
        F.least("w1", "w2").alias("u"), F.greatest("w1", "w2").alias("v")
    ).distinct()
    edges = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).union(pairs.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    pr = {r.node_id: r.pr for r in pagerank(edges, iterations=3).collect()}
    assert pr["hub"] == max(pr.values())
    assert r7c._TR_TOPK == 20


# ---------------------------------------------------------------------------
# x_window_funnel
# ---------------------------------------------------------------------------


def test_window_funnel_partitions_view_users(spark, sf_dir):
    rows = suite.QUERIES["x_window_funnel"](spark, sf_dir).collect()
    assert rows
    assert {r.depth for r in rows} <= {1, 2, 3}
    # depth counts partition exactly the users who ever viewed
    ev = suite.QUERIES["x_event_funnel"](spark, sf_dir).collect()[0]
    assert sum(r.n_users for r in rows) == ev.n_view
    # NOTE: no dominance either way vs x_event_funnel — its global
    # first-times heuristic misses sequences windowFunnel's
    # first-after-previous search finds (and vice versa for the
    # 7-day bound), so only the partition invariant is testable here


def test_window_funnel_respects_window(spark):
    from datetime import datetime

    def ts(d, h=0):
        return datetime(2024, 1, d, h)

    ev = spark.createDataFrame(
        [
            # user 1: full funnel inside 7 days
            (1, "view", ts(1)), (1, "click", ts(2)), (1, "purchase", ts(3)),
            # user 2: click after the 7-day horizon -> depth 1
            (2, "view", ts(1)), (2, "click", ts(9)),
            # user 3: purchase before click -> depth 2 (strict order)
            (3, "view", ts(1)), (3, "purchase", ts(2)), (3, "click", ts(3)),
            # user 4: purchase exists but outside horizon -> depth 2
            (4, "view", ts(1)), (4, "click", ts(2)), (4, "purchase", ts(9)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    import covid_19_fl_spark.suite_r7c as r7c

    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    horizon = F.col("t1") + F.expr(f"INTERVAL {r7c._WF_DAYS} DAYS")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= horizon))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    d = {
        r.user_id: 1 + (r.t2 is not None) + (r.t3 is not None)
        for r in v.join(c.select("user_id", "t2"), ["user_id"], "left")
        .join(p, ["user_id"], "left")
        .collect()
    }
    assert d == {1: 3, 2: 1, 3: 2, 4: 2}


# ---------------------------------------------------------------------------
# ss_rq_topk / rq_encode
# ---------------------------------------------------------------------------


def test_rq_encode_code_domains(spark, sf_dir):
    from covid_19_fl_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    labels = {r.label for r in emb.select("label").distinct().collect()}
    codes = rq_encode(emb).collect()
    assert len(codes) == emb.count()
    assert {r.c1_label for r in codes} <= labels
    assert all(0 <= r.c2_code < 8 for r in codes)


def test_rq_adc_ranks_are_dense(spark, sf_dir):
    from covid_19_fl_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    rows = rq_adc_topk(emb, [0, 1, 2], k=3).collect()
    by_q = {}
    for r in rows:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, nbrs in by_q.items():
        srt = sorted(nbrs, key=lambda n: (-n.adc_score, n.neighbor_id))
        assert [n.rank for n in srt] == list(range(1, len(nbrs) + 1))


def test_rq_reconstruction_better_than_coarse_only(spark, sf_dir):
    # adding the residual codeword must not increase reconstruction
    # error on average: ||v - c1 - c2||^2 <= ||v - c1||^2 in the mean
    # (c2 is the mean of its bucket's residuals)
    import numpy as np

    from covid_19_fl_spark.llmops.similarity import label_centroids
    from covid_19_fl_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    cents = {
        r[0]: np.array(r.centroid)
        for r in label_centroids(emb).collect()
    }
    codes = {r[0]: (r.c1_label, r.c2_code) for r in rq_encode(emb).collect()}
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    # recompute level-2 codebook from assignments
    resid = {i: vecs[i] - cents[codes[i][0]] for i in vecs}
    buckets = {}
    for i, r in resid.items():
        buckets.setdefault(i % 8, []).append(r)
    cent2 = {b: np.mean(np.stack(v), axis=0) for b, v in buckets.items()}
    e1 = np.mean([np.sum(resid[i] ** 2) for i in vecs])
    # per-vector BEST codeword of the mean codebook: i%8 is always a
    # candidate and the bucket mean minimizes its own bucket's error,
    # so the min can only improve on e1
    e2 = np.mean(
        [
            min(np.sum((resid[i] - c) ** 2) for c in cent2.values())
            for i in vecs
        ]
    )
    assert e2 <= e1 + 1e-9


# ---------------------------------------------------------------------------
# st_late_data_audit
# ---------------------------------------------------------------------------


def test_late_data_audit_reconciles(spark, sf_dir):
    [row] = suite.QUERIES["st_late_data_audit"](spark, sf_dir).collect()
    # the stream's observed drop metric must equal the engine-side
    # expectation (distinct echoed days), independently computed
    assert row.n_late_windows_observed == row.n_late_windows_expected
    assert row.n_late_windows_observed > 0  # the redelivery really dropped
    assert row.n_echo_rows >= row.n_late_windows_expected
    # emitted windows hold original counts only — no echo double-count
    from covid_19_fl_spark.tables import load

    ev = load(spark, sf_dir, "events")
    total = ev.count()
    assert 0 < row.n_rows_emitted <= total
    assert row.n_windows_emitted > 0
