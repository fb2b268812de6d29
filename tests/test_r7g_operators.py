"""Property tests for the round-7 batch-G curation operators (PII
risk report, mix-rebalance plan)."""

from __future__ import annotations

from covid_19_fl_spark import suite


def test_pii_risk_report_consistency(spark, sf_dir):
    from covid_19_fl_spark.tables import load

    rows = suite.QUERIES["cur_pii_risk_report"](spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.docs_with_pii <= r.n_docs
        assert r.total_hits >= r.docs_with_pii  # each flagged doc has >=1 hit
        assert abs(r.pii_doc_rate - r.docs_with_pii / r.n_docs) < 1e-5
        assert r.hits_per_kilotoken >= 0.0


def test_mix_rebalance_plan_invariants(spark, sf_dir):
    rows = suite.QUERIES["cur_mix_rebalance"](spark, sf_dir).collect()
    mix = {
        r.source: r.mix_prob
        for r in suite.QUERIES["sp_temperature_mix"](spark, sf_dir).collect()
    }
    # the plan's mix column IS sp_temperature_mix's published mix
    assert {r.source: r.mix_prob for r in rows} == mix
    assert abs(sum(r.mix_prob for r in rows) - 1.0) < 1e-4
    total = sum(r.group_tokens for r in rows)
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.achieved_tokens <= r.group_tokens
        # capped sources achieve everything they have
        if r.sample_rate == 1.0:
            assert r.achieved_tokens == r.group_tokens
    # the plan never spends more than the budget on any single source
    # (budget = 50% of corpus tokens, cur_mix_rebalance's
    # _MIX_BUDGET_SHARE), and the per-source targets add back up to it
    # modulo one rounding unit per source
    budget = total // 2
    assert all(r.target_tokens <= budget for r in rows)
    assert abs(sum(r.target_tokens for r in rows) - budget) <= len(rows)


def test_corpus_manifest_order_independence(spark, sf_dir):
    """The manifest digests must be invariant to physical row order /
    partitioning (the property that lets two independently produced
    corpus copies be compared digest-to-digest)."""
    from covid_19_fl_spark.tables import load

    base = {
        r.source: r
        for r in suite.QUERIES["cur_corpus_manifest"](spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents")
    total = docs.count()
    assert sum(r.n_docs for r in base.values()) == total
    for r in base.values():
        assert 0 < r.n_unique_fp <= r.n_docs
        assert 0 <= r.fp_digest < 2147483647
        assert 0 <= r.fp_digest2 < 2147483647
    # recompute from a reshuffled copy of the corpus: identical digests
    from covid_19_fl_spark.llmops import text as T
    from covid_19_fl_spark.llmops.dedup import PORTABLE_PRIME, portable_hash
    from pyspark.sql import functions as F

    shuffled = (
        docs.repartition(7, "doc_id")
        .select(
            "source",
            (portable_hash(T.fingerprint(F.col("text"))) % PORTABLE_PRIME).alias("h0"),
        )
        .groupBy("source")
        .agg((F.sum("h0") % PORTABLE_PRIME).cast("long").alias("fp_digest"))
        .collect()
    )
    assert {r.source: r.fp_digest for r in shuffled} == {
        s: r.fp_digest for s, r in base.items()
    }
