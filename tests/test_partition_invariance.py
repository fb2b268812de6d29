"""Suite-wide determinism under re-partitioning.

The 100 TB claim behind the portable/deterministic operator designs is
that results do not depend on the physical partitioning — re-running
with a different shuffle fan-out yields byte-identical output. This
exercises the claim across one representative query per determinism
technique (portable-hash LSH, integer fixed-point iteration,
quantized centroids, sketch, window series, fold-based EWMA).
"""

from __future__ import annotations

import pytest

from covid_19_fl_spark import suite

from .conftest import SF_SMOKE

REPRESENTATIVES = [
    "dd_minhash_lsh_pairs",
    "x_pagerank",
    "ss_ivf_topk",
    "x_count_min_topk",
    "w1_cumulative_daily",
    "x_ewma",
    "cur_funnel",
    "x_decayed_popularity",
    "tx_boilerplate_ngrams",
    "ss_pq_quantize",
    "x_agg_state_rollup",
    # r4: ordered-fold float H + distributed doubled-rank prefix
    "x_kruskal_wallis",
    # r4: bucket-spine running sum + struct-max peak selection
    "x_peak_concurrency",
    # r4: corpus-frequency join + per-doc island merge
    "dd_exact_substr_spans",
    # r8: binaryFile scan + Arrow decode (path-derived keys, no
    # partitioning assumption in the fixture materialization)
    "mm_binary_media_scan",
    # r8: Morton interleave + z-prefix cells (pure keyed agg)
    "x_zorder_layout",
    # r8: domain-bounded prefix-sum bin assignment
    "x_compaction_plan",
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_is_partitioning_invariant(spark, name):
    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, suite.QUERIES[name](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = sorted(map(tuple, suite.QUERIES[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert a == b, f"{name} output depends on shuffle partitioning"
