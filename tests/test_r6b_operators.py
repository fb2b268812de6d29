"""Property tests for the round-6 batch-B operators (HITS, binary
quantization ANN, approx quantiles, line-level dedup), beyond the
DuckDB oracle equality the driver gate enforces."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import suite
from covid_19_fl_spark.llmops.similarity import (
    BQ_WORD_BITS,
    binary_codes,
    binary_quantize_topk,
    hamming_words,
)
from covid_19_fl_spark.operators.graph import HITS_SCALE, hits

from .conftest import SF_SMOKE


def test_binary_codes_known_values(spark):
    # dims 1..4 → bits 2^0..2^3; only positive components set bits.
    df = spark.createDataFrame(
        [(1, [0.5, -0.1, 0.0, 2.0]), (2, [-1.0, -1.0, -1.0, -1.0])],
        "id long, v array<double>",
    )
    got = {
        r.id: r.code
        for r in df.select("id", binary_codes(F.col("v")).alias("code")).collect()
    }
    assert got[1] == [0b1001]  # dims 1 and 4 positive; 0.0 is NOT > 0
    assert got[2] == [0]


def test_binary_codes_no_overflow_at_word_boundary(spark):
    # BQ_WORD_BITS+4 all-positive dims must split into two words with
    # the first word all-ones — the exact shape that overflowed a
    # single-long pack on 64-dim inputs.
    dims = BQ_WORD_BITS + 4
    df = spark.createDataFrame([(1, [1.0] * dims)], "id long, v array<double>")
    [row] = df.select(binary_codes(F.col("v")).alias("code")).collect()
    assert row.code == [(1 << BQ_WORD_BITS) - 1, 0b1111]


def test_hamming_words_matches_bruteforce(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.1, 0.3, 2.0], [-0.5, -0.1, 0.3, -2.0])],
        "id long, a array<double>, b array<double>",
    )
    [row] = df.select(
        hamming_words(
            binary_codes(F.col("a")), binary_codes(F.col("b"))
        ).alias("h")
    ).collect()
    # signs differ at dims 1 and 4 (0.5 vs -0.5, 2.0 vs -2.0); dim 2
    # is negative on both sides, dim 3 positive on both.
    assert row.h == 2


def test_binary_quantize_rerank_is_exact_cosine_order(spark):
    # With shortlist >= corpus the result must equal brute-force
    # cosine top-k: the Hamming stage only prunes, never reorders.
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = binary_quantize_topk(emb, [0, 1], k=3, shortlist=10_000).collect()
    from covid_19_fl_spark.llmops.similarity import cosine_topk

    want = cosine_topk(emb, [0, 1], k=3).collect()
    got_pairs = {(r.query_id, r.rank): r.neighbor_id for r in got}
    want_pairs = {(r.query_id, r.rank): r.neighbor_id for r in want}
    assert got_pairs == want_pairs


def test_hits_star_graph(spark):
    # One supplier consumed by every customer: it must take the max
    # auth score (HITS_SCALE); the lone extra supplier scores lower.
    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (3, 200)], "src long, dst long"
    )
    out = {(r.role, r.node_id): r.score for r in hits(edges, iterations=3).collect()}
    assert out[("auth", 100)] == HITS_SCALE
    assert out[("auth", 200)] < HITS_SCALE
    # every hub/auth score is normalized into (0, SCALE]
    assert all(0 < v <= HITS_SCALE for v in out.values())
    # customer 3 cites both suppliers → it is the max-normalized hub
    assert out[("hub", 3)] == HITS_SCALE


def test_hits_partition_invariance(spark):
    edges_rows = [(c, s) for c in range(1, 8) for s in (100 + (c % 3), 200)]
    a = hits(
        spark.createDataFrame(edges_rows, "src long, dst long").repartition(1),
        iterations=3,
    )
    b = hits(
        spark.createDataFrame(edges_rows, "src long, dst long").repartition(7),
        iterations=3,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_line_dedup_drops_repeated_segment(spark, sf_dir, tmp_path):
    # Build a corpus where doc 2's first 10-word segment repeats doc
    # 1's — it must be dropped from doc 2 and kept in doc 1.
    seg = " ".join(f"w{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{seg} {tail}"), (2, f"{seg} unique tail here")],
        "doc_id long, text string",
    )
    import os

    out_dir = str(tmp_path / "docs")
    docs.selectExpr(
        "doc_id", "text", "'en' AS lang", "'src0' AS source",
        "length(text) AS n_chars",
    ).write.parquet(out_dir)
    # reuse the registered query against a scratch sf_dir layout
    os.rename(os.path.join(out_dir), str(tmp_path / "documents.parquet"))
    res = {
        r.doc_id: r
        for r in suite.QUERIES["tx_line_dedup"](spark, str(tmp_path)).collect()
    }
    assert res[1].n_dropped == 0 and res[1].n_kept == 2
    assert res[2].n_dropped == 1 and res[2].n_kept == 1


def test_approx_quantiles_flag_true_everywhere(spark, sf_dir):
    rows = suite.QUERIES["x_approx_quantiles"](spark, sf_dir).collect()
    assert rows and all(r.est_within_band for r in rows)


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    from covid_19_fl_spark.llmops import dedup

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", "lang", id_window=25, n=3, threshold=0.1
    )
    split = suite.QUERIES["sp_leakage_safe_split"](spark, sf_dir)
    a = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    straddling = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0
    # and it is a real split: every doc assigned exactly once
    assert split.count() == docs.count()
    assert split.select("doc_id").distinct().count() == docs.count()


def test_ivfpq_full_routing_equals_pq_adc(spark):
    # with nprobe >= |cells| the IVF stage prunes nothing, so IVFPQ
    # must return exactly the plain PQ ADC top-k.
    from covid_19_fl_spark.llmops.similarity import ivfpq_topk, pq_adc_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    nlabels = emb.select("label").distinct().count()
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in ivfpq_topk(emb, [0, 1], k=3, nprobe=nlabels).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in pq_adc_topk(emb, [0, 1], k=3).collect()
    }
    assert got == want


def test_gbm_stumps_structure(spark, sf_dir):
    rows = {r.round: r for r in suite.QUERIES["ml_gbm_stumps"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for r in rows.values():
        # every split is non-degenerate and partitions the full corpus
        assert r.left_n > 0 and r.right_n > 0
        assert r.left_n + r.right_n == n
    # round 2 fits residuals: its leaf predictions are centered near
    # zero relative to the round-1 price-scale predictions.
    r1, r2 = rows[1], rows[2]
    scale = max(abs(r1.left_pred), abs(r1.right_pred))
    assert max(abs(r2.left_pred), abs(r2.right_pred)) < scale


def test_snake_sharding_balances_load(spark, sf_dir):
    rows = suite.QUERIES["sp_snake_sharding"](spark, sf_dir).collect()
    assert len(rows) == 8
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n
    # serpentine dealing of size-sorted docs keeps every worker within
    # a few percent of the ideal equal token split
    assert all(0.8 <= r.load_ratio <= 1.2 for r in rows)
