"""Property tests for the murmur3-based llmops operators that have no
SQL oracle (MinHash/SimHash/LSH), plus multimodal batch plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.llmops import dedup, multimodal, similarity
from covid_19_fl_spark import tables


@pytest.fixture(scope="module")
def docs_dup(spark):
    """documents + planted near-duplicates: doc 9001 = copy of doc 1,
    doc 9002 = doc 1 with one word changed, doc 9003 = unrelated."""
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    base = docs.filter(F.col("doc_id") == 1).first()
    words = base.text.split(" ")
    mutated = " ".join(["zzz" if i == 3 else w for i, w in enumerate(words)])
    extra = spark.createDataFrame(
        [
            (9001, base.text, base.lang, base.source, base.n_chars),
            (9002, mutated, base.lang, base.source, len(mutated)),
            (9003, "totally different content " * 10, base.lang, "srcX", 260),
        ],
        schema=docs.schema,
    )
    return docs.unionByName(extra)


def test_minhash_identical_docs_collide(spark, docs_dup):
    pairs = dedup.minhash_lsh_pairs(
        docs_dup, "text", "doc_id", num_hashes=32, bands=8, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert (1, 9001) in found and found[(1, 9001)] == 1.0
    assert (1, 9002) in found and 0.5 <= found[(1, 9002)] < 1.0
    assert not any(9003 in p for p in found)


def test_minhash_signature_deterministic(spark, docs_dup):
    sig = dedup.minhash_signature(F.col("text"), num_hashes=16)
    a = docs_dup.select("doc_id", sig.alias("sig")).collect()
    b = docs_dup.repartition(7).select("doc_id", sig.alias("sig")).collect()
    assert {r.doc_id: tuple(r.sig) for r in a} == {r.doc_id: tuple(r.sig) for r in b}


def test_simhash_near_dup_small_hamming(spark, docs_dup):
    sigs = {
        r.doc_id: r.sig
        for r in docs_dup.select(
            "doc_id", dedup.simhash32(F.col("text")).alias("sig")
        ).collect()
    }
    assert sigs[1] == sigs[9001]  # identical text → identical simhash
    hamming = bin(sigs[1] ^ sigs[9002]).count("1")
    assert hamming <= 8  # one-word mutation stays close


def test_simhash_pairs_finds_planted(spark, docs_dup):
    pairs = dedup.simhash_pairs(docs_dup, "text", "doc_id", max_hamming=8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 9001) in found


def test_ivf_matches_bruteforce_for_in_cluster_neighbors(spark):
    """IVF with nprobe=1 must agree with brute force whenever the true
    top-k lives in the probed cluster (labels are the true clusters)."""
    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    brute = similarity.cosine_topk(emb, [0, 1, 2], k=3).collect()
    ivf = similarity.ivf_topk(emb, [0, 1, 2], k=3).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    brute_by_q = {}
    for r in brute:
        brute_by_q.setdefault(r.query_id, []).append(r)
    ivf_by_q = {}
    for r in ivf:
        ivf_by_q.setdefault(r.query_id, []).append(r)
    for q, rows in brute_by_q.items():
        if all(labels[r.neighbor_id] == labels[q] for r in rows):
            assert [r.neighbor_id for r in sorted(rows, key=lambda r: r.rank)] == [
                r.neighbor_id for r in sorted(ivf_by_q[q], key=lambda r: r.rank)
            ], f"query {q}"


def test_lsh_topk_subset_of_bruteforce_candidates(spark):
    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    res = similarity.lsh_bucketed_topk(emb, [0, 1], k=5, planes=4).collect()
    assert len(res) > 0
    for r in res:
        assert -1.0 <= r.cos_sim <= 1.0


def test_multimodal_batch_plumbing(spark):
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = multimodal.to_media(docs)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.n_bytes > 0 and len(r.feature) == 8
        assert all(0.0 <= f <= 1.0 for f in r.feature)
    # deterministic across partitionings
    feats2 = multimodal.extract_features(media.repartition(5)).collect()
    assert {r.doc_id: (r.n_bytes, r.checksum) for r in feats} == {
        r.doc_id: (r.n_bytes, r.checksum) for r in feats2
    }


def test_multimodal_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload(b"\x89PNG", "image/png")
