"""Property tests for the round-7 batch-E multimodal operators — the
real PNG/WAV encode→decode round-trips under the oracle gate."""

from __future__ import annotations

from covid_19_fl_spark import suite
from covid_19_fl_spark.llmops.multimodal import (
    _decode_png,
    _decode_wav,
    _md5_stream,
    encode_png_gray,
    encode_wav_pcm16,
)


def test_png_encode_decode_roundtrip_all_shapes():
    for w, h in ((1, 1), (8, 8), (5, 3)):
        px = _md5_stream("probe", "px", w * h)
        got = _decode_png(encode_png_gray(w, h, px))
        assert got == (w, h, 1, px)


def test_wav_encode_decode_roundtrip():
    import numpy as np

    raw = _md5_stream("probe", "au", 64)
    samples = [(raw[2 * k] << 8 | raw[2 * k + 1]) - 32768 for k in range(32)]
    dec = np.frombuffer(_decode_wav(encode_wav_pcm16(samples)), dtype="<i2")
    assert list(dec) == samples


def test_ahash_buckets_group_duplicate_texts(spark):
    docs = spark.createDataFrame(
        [(1, "same words", "s"), (2, "same words", "s"), (3, "other", "s")],
        "doc_id long, text string, source string",
    )
    from covid_19_fl_spark.llmops.multimodal import ahash_images

    rows = {r.doc_id: (r.ahash_w0, r.ahash_w1) for r in ahash_images(docs).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_wav_loudness_ranges(spark, sf_dir):
    rows = suite.QUERIES["mm_wav_loudness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_samples == 32
        assert 0 <= r.peak_abs <= 32768
        assert r.sum_abs <= 32 * 32768
        assert 0.0 <= r.rms <= 32768.0


def test_ahash_bucket_sizes_consistent(spark, sf_dir):
    rows = suite.QUERIES["mm_ahash_image_dedup"](spark, sf_dir).collect()
    assert rows
    by_hash = {}
    for r in rows:
        by_hash.setdefault((r.ahash_w0, r.ahash_w1), []).append(r)
    for key, members in by_hash.items():
        assert all(m.bucket_size == len(members) for m in members)
        assert all(0 <= m.ahash_w0 < 2**32 and 0 <= m.ahash_w1 < 2**32 for m in members)
