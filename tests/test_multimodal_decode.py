"""Real media decode through the Spark multimodal pipeline: the
stdlib PNG inflater/unfilterer and WAV PCM reader must round-trip the
committed golden fixtures, and extract_features must run them as
NON-passthrough mimes end-to-end (decoded-pixel features, not
file-byte features)."""

from __future__ import annotations

import os
import struct
import zlib

import pytest

from covid_19_fl_spark.llmops import multimodal

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
W, H, C = 8, 6, 3


def _expected_pixels() -> bytes:
    out = bytearray()
    for y in range(H):
        for x in range(W):
            out += bytes(
                (
                    (x * 37 + y * 11) % 256,
                    (x * 5 + y * 73) % 256,
                    (x * 101 + y * 3) % 256,
                )
            )
    return bytes(out)


def _expected_pcm() -> bytes:
    return b"".join(
        struct.pack("<h", (i * 317) % 20000 - 10000) for i in range(100)
    )


def test_png_decode_all_filter_types():
    # golden_rgb.png encodes its 6 rows with filter types 0,1,2,3,4,3
    # — every standard filter is inverted.
    data = open(os.path.join(FIX, "golden_rgb.png"), "rb").read()
    w, h, c, pixels = multimodal._decode_png(data)
    assert (w, h, c) == (W, H, C)
    assert pixels == _expected_pixels()


def test_wav_decode_pcm():
    data = open(os.path.join(FIX, "golden.wav"), "rb").read()
    assert multimodal._decode_wav(data) == _expected_pcm()


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        multimodal._decode_png(b"definitely not a png")


def test_extract_features_decodes_non_passthrough_mimes(spark):
    png = open(os.path.join(FIX, "golden_rgb.png"), "rb").read()
    wav = open(os.path.join(FIX, "golden.wav"), "rb").read()
    media = spark.createDataFrame(
        [
            (1, bytearray(png), ("image/png", "fixture", len(png))),
            (2, bytearray(wav), ("audio/wav", "fixture", len(wav))),
            (3, bytearray(b"plain text"), ("text/plain", "fixture", 10)),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    feats = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    # image: features computed over DECODED pixels (w*h*channels bytes),
    # not over the 137-byte PNG file
    assert feats[1].n_bytes == W * H * C
    assert feats[1].checksum == zlib.crc32(_expected_pixels())
    # audio: raw PCM sample bytes
    assert feats[2].n_bytes == len(_expected_pcm())
    assert feats[2].checksum == zlib.crc32(_expected_pcm())
    # text: passthrough
    assert feats[3].n_bytes == 10
    assert feats[3].checksum == zlib.crc32(b"plain text")


def test_unsupported_mime_still_raises(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01"), ("video/mp4", "fixture", 2))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_features(media).collect()
