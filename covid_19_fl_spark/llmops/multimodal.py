"""Multimodal column plumbing (SURVEY §2.13): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed in
Arrow-batched Pandas iterators (``mapInPandas``).

The decode step is STUBBED — the container has no image/audio codecs —
but everything Spark-side is real and tested: the schema contract, the
batch iterator signature, partition-preserving execution, and the
deterministic fake feature extractor standing in for a model forward
pass. Swap ``_decode_payload`` for a real decoder (PIL/torchaudio) and
nothing else changes.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def to_media(docs: DataFrame) -> DataFrame:
    """documents → media table: utf-8 payload bytes + typed metadata.

    (In production the payload column arrives from an object-store
    manifest; here the documents table stands in.)
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, mime: str) -> bytes:
    """STUB — real decode (image/audio frame extraction) needs codecs
    not present in this container. The Spark-side contract (binary in,
    binary out, per-batch) is what this module exercises."""
    if mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            "media decode requires codec libraries (PIL/ffmpeg); "
            "plug a decoder into _decode_payload"
        )
    return payload  # text passthrough


def _fake_feature(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a model forward pass: md5-seeded
    pseudo-embedding. Stable across runs/partitions."""
    digest = hashlib.md5(payload).digest()
    return [int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(dims)]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    output is an iterator of frames with FEATURE_SCHEMA. Partitioning
    is preserved — no shuffle; at 100 TB this runs as a map-only stage
    whose parallelism is the input split count.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            mimes = pdf["meta"].map(lambda m: m["mime"])
            decoded = [
                _decode_payload(p, m) for p, m in zip(payloads, mimes)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in decoded],
                    "checksum": [zlib.crc32(p) for p in decoded],
                    "feature": [_fake_feature(p) for p in decoded],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: each payload → ``n_frames`` equal byte
    slices (the video frame-sample / audio-window shape: one input row
    fans out to N payload rows). Real framing needs a demuxer — the
    byte-slice stand-in keeps the Spark contract (mapInPandas 1→N row
    expansion, binary slices, deterministic sizes) fully exercised.
    Map-only stage; output partitioning inherits the input's."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                chunk = -(-n // n_frames)  # ceil
                for i in range(n_frames):
                    piece = payload[i * chunk : (i + 1) * chunk]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(len(piece))
                    rows["frame_payload"].append(bytes(piece))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("orig_bytes", T.LongType(), True),
                    T.StructField("scale_num", T.IntegerType(), True),
                    T.StructField("scale_den", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def resize_media(media: DataFrame, max_bytes: int = 64) -> DataFrame:
    """Resize/downsample plumbing: payloads above ``max_bytes`` are
    resampled to fit by deterministic byte striding (every k-th byte,
    k = ceil(n/max_bytes)) — the stand-in for an image resize / audio
    downsample, which needs codecs this container lacks. What IS real:
    the mapInPandas binary→binary contract, the metadata struct carrying
    the original size and the exact rational scale factor (num/den, no
    float drift), and map-only partition-preserving execution. Small
    payloads pass through untouched (scale 1/1), like a resize that
    never upscales."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "payload": [], "meta": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                n = len(payload)
                k = max(1, -(-n // max_bytes))  # ceil(n / max_bytes)
                resized = bytes(payload[::k])
                out["doc_id"].append(doc_id)
                out["payload"].append(resized)
                out["meta"].append(
                    {
                        "mime": meta["mime"],
                        "source": meta["source"],
                        "n_bytes": len(resized),
                        "orig_bytes": n,
                        "scale_num": 1,
                        "scale_den": k,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def read_binary_media(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Object-store media ingest via Spark's native ``binaryFile``
    source: one row per file with (path, modificationTime, length,
    content) — the real entry point the `to_media` documents stand-in
    mimics. The source parallelizes by file (each file one task,
    bin-packed by size), pushes `pathGlobFilter` down so non-matching
    objects are never opened, and never materializes a file list on
    the driver — at 100 TB of media this is a listing-parallel scan,
    with per-file rows feeding straight into extract_features /
    sample_frames' mapInPandas stages.

    Emits the MEDIA schema: payload + typed metadata struct, doc_id
    from a content-independent hash of the path (stable across
    re-listing)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col("path").alias("source"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
