"""Round-7 suite batch E — multimodal REAL-codec round-trips under
the exact-oracle gate:

- ``mm_ahash_image_dedup`` — average-hash perceptual image
  fingerprints computed from pixels that went through a REAL PNG
  encode → decode round-trip (stdlib zlib/unfilter path), bucketed
  for duplicate detection.
- ``mm_wav_loudness`` — integer PCM loudness features (peak, Σ|s|,
  RMS) computed from samples that went through a REAL WAV encode →
  decode round-trip (stdlib ``wave``).

Until now the real decoders (llmops/multimodal.py _decode_png /
_decode_wav) were attested only by pytest goldens; these queries put
them under the driver's oracle gate by generating the media payloads
DETERMINISTICALLY from table data (salted md5 byte streams) so DuckDB
can recompute the expected features directly from the generative
formula — equality proves the codec round-trip is lossless inside the
Arrow batch iterator, not just that bytes were counted.

Reference tie-in: the reference has no media surface; this is the
task brief's multimodal-column requirement with the decode step made
real where the stdlib allows (PNG/WAV) instead of stubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .llmops import multimodal
from .suite import _t, query

# byte b of the salted stream: hex pair (b%16)*2+1 of md5(text|salt|b//16)
_B = (
    "('0x' || substr(md5(text || '|{salt}|' || CAST({b} // 16 AS VARCHAR)),"
    " ({b} % 16) * 2 + 1, 2))::BIGINT"
)


@query(
    "mm_ahash_image_dedup",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             [{_B.format(salt="px", b="k")}
              for k in generate_series(0, 63)] AS p
      FROM documents
    ), summed AS (
      SELECT doc_id, p, CAST(list_sum(p) AS BIGINT) AS px_sum FROM px
    ), hashed AS (
      SELECT doc_id, px_sum,
             CAST(COALESCE(list_sum(
               [CASE WHEN p[k+1] * 64 > px_sum
                     THEN (1::BIGINT << k) ELSE 0::BIGINT END
                for k in generate_series(0, 31)]), 0) AS BIGINT) AS ahash_w0,
             CAST(COALESCE(list_sum(
               [CASE WHEN p[k+33] * 64 > px_sum
                     THEN (1::BIGINT << k) ELSE 0::BIGINT END
                for k in generate_series(0, 31)]), 0) AS BIGINT) AS ahash_w1
      FROM summed
    )
    SELECT doc_id, ahash_w0, ahash_w1, px_sum,
           CAST(COUNT(*) OVER (PARTITION BY ahash_w0, ahash_w1) AS BIGINT)
             AS bucket_size
    FROM hashed
    """,
)
def mm_ahash_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup by average-hash over REAL PNG
    round-trips: every document generates a deterministic 8×8
    grayscale image, which is encoded to an actual PNG and decoded
    back through the stdlib inflate/unfilter path BEFORE hashing
    (llmops/multimodal.ahash_images) — the oracle recomputes the hash
    from the generative pixel formula, so equality attests the codec
    path end to end. aHash (bit_k = pixel_k > mean, integer-exact as
    pixel·64 > Σ) is the classic first-pass image fingerprint;
    bucket_size counts payloads sharing a fingerprint — duplicate
    texts produce identical images and land in the same bucket.

    Scale: decode+hash is a map-only Arrow stage (no shuffle); the
    bucket count is one map-side-combinable groupBy on the 64-bit
    fingerprint, exactly the exact-dedup shape at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    hashed = multimodal.ahash_images(docs)
    sizes = hashed.groupBy("ahash_w0", "ahash_w1").agg(
        F.count("*").cast("long").alias("bucket_size")
    )
    return hashed.join(sizes, ["ahash_w0", "ahash_w1"]).select(
        "doc_id", "ahash_w0", "ahash_w1", "px_sum", "bucket_size"
    )


@query(
    "mm_wav_loudness",
    oracle=f"""
    WITH samp AS (
      SELECT doc_id,
             [({_B.format(salt="au", b="(k*2)")}) * 256
              + ({_B.format(salt="au", b="(k*2+1)")}) - 32768
              for k in generate_series(0, 31)] AS s
      FROM documents
    )
    SELECT doc_id,
           32::BIGINT AS n_samples,
           CAST(list_max([abs(x) for x in s]) AS BIGINT) AS peak_abs,
           CAST(list_sum([abs(x) for x in s]) AS BIGINT) AS sum_abs,
           ROUND(sqrt(CAST(list_sum([x * x for x in s]) AS DOUBLE) / 32), 6)
             AS rms
    FROM samp
    """,
)
def mm_wav_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio loudness features over REAL WAV round-trips: 32
    deterministic PCM16 samples per document, encoded with the stdlib
    ``wave`` writer and decoded back through _decode_wav BEFORE the
    integer stats (llmops/multimodal.wav_loudness) — peak |s|, Σ|s|
    and the 6dp RMS, the silence/clipping triage every audio ingest
    runs first. The oracle recomputes the stats from the generative
    sample formula; equality attests the PCM round-trip bit-for-bit.

    Scale: map-only Arrow stage, no shuffle — the audio twin of
    mm_ahash_image_dedup's plan."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_loudness(docs)
