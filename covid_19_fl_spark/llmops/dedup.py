"""Deduplication operators for training-data pipelines (SURVEY §2.13):
exact (hash-groupBy), n-gram Jaccard near-dup (banded self-join),
MinHash+LSH, SimHash.

Scale design:
- Exact dedup shuffles only (hash, id) pairs, never document bodies.
- Signatures (minhash/simhash) are pure per-row higher-order
  expressions — computed inside the scan stage, no explode-shuffle.
- Candidate generation joins on *band/bucket keys* (equi-joins with
  bounded fan-out), never all-pairs; the id-window variant uses the
  classic two-block trick so it stays an equi-join instead of a range
  join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, words


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    fingerprint, group size, canonical (min) id."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(id_col).alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id document of each fingerprint group.

    Window over the fingerprint partition — shuffles (fp, id), keeps
    the full row only for winners.
    """
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Shingles + Jaccard
# ---------------------------------------------------------------------------


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (per-row,
    no explode)."""
    w = words(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element array columns."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    id_window: int = 25,
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Near-dup candidate pairs by exact n-gram Jaccard, blocked on
    ``block_col`` and an id window.

    The id window is an *equi*-join via the two-block trick: left keys
    on block ``floor(id/W)``; right duplicates itself into blocks ``b``
    and ``b+1``; the residual ``0 < idB - idA <= W`` filter lands on a
    bounded candidate set. No range join, no nested loop — survives a
    1000-executor shuffle.
    """
    shingled = df.select(
        F.col(id_col),
        F.col(block_col),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )
    left = shingled.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("blk"),
        F.col("shingles").alias("sh_a"),
        F.floor(F.col(id_col) / id_window).alias("band"),
    )
    right = shingled.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("blk"),
        F.col("shingles").alias("sh_b"),
        F.explode(
            F.array(
                F.floor(F.col(id_col) / id_window),
                F.floor(F.col(id_col) / id_window) - 1,
            )
        ).alias("band"),
    )
    pairs = left.join(right, ["blk", "band"]).filter(
        (F.col("id_b") > F.col("id_a")) & (F.col("id_b") <= F.col("id_a") + id_window)
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(col: Column, num_hashes: int = 32, n: int = 3) -> Column:
    """MinHash signature as an int array: for seed k, min over shingles
    of murmur3(k || shingle). Pure per-row expression — the signature
    is computed in the scan stage; only (id, signature) ever shuffles."""
    shingles = word_shingles(col, n)

    def seeded_min(k: int):
        # closure factory, NOT a defaulted lambda param: PySpark treats a
        # 2-arg lambda as the (element, index) form and would silently
        # shadow the seed
        prefix = F.lit(f"{k}:")
        return F.array_min(F.transform(shingles, lambda s: F.hash(F.concat(prefix, s))))

    return F.array(*[seeded_min(k) for k in range(num_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH near-dup pairs: signature → band buckets →
    equi-join on (band_idx, band_hash) → verify with exact Jaccard.

    Banding math: rows-per-band r = num_hashes/bands; a pair with true
    Jaccard s collides in ≥1 band with prob 1-(1-s^r)^bands.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(F.col(text_col), num_hashes, n).alias("sig"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )
    banded = base.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.hash(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "shingles", "band.band_idx", "band.band_hash")

    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"), "band_idx", "band_hash"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"), "band_idx", "band_hash"
    )
    candidates = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_b") > F.col("id_a"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash32(col: Column) -> Column:
    """32-bit SimHash over whitespace tokens, as a long.

    Per bit i: sum over tokens of ±1 by murmur3 bit i; signature bit is
    the sign. Entirely per-row fold expressions — no shuffle, no UDF.
    """
    hashes = F.transform(words(col), lambda t: F.hash(t))

    def balance(i: int):
        # closure factory: PySpark introspects lambda arity, so the bit
        # index can't ride in as a defaulted third parameter
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    sig = F.lit(0).cast("long")
    for i in range(32):
        sig = sig + F.when(balance(i) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return sig


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidates via
    8-bit chunk banding (pigeonhole: distance ≤ 6 over 4 chunks → some
    chunk is ~equal; we require an exact chunk match, trading a small
    recall loss for equi-join candidate generation)."""
    sigs = df.select(F.col(id_col).alias("doc_id"), simhash32(F.col(text_col)).alias("sig"))
    chunked = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(F.col("sig"), c * 8).bitwiseAND(F.lit(0xFF)).alias(
                            "chunk"
                        ),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "sig", "ch.chunk_idx", "ch.chunk")
    a = chunked.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk"
    )
    b = chunked.select(
        F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk"
    )
    cands = (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("id_b") > F.col("id_a"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
