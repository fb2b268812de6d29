"""Engine-portable Bloom-filter build + probe for join pre-filtering.

The scale pattern: a selective dimension-side predicate leaves a key
set too big to broadcast as an exact hash set but whose BLOOM FILTER is
a few KB — build it with one aggregation, broadcast the bitmask words,
and drop non-matching fact rows at the scan stage before the real join
shuffles anything (Spark's own runtime row-group pruning does this
opaquely; this operator makes the filter an inspectable DataFrame and
its false-positive rate measurable).

Portability: positions come from the md5-affine hash family
(``llmops.dedup.portable_hash`` / ``affine_consts``), and the bitmask
is built with the BIT_OR aggregate over ``1 << bit`` words — identical
integer math in Spark and DuckDB, so the filter contents, candidate
sets, and FP counts are all exactly reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..llmops.dedup import PORTABLE_PRIME, affine_consts, portable_hash

# 8192 bits ≈ 131 words (63 usable bits per bigint — see bloom_build):
# comfortably broadcast-able, trivial partial-agg states.
DEFAULT_BITS = 8192
DEFAULT_HASHES = 3


def _positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """The k bit positions for a key — affine-seeded md5 hash family."""
    h = portable_hash(key.cast("string")) % PORTABLE_PRIME
    out = []
    for j in range(num_hashes):
        a, b = affine_consts(j)
        out.append(((F.lit(a) * h + F.lit(b)) % F.lit(PORTABLE_PRIME)) % num_bits)
    return out


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Aggregate the key set into a (word_idx, mask) bitmask table of
    ``num_bits / 64`` rows. One explode (k rows per key) + one BIT_OR
    hash agg — map-side combinable, output size independent of |keys|.
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), num_hashes, num_bits))).alias(
            "pos"
        )
    )
    # 63-bit words (shift ≤ 62): DuckDB's BIGINT << raises on a shift
    # into the sign bit, so both engines pack bits 0..62 per word.
    return pos.select(
        (F.col("pos") / 63).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("bit"),
    ).groupBy("word_idx").agg(F.bit_or("bit").alias("mask"))


def bloom_flags(
    keys: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Per-key Bloom membership verdicts: (key, bloom_pass boolean).

    Each key probes its k (word, bit) pairs against the broadcast
    bitmask table and passes only if ALL k bits are set (a missing word
    row means those bits are 0). One broadcast join + count==k agg —
    the probe side never shuffles beyond its own per-key agg, which at
    scale collapses into the scan stage by evaluating the k probes as
    array ops against a collected-literal mask (same semantics; this
    DataFrame form keeps the filter inspectable and the oracle exact).
    """
    keyed = keys.select(F.col(key_col).alias("_k")).distinct()
    probes = keyed.select(
        "_k",
        F.explode(
            F.array(*_positions(F.col("_k"), num_hashes, num_bits))
        ).alias("pos"),
    ).select(
        "_k",
        (F.col("pos") / 63).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("bit"),
    )
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            (
                F.coalesce(F.col("mask"), F.lit(0)).bitwiseAND(F.col("bit")) != 0
            ).cast("int"),
        )
        .groupBy("_k")
        .agg((F.sum("hit") >= num_hashes).alias("bloom_pass"))
        .select(F.col("_k").alias(key_col), "bloom_pass")
    )


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_BITS,
    num_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Filter ``probe`` to rows whose key passes the Bloom filter."""
    hits = (
        bloom_flags(probe, key_col, bloom, num_bits, num_hashes)
        .filter(F.col("bloom_pass"))
        .select(key_col)
    )
    return probe.join(hits, key_col, "left_semi")
