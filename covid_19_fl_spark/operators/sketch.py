"""Mergeable frequency sketches as DataFrame plans.

Count-min is THE mergeable sketch shape: per-partition partial
aggregation builds per-partition sketches, the shuffle merges them by
cell addition (counts are associative), and the full sketch is
depth×width rows — constant size regardless of input. At 100 TB the
input never shuffles raw: only (row of the sketch table) cells cross
the exchange after map-side combine.

Hashing uses the engine-portable family (llmops.dedup.portable_hash +
affine seeds), so estimates are deterministic and the DuckDB oracle
reproduces the sketch — including its collision-driven
over-estimates — cell for cell. A probabilistic data structure with
an exact cross-engine test is only possible because nothing about it
is actually random at fixed seeds.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..llmops.dedup import PORTABLE_PRIME, portable_hash, affine_consts


def _bucket(h: Column, j: int, width: int) -> Column:
    a, b = affine_consts(j)
    return ((F.lit(a) * h + F.lit(b)) % F.lit(PORTABLE_PRIME)) % F.lit(width)


def count_min_topk(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Heavy hitters by count-min estimate → (key, est_count) top-k,
    ties broken by key ascending.

    est_count = min over the sketch's ``depth`` rows of the key's cell
    count; always ≥ the true frequency (collisions only inflate).
    Build: scan-stage bucket columns → one union of ``depth`` partial
    aggs (each ≤ width rows per partition after map-side combine).
    Probe: distinct keys join the (depth×width — broadcastable) sketch.
    At real heavy-hitter scale the candidate set would come from
    per-partition top-N pruning instead of distinct; the sketch side
    is the scale-bearing piece demonstrated here.
    """
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    h = portable_hash(F.col("key")) % PORTABLE_PRIME
    buckets = keyed.select(
        "key", *[_bucket(h, j, width).alias(f"b{j}") for j in range(depth)]
    )
    sketch = functools.reduce(
        lambda a, b: a.unionByName(b),
        [
            buckets.groupBy(f"b{j}")
            .agg(F.count("*").alias("c"))
            .select(F.lit(j).alias("j"), F.col(f"b{j}").alias("b"), "c")
            for j in range(depth)
        ],
    )
    cand = (
        buckets.select(
            "key",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), F.col(f"b{j}").alias("b"))
                        for j in range(depth)
                    ]
                )
            ).alias("jb"),
        )
        .select("key", F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .distinct()
    )
    est = (
        cand.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("key")
        .agg(F.min("c").alias("est_count"))
    )
    return est.orderBy(F.desc("est_count"), F.asc("key")).limit(k)
