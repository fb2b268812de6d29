"""Skew mitigation (SURVEY §4.3: "county skew is real — Dade/Broward
dominate"; at 100 TB any hot join/group key serializes one reducer).

AQE's skew-join splitting (on in session.py) handles sort-merge joins
automatically; these helpers cover the cases AQE doesn't:

- ``salted_join``: hot-key equi-join where the build side is small
  enough to replicate per salt but too big / too dynamic to broadcast.
- ``salted_distinct_agg``: two-phase distinct-style aggregation whose
  state (not its input) is the bottleneck — a plain map-side combine
  doesn't help when one group's state is huge.

Salts are deterministic (hash of the row, not rand()): replays and
retries land rows in the same salt bucket, which speculative execution
and exactly-once sinks rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``buckets``
    reducers: big rows get a deterministic salt; the small side is
    replicated once per salt value (explode of a ``buckets``-element
    array — size × buckets rows, bounded and predictable); the join key
    becomes (key, salt). Each hot key now occupies ``buckets`` tasks
    instead of one."""
    big_salted = big.withColumn("_salt", _row_salt(big, buckets))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = big_salted.join(small_rep, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_distinct_agg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    buckets: int = 8,
) -> DataFrame:
    """COUNT(DISTINCT value) per group, skew-resistant: phase 1
    de-dupes (group, value) within (group, salt) partitions, phase 2
    merges per-salt partial distinct counts. A hot group's distinct
    state is split ``buckets`` ways instead of funneling into one task.
    Exact (not a sketch): dedup within a salt is global dedup because
    the salt is a pure function of the value."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    )
    partial = (
        salted.groupBy(group_col, "_salt")
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return (
        partial.groupBy(group_col)
        .agg(F.sum("_partial").cast("long").alias("n_distinct"))
    )
