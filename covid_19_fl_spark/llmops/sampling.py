"""Deterministic sampling & curation for training-data pipelines
(SURVEY §2.13 extension).

``df.sample()`` is seed-dependent *per partitioning* — the same seed
gives different rows after a repartition, which is unacceptable for
reproducible dataset curation at 100 TB (and untestable against an
oracle). These operators are content-deterministic instead: membership
is a pure function of the row's id, so any engine — and any partition
layout — selects the identical sample.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, id_col: str, pct: int, buckets: int = 100) -> DataFrame:
    """Keep rows whose ``id % buckets < pct`` — a deterministic ~pct%
    sample. Pure filter: pushes to the scan, no shuffle. For string
    keys, pass an integer surrogate (e.g. ``xxhash64``) as ``id_col``;
    the modulus contract stays engine-portable only for integer ids."""
    return df.filter(F.pmod(F.col(id_col), F.lit(buckets)) < pct)


def stratified_take(
    df: DataFrame,
    strata_cols: str | Sequence[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic k-per-stratum sample: the k smallest ids of each
    stratum (a rank window per stratum — shuffles once on the strata
    key; per-group heaps via rank, no global sort). Selecting by id
    order rather than random() keeps the sample reproducible and
    oracle-checkable; ids are assumed uncorrelated with content."""
    strata = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    w = Window.partitionBy(*strata).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def curation_filter(
    quality: Column,
    lang: Column,
    n_tokens: Column,
    min_quality: float = 0.5,
    langs: Sequence[str] = ("en",),
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> Column:
    """The standard pre-training curation predicate: quality floor,
    language allowlist, token-length band. A single boolean Column —
    composes into any scan and pushes down where the inputs are
    stored columns."""
    return (
        (quality >= min_quality)
        & lang.isin(*langs)
        & n_tokens.between(min_tokens, max_tokens)
    )


def source_mix_weights(
    df: DataFrame, group_col: str, size_col: Column
) -> DataFrame:
    """Static data-mixing weights per group (source/domain): each
    group's token share and the up/down-sampling multiplier that would
    equalize shares to the uniform target.

    Two tiny aggregates: per-group integer token sums (exact — no
    float accumulation), then a 1-row broadcast of (total, n_groups).
    The fact table is scanned once; the output is |groups| rows, so
    this is a scan-bound pass at any scale. Generalizes the reference's
    per-capita normalization J2+P9 (cv-county-stats.py:57-66) from
    population to token mass.
    """
    per = df.groupBy(group_col).agg(F.sum(size_col).alias("group_tokens"))
    totals = per.agg(
        F.sum("group_tokens").alias("_total"), F.count("*").alias("_n_groups")
    )
    return (
        per.join(F.broadcast(totals))
        .select(
            group_col,
            "group_tokens",
            F.round(F.col("group_tokens").cast("double") / F.col("_total"), 6).alias(
                "token_share"
            ),
            F.round(
                (F.col("_total").cast("double") / F.col("_n_groups"))
                / F.col("group_tokens"),
                6,
            ).alias("mix_weight"),
        )
    )
