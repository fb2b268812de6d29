"""End-to-end training-data curation pipeline — the composition a
pre-training data team actually runs, built from this package's
operators (SURVEY §2.13) as ONE lazy DataFrame plan per stage:

    redact PII → exact dedup → near-dup (MinHash LSH) cluster dedup →
    quality/language/length filter → benchmark decontamination →
    deterministic hash sample → fixed-size token chunks

Every stage is a DataFrame→DataFrame function, so the composition
stays declarative: Catalyst sees the whole chain, pushes the cheap
scan-stage predicates (quality, language, token bounds) below the
expensive shuffling stages where legal, and nothing materializes on
the driver. The only non-linear pieces — the LSH candidate join and
the decontamination shingle join — keep their scale posture from
their home modules (band-bucket equi-joins, broadcast benchmark side).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, sampling, text


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for :func:`curate`, defaulted for the synthetic corpus."""

    min_quality: float = 0.4
    langs: tuple[str, ...] = ("en",)
    min_tokens: int = 5
    max_tokens: int = 100_000
    near_dup_threshold: float = 0.5
    decontaminate_ngram: int = 5
    sample_pct: int | None = None  # None = keep all survivors
    chunk_size: int = 32
    chunk_stride: int = 24


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Run the curation chain; returns every intermediate stage keyed
    by name (all lazy) plus the final ``chunks``. Callers materialize
    only what they need — the driver never holds rows.

    Stage order rationale (cost ordering at 100 TB):
    - redaction + exact dedup first: both are scan-stage/narrow-shuffle
      cheap and shrink the input to every later stage;
    - near-dup LSH next: the most expensive stage runs on the
      exact-deduped survivor set, and its keep-set is an anti-join on
      (doc_id of non-canonical cluster members) — no text movement;
    - scalar quality/language/length predicates after dedup so dedup
      canonical choice is content-determined, not filter-order-
      determined (a doc must not survive because its duplicate was
      filtered first);
    - decontamination last among filters: the benchmark side broadcasts
      and the corpus side is already minimal;
    - sampling and chunking are the terminal fan-in/fan-out.
    """
    redacted = docs.withColumn(text_col, text.redact_pii(F.col(text_col)))

    exact = dedup.exact_dedup(redacted, text_col, id_col)

    pairs = dedup.minhash_lsh_pairs(
        exact, text_col, id_col, threshold=config.near_dup_threshold
    )
    clusters = dedup.dup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    near_deduped = exact.join(
        losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )

    quality_kept = near_deduped.filter(
        sampling.curation_filter(
            text.quality_score(F.col(text_col)),
            text.language_id(F.col(text_col)),
            text.token_count(F.col(text_col)),
            min_quality=config.min_quality,
            langs=config.langs,
            min_tokens=config.min_tokens,
            max_tokens=config.max_tokens,
        )
    )

    if benchmark is not None:
        leaked = dedup.decontaminate(
            quality_kept, benchmark, text_col, id_col, n=config.decontaminate_ngram
        ).select(id_col)
        clean = quality_kept.join(leaked, id_col, "left_anti")
    else:
        clean = quality_kept

    sampled = (
        sampling.hash_sample(clean, id_col, config.sample_pct)
        if config.sample_pct is not None
        else clean
    )

    chunks = text.chunk_spans(
        sampled, text_col, id_col, size=config.chunk_size, stride=config.chunk_stride
    )

    return {
        "redacted": redacted,
        "exact_deduped": exact,
        "near_deduped": near_deduped,
        "quality_kept": quality_kept,
        "clean": clean,
        "sampled": sampled,
        "chunks": chunks,
    }


def funnel_report(stages: dict[str, DataFrame], id_col: str = "doc_id") -> DataFrame:
    """One small DataFrame of per-stage survivor counts (the curation
    funnel every data run logs). Each leg is a full count aggregate —
    lazy until the caller materializes; at scale, run it once per
    pipeline execution, not per stage."""
    legs = []
    for order, name in enumerate(
        ("redacted", "exact_deduped", "near_deduped", "quality_kept", "clean", "sampled")
    ):
        if name in stages:
            legs.append(
                stages[name].agg(
                    F.lit(order).alias("stage_order"),
                    F.lit(name).alias("stage"),
                    F.count(id_col).alias("n_docs"),
                )
            )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
