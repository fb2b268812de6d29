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


def funnel_counts(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The curation funnel (same six rows as
    ``funnel_report(curate(...))``) computed in a SINGLE pass.

    ``funnel_report`` unions six independent count legs, and because
    the stages are suffixes of one chain, Catalyst materializes the
    shared prefix once PER LEG — the MinHash-LSH candidate join and the
    connected-components contraction (by far the dominant stages) run
    four times for one funnel. At 100 TB that multiplies the most
    expensive shuffle in the pipeline by the number of report rows.

    Here every later-stage membership is a per-document FLAG on the
    exact-dedup survivor set — near-dup survivor (left-join miss
    against the LSH cluster losers), quality predicate, benchmark leak,
    sample bucket — and the funnel is one conditional aggregation over
    those flags plus one cheap row-count of the redacted input (the
    redaction stage is row-preserving, so its count never needs the
    redacted text). The expensive LSH/CC subtree appears exactly once
    in the plan; nothing about what is counted changes, only how often
    it is computed (cur_funnel's DuckDB oracle pins the equivalence).
    """
    red = docs.withColumn(text_col, text.redact_pii(F.col(text_col)))
    exact = dedup.exact_dedup(red, text_col, id_col)
    pairs = dedup.minhash_lsh_pairs(
        exact, text_col, id_col, threshold=config.near_dup_threshold
    )
    clusters = dedup.dup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    qual_pred = sampling.curation_filter(
        text.quality_score(F.col(text_col)),
        text.language_id(F.col(text_col)),
        text.token_count(F.col(text_col)),
        min_quality=config.min_quality,
        langs=config.langs,
        min_tokens=config.min_tokens,
        max_tokens=config.max_tokens,
    )
    flags = exact.select(F.col(id_col), qual_pred.alias("_q")).join(
        losers.withColumn("_loser", F.lit(True)), id_col, "left"
    )
    flags = flags.withColumn("_near", F.col("_loser").isNull())
    if benchmark is not None:
        # The leak test needs survivor text, so the benchmark path pays
        # one extra pass over the (small) quality-kept set — the
        # registered funnel query runs benchmark-free.
        near_docs = exact.join(losers, id_col, "left_anti")
        qual_docs = near_docs.filter(qual_pred)
        leaked = dedup.decontaminate(
            qual_docs, benchmark, text_col, id_col, n=config.decontaminate_ngram
        ).select(id_col)
        flags = flags.join(
            leaked.withColumn("_leak", F.lit(True)), id_col, "left"
        )
    else:
        flags = flags.withColumn("_leak", F.lit(None).cast("boolean"))
    flags = flags.withColumn("_clean", F.col("_near") & F.col("_q") & F.col("_leak").isNull())
    samp_pred = (
        F.pmod(F.col(id_col), F.lit(100)) < config.sample_pct
        if config.sample_pct is not None
        else F.lit(True)
    )
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    # coalesce(sum, 0): SUM over zero rows is NULL, COUNT is 0 — an
    # empty corpus must report 0 at every stage like funnel_report does.
    surv = flags.agg(
        F.count(id_col).alias("_exact"),
        F.coalesce(F.sum(F.when(F.col("_near"), one).otherwise(zero)), zero).alias("_near"),
        F.coalesce(
            F.sum(F.when(F.col("_near") & F.col("_q"), one).otherwise(zero)), zero
        ).alias("_qual"),
        F.coalesce(F.sum(F.when(F.col("_clean"), one).otherwise(zero)), zero).alias("_clean"),
        F.coalesce(
            F.sum(F.when(F.col("_clean") & samp_pred, one).otherwise(zero)), zero
        ).alias("_samp"),
    )
    n_red = red.agg(F.count(id_col).alias("_red"))
    combined = n_red.crossJoin(surv)  # 1×1 scalar join
    legs = F.array(
        F.struct(
            F.lit(0).alias("stage_order"),
            F.lit("redacted").alias("stage"),
            F.col("_red").alias("n_docs"),
        ),
        F.struct(
            F.lit(1).alias("stage_order"),
            F.lit("exact_deduped").alias("stage"),
            F.col("_exact").alias("n_docs"),
        ),
        F.struct(
            F.lit(2).alias("stage_order"),
            F.lit("near_deduped").alias("stage"),
            F.col("_near").alias("n_docs"),
        ),
        F.struct(
            F.lit(3).alias("stage_order"),
            F.lit("quality_kept").alias("stage"),
            F.col("_qual").alias("n_docs"),
        ),
        F.struct(
            F.lit(4).alias("stage_order"),
            F.lit("clean").alias("stage"),
            F.col("_clean").alias("n_docs"),
        ),
        F.struct(
            F.lit(5).alias("stage_order"),
            F.lit("sampled").alias("stage"),
            F.col("_samp").alias("n_docs"),
        ),
    )
    return combined.select(F.explode(legs).alias("_s")).select("_s.*")


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
