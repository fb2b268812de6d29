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


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    budget: int,
    shards: int = 16,
) -> DataFrame:
    """Concat-and-chop sequence packing: assign every document to the
    fixed-token-budget training sequence ("pack") in which its first
    token lands, LM-pretraining style — documents are laid out as one
    concatenated token stream per shard and the stream is chopped every
    ``budget`` tokens.

    Distribution strategy: the stream order must be deterministic and
    reproducible under any partitioning, so the layout key is
    ``id % shards`` (engine-portable, unlike seed-based shuffles) and
    the intra-shard order is the id itself. One shuffle on the shard
    key; each shard's running token offset is a partitioned window
    cumsum, so shards scale out independently — at 100 TB you raise
    ``shards`` to O(cluster cores) and no single ordered stream becomes
    a bottleneck (a single global order would serialize the window).

    Returns one row per pack: ``(shard, pack_seq, n_docs, pack_tokens,
    first_doc, last_doc)``. ``pack_tokens`` can exceed ``budget`` by at
    most the straddling tail document, which a downstream tokenizer
    chops at the boundary (the next pack starts at the chop point —
    offsets, not documents, define pack boundaries).

    No reference analogue (the reference never batches; closest is the
    2000-row page chunking, cv-api.py:68-88) — this is the engine-added
    training-data operator.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.pmod(F.col(id_col), F.lit(shards)).alias("shard"),
        tokens_col.cast("long").alias("_n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn(
        "pack_seq",
        F.floor((F.sum("_n_tokens").over(w) - F.col("_n_tokens")) / F.lit(budget)),
    )
    return placed.groupBy("shard", "pack_seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("_n_tokens").alias("pack_tokens"),
        F.min("_id").alias("first_doc"),
        F.max("_id").alias("last_doc"),
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    budget: int,
) -> DataFrame:
    """Fill a training-token budget: take documents in deterministic
    md5-hash order (an unbiased, reproducible shuffle of the corpus)
    until the running token total reaches ``budget`` — the "give me
    exactly ~1B tokens of this corpus" curation step. A document is
    kept iff the budget was not yet exhausted when its turn came, so
    the result overshoots by at most the final straddling document.

    A global ordered cumsum would serialize on one partition at 100 TB,
    so it runs two-phase: shard on the hash's first hex digit (a PREFIX
    of the global sort key, so shard order composes with in-shard
    order), window-cumsum inside each shard, then add each shard's
    starting offset — 16 totals reduced and broadcast back. Same
    pattern as pack_sequences; no single ordered stream anywhere.
    """
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col.cast("long").alias("n_tokens"),
        h.alias("_h"),
        F.substring(h, 1, 1).alias("_shard"),
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(F.col("_h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_shard = base.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    # 16 rows: running offset of every shard = sum of all prior shards.
    w_off = (
        Window.orderBy(F.col("_shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select("_shard", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"))
    )
    return (
        in_shard.join(F.broadcast(offsets), "_shard")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("_off") + F.col("_cum_in")).alias("cum_tokens"),
        )
        # strictly-before test: the doc is taken iff the budget wasn't
        # already met at its start (cum - n_tokens < budget)
        .filter(F.col("cum_tokens") - F.col("n_tokens") < F.lit(budget))
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets key ``u^(1/w)`` for a
    uniform ``u``; the k largest keys are an exact weighted sample.
    Here ``u`` is derived from an md5 of the row id — content-defined,
    so the SAME rows win under any partitioning, engine, or rerun (the
    reproducibility contract of every sampler in this module; seeded
    ``rand()`` breaks it on repartition). The quality-weighted
    curation step: pass a quality/length weight and the sample skews
    toward high-weight docs with exactly known inclusion law.

    Works in log domain (``ln(u)/w`` — same argmax, no underflow for
    tiny weights) and rounds the key to 12 dp so last-ulp ``ln``
    differences across engines can't flip an ordering; doc_id breaks
    the (measure-zero) ties. Plan shape: pure scan-stage arithmetic +
    TakeOrderedAndProject — per-partition heaps of k, no global sort,
    nothing but k·|partitions| rows reach the driver merge.
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
    # h+1 in (0, 2^60]: u is never 0, so ln(u) is finite.
    u = (h.cast("long").cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    w = weight_col.cast("double")
    key = F.round(F.log(u) / w, 12)
    return (
        df.filter(w > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            w.alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def source_mix_weights(
    df: DataFrame, group_col: str, size_col: Column
) -> DataFrame:
    """Static data-mixing weights per group (source/domain): each
    group's token share and the up/down-sampling multiplier that would
    equalize shares to the uniform target.

    One fact-table scan: per-group integer token sums (exact — no
    float accumulation), then totals as a window over the |groups|-row
    aggregate — NOT a second aggregate referencing ``per``, which
    would recompute the groupBy (and rescan the facts) once for the
    totals and once for the join. Generalizes the reference's
    per-capita normalization J2+P9 (cv-county-stats.py:57-66) from
    population to token mass.
    """
    from pyspark.sql import Window

    per = df.groupBy(group_col).agg(F.sum(size_col).alias("group_tokens"))
    w = Window.partitionBy()
    per = per.withColumn("_total", F.sum("group_tokens").over(w)).withColumn(
        "_n_groups", F.count("*").over(w)
    )
    return (
        per
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


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 98), ("val", 1), ("test", 1)),
    buckets: int = 100,
) -> DataFrame:
    """Deterministic train/val/test assignment: the id's bucket
    (``id % buckets``) is matched against cumulative split weights, so
    membership is a pure function of the row — stable across reruns,
    partitionings, and engines (the property seed-based randomSplit
    lacks, and the one that matters for decontamination audits: a doc
    can never silently migrate between train and test).

    A single CASE expression — no shuffle, evaluates inside the scan
    stage and pushes down when filtered to one split. Weights must sum
    to ``buckets``.
    """
    total = sum(w for _, w in splits)
    if total != buckets:
        raise ValueError(f"split weights sum to {total}, expected {buckets}")
    bucket = F.pmod(F.col(id_col), F.lit(buckets))
    expr: Column | None = None
    upper = 0
    for name, _weight in splits[:-1]:
        upper += _weight
        cond = bucket < upper
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def source_kl_divergence(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-group (source/domain) KL divergence of the group's unigram
    distribution from the corpus distribution, in nats — the standard
    data-mixing drift diagnostic (how unlike the blended corpus each
    source reads; pairs with source_mix_weights' share-based view).

        KL(p_s ‖ p) = Σ_w (c_sw/T_s) · ln( (c_sw·T) / (c_w·T_s) )

    Scale shape: one tokenize-explode pass → groupBy(group, term)
    partial-agg shuffle (the only O(tokens) exchange); term totals and
    group totals derive from that |groups|×|vocab| aggregate — the raw
    corpus is scanned once. The term-total join is on the term key
    (AQE broadcasts the |vocab|-row side when it fits).

    Determinism: each term's contribution quantizes to integer
    picounits (floor(x·1e12) → bigint) before the per-group Σ, so the
    reduction is associative — partition-order-proof and engine-exact
    given identical doubles (the ratio arithmetic is IEEE-exact-rounded
    in any engine; ln is the one libm call, and a last-ulp ln wobble
    moves the floor by ≤1 picounit, invisible at the rounded 6dp).
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    per = toks.groupBy("grp", "term").agg(F.count("*").alias("c_sw"))
    term_tot = per.groupBy("term").agg(F.sum("c_sw").alias("c_w"))
    grp_tot = per.groupBy("grp").agg(F.sum("c_sw").alias("t_s"))
    corpus_tot = grp_tot.agg(F.sum("t_s").alias("t"))
    contrib = (
        F.col("c_sw").cast("double") / F.col("t_s")
    ) * F.log(
        (F.col("c_sw").cast("double") * F.col("t"))
        / (F.col("c_w").cast("double") * F.col("t_s"))
    )
    return (
        per.join(term_tot, "term")
        .join(F.broadcast(grp_tot), "grp")
        .crossJoin(F.broadcast(corpus_tot))
        .groupBy("grp")
        .agg(
            F.max("t_s").alias("n_tokens"),
            F.round(
                F.sum(F.floor(contrib * F.lit(1e12)).cast("long")).cast("double")
                / F.lit(1e12),
                6,
            ).alias("kl_nats"),
        )
        .select(F.col("grp").alias(group_col), "n_tokens", "kl_nats")
    )


def temperature_mix_weights(
    df: DataFrame, group_col: str, size_col: Column, tau: float
) -> DataFrame:
    """Temperature-scaled data-mixing weights (the multilingual /
    multi-source pretraining standard, e.g. the mBERT/XLM-R exponent
    trick): sampling probability q_g ∝ p_g^(1/τ) for each group's raw
    token share p_g. τ=1 keeps natural proportions, τ→∞ approaches
    uniform, τ<1 sharpens toward the head — the knob between
    source_mix_weights' two extremes (natural vs equalized).

    Same plan shape as source_mix_weights: per-group integer token
    sums (exact), then the share/exponent/renormalization all run as
    windows over the |groups|-row aggregate — the fact table is
    scanned once and only group rows ever shuffle again."""
    w = Window.partitionBy()
    per = (
        df.groupBy(group_col)
        .agg(F.sum(size_col).alias("group_tokens"))
        .withColumn("_total", F.sum("group_tokens").over(w))
    )
    raw = F.pow(
        F.col("group_tokens").cast("double") / F.col("_total"), F.lit(1.0 / tau)
    )
    per = per.withColumn("_q_raw", raw).withColumn("_q_tot", F.sum("_q_raw").over(w))
    return per.select(
        group_col,
        "group_tokens",
        F.round(F.col("group_tokens").cast("double") / F.col("_total"), 6).alias(
            "token_share"
        ),
        F.round(F.col("_q_raw") / F.col("_q_tot"), 6).alias("mix_prob"),
    )
