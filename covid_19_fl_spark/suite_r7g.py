"""Round-7 suite batch G — curation-pipeline deliverables that turn
existing per-document signals into the per-source reports a data
governance pass actually ships:

- ``cur_pii_risk_report`` — per-source PII exposure (documents with
  hits, total hits, hits per kilo-token) under the exact rule chain
  ``tx_pii_redaction`` applies.
- ``cur_mix_rebalance`` — the actionable sampling plan derived from
  ``sp_temperature_mix``'s target mix: per-source token targets,
  capped sample rates, and the achieved volume under a global token
  budget.

Reference tie-in: the reference (mariuspopovici/COVID-19-FL) has no
curation surface; these extend the task brief's training-data
pipeline requirement (the governance / mixing halves of a curation
run, beside cur_dataset_card's datasheet and cur_funnel's dedup
pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llmops import text as T
from .suite import _t, query
from .suite_llmops import (
    _PII_ORACLE_EMAIL,
    _PII_ORACLE_NUM,
    _PII_ORACLE_PHONE,
    _WORDS_SQL,
)


# ---------------------------------------------------------------------------
# Per-source PII risk report
# ---------------------------------------------------------------------------


@query(
    "cur_pii_risk_report",
    oracle=f"""
    WITH r1 AS (
      SELECT source, text AS t0,
             CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words,
             regexp_replace(text, '{_PII_ORACLE_EMAIL}', '<EMAIL>', 'g') AS t1
      FROM documents
    ), r2 AS (
      SELECT source, t0, t1, n_words,
             regexp_replace(t1, '{_PII_ORACLE_PHONE}', '<PHONE>', 'g') AS t2
      FROM r1
    ), per_doc AS (
      SELECT source, n_words,
             len(regexp_extract_all(t0, '{_PII_ORACLE_EMAIL}'))
               + len(regexp_extract_all(t1, '{_PII_ORACLE_PHONE}'))
               + len(regexp_extract_all(t2, '{_PII_ORACLE_NUM}')) AS hits
      FROM r2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(SUM(hits) AS BIGINT) AS total_hits,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS pii_doc_rate,
           ROUND(CAST(SUM(hits) AS DOUBLE) * 1000.0 / SUM(n_words), 6)
             AS hits_per_kilotoken
    FROM per_doc
    GROUP BY 1
    """,
)
def cur_pii_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report under EXACTLY the rule chain the
    scrub applies (tx_pii_redaction's ordered email → phone → digit
    rules, each counting on the text left by the previous — so an
    email's digits never double-count): documents with at least one
    hit, total hits, and hits per kilo-token. This is the governance
    artifact that decides which sources need scrubbing before they
    enter the mix — the risk VIEW beside tx_pii_redaction's
    transform.

    Scale shape: the rule chain is codegen'd regexp_count/replace
    inside the scan stage (zero shuffle, zero UDF); the rollup is one
    map-combined per-source agg. Integer counts make every ratio an
    exact int/int division rounded once at the end."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        T.token_count(F.col("text")).cast("long").alias("n_words"),
        T.pii_hit_count(F.col("text")).cast("long").alias("hits"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("hits") > 0).cast("long")).cast("long").alias(
            "docs_with_pii"
        ),
        F.sum("hits").cast("long").alias("total_hits"),
        F.sum("n_words").cast("long").alias("n_tokens"),
        F.round(
            F.sum((F.col("hits") > 0).cast("long")).cast("double")
            / F.count("*"),
            6,
        ).alias("pii_doc_rate"),
        F.round(
            F.sum("hits").cast("double") * 1000.0 / F.sum("n_words"), 6
        ).alias("hits_per_kilotoken"),
    )


# ---------------------------------------------------------------------------
# Token-budget rebalancing plan from the temperature mix
# ---------------------------------------------------------------------------

_MIX_TAU = 0.7
_MIX_BUDGET_SHARE = 0.5  # global budget = 50% of corpus tokens


@query(
    "cur_mix_rebalance",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS group_tokens
      FROM documents GROUP BY 1
    ), sh AS (
      SELECT source, group_tokens,
             pow(CAST(group_tokens AS DOUBLE) / SUM(group_tokens) OVER (),
                 1.0 / {_MIX_TAU}) AS q_raw,
             CAST(FLOOR(SUM(group_tokens) OVER () * {_MIX_BUDGET_SHARE})
                  AS BIGINT) AS budget
      FROM per
    ), mixed AS (
      SELECT source, group_tokens, budget,
             ROUND(q_raw / SUM(q_raw) OVER (), 6) AS mix_prob
      FROM sh
    ), plan AS (
      SELECT source, group_tokens, mix_prob,
             CAST(ROUND(budget * mix_prob, 0) AS BIGINT) AS target_tokens
      FROM mixed
    )
    SELECT source, group_tokens, mix_prob, target_tokens,
           ROUND(LEAST(1.0, CAST(target_tokens AS DOUBLE) / group_tokens), 6)
             AS sample_rate,
           CAST(ROUND(ROUND(LEAST(1.0, CAST(target_tokens AS DOUBLE)
                                       / group_tokens), 6)
                      * group_tokens, 0) AS BIGINT) AS achieved_tokens
    FROM plan
    """,
)
def cur_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of sp_temperature_mix: turn the τ=0.7
    target mix into a per-source sampling PLAN under a global token
    budget (50% of corpus tokens) — target tokens per source, the
    capped sample rate (an over-asked small source can't yield more
    than it has: rate ≤ 1), and the volume the plan actually achieves.
    The achieved-vs-target gap is the signal to re-run with epochs or
    re-weight (the data-constrained scaling regime).

    Everything runs on the ≤|sources|-row aggregate: one exact
    integer token rollup (single map-combined shuffle), then windowed
    shares, pow, and rounding over a dimension-sized frame. Rates are
    6dp-rounded BEFORE the achieved-volume multiply so every derived
    number is reproducible from the published plan itself."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("group_tokens")
    )
    tot = per.agg(
        F.sum("group_tokens").alias("tot"),
        F.floor(
            F.sum("group_tokens") * F.lit(_MIX_BUDGET_SHARE)
        )
        .cast("long")
        .alias("budget"),
    )
    sh = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "group_tokens",
        "budget",
        F.pow(
            F.col("group_tokens").cast("double") / F.col("tot"),
            F.lit(1.0 / _MIX_TAU),
        ).alias("q_raw"),
    )
    qsum = sh.agg(F.sum("q_raw").alias("qsum"))
    mixed = sh.crossJoin(F.broadcast(qsum)).select(
        "source",
        "group_tokens",
        "budget",
        F.round(F.col("q_raw") / F.col("qsum"), 6).alias("mix_prob"),
    )
    plan = mixed.select(
        "source",
        "group_tokens",
        "mix_prob",
        F.round(F.col("budget") * F.col("mix_prob"), 0)
        .cast("long")
        .alias("target_tokens"),
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.col("target_tokens").cast("double") / F.col("group_tokens"),
        ),
        6,
    )
    return plan.select(
        "source",
        "group_tokens",
        "mix_prob",
        "target_tokens",
        rate.alias("sample_rate"),
        F.round(rate * F.col("group_tokens"), 0)
        .cast("long")
        .alias("achieved_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus manifest: the reproducibility digest of a curation run (r8)
# ---------------------------------------------------------------------------


@query(
    "cur_corpus_manifest",
    oracle=f"""
    WITH f AS (
      SELECT source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
             CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words
      FROM documents
    ), h AS (
      SELECT source, fp, n_words,
             ('0x' || substr(md5(fp), 1, 15))::BIGINT % 2147483647 AS h0
      FROM f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_fp,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           CAST(SUM(h0) % 2147483647 AS BIGINT) AS fp_digest,
           CAST(SUM((1013904228 * h0 + 1908133490) % 2147483647)
                % 2147483647 AS BIGINT) AS fp_digest2
    FROM h GROUP BY source
    """,
)
def cur_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus manifest — the reproducibility digest a
    dataset release ships beside its datasheet (cur_dataset_card):
    document count, unique-fingerprint count (dup-awareness), token
    mass, and TWO order-independent content digests. Each document's
    canonical fingerprint hashes through the portable 60-bit md5 path
    (llmops/dedup.portable_hash), reduces mod P=2^31−1, and the
    per-source digest is the COMMUTATIVE modular sum (plus an
    affine-seeded second channel, seeds from dedup.affine_consts(1)) —
    so the digest is invariant to partitioning, task order, and row
    order, and two independently produced copies of a corpus can be
    compared with |sources| rows instead of a full anti-join. Every
    term is < 2^31 pre-sum, so the running sum stays overflow-safe
    past 2^32 documents per source in both engines.

    The reference re-exports its whole MongoDB collection to CSV to
    compare runs (datasets/ exports); this is the engine-side answer
    at 100 TB: one scan, one keyed agg, constant-width output.

    Scale: map (md5 + modular arithmetic, whole-stage codegen) + one
    map-side-combinable groupBy on |sources| keys; no data-sized
    state anywhere."""
    from .llmops import text as T2
    from .llmops.dedup import PORTABLE_PRIME, affine_consts, portable_hash

    a1, b1 = affine_consts(1)
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        T2.fingerprint(F.col("text")).alias("fp"),
        T2.token_count(F.col("text")).cast("long").alias("n_words"),
    ).withColumn("h0", portable_hash(F.col("fp")) % PORTABLE_PRIME)
    return base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_unique_fp"),
        F.sum("n_words").cast("long").alias("n_tokens"),
        (F.sum("h0") % PORTABLE_PRIME).cast("long").alias("fp_digest"),
        (
            F.sum((F.lit(a1) * F.col("h0") + F.lit(b1)) % PORTABLE_PRIME)
            % PORTABLE_PRIME
        )
        .cast("long")
        .alias("fp_digest2"),
    )
