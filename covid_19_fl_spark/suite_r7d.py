"""Round-7 suite batch D — dataset documentation, domain balancing,
and score calibration fitting:

- ``cur_dataset_card`` — per-source datasheet: volume, token
  distribution, language mix, and exact-duplicate rate in one
  composed aggregate (the "datasheets for datasets" summary every
  corpus release ships).
- ``sp_domain_cap`` — per-source document cap by deterministic hash
  rank (RefinedWeb-style domain balancing: no single source may
  contribute more than N documents).
- ``ml_platt_scaling`` — Platt calibration fit: a 2-parameter
  logistic (scale + bias) trained on the deterministic scored
  fixture by integer fixed-point gradient descent, the FIT step
  beside ml_isotonic_calibration's non-parametric one.

Reference tie-in: cv-county-stats.py:49-55's groupby summaries are
the reference's only dataset profiling; these generalize that shape
to the documents/events corpus. No reference file implements any of
these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .llmops import text as T
from .llmops.dedup import portable_hash
from .suite import _t, query

# ---------------------------------------------------------------------------
# cur_dataset_card — per-source datasheet
# ---------------------------------------------------------------------------


@query(
    "cur_dataset_card",
    oracle="""
    WITH base AS (
      SELECT source, lang, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS tok,
             md5(text) AS fp
      FROM documents
    ), tok_stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS total_tokens,
             ROUND(quantile_cont(tok, 0.5), 6) AS p50_tokens,
             ROUND(quantile_cont(tok, 0.9), 6) AS p90_tokens
      FROM base GROUP BY 1
    ), lc AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY 1, 2
    ), top_lang AS (
      SELECT source, lang AS top_lang, n AS top_n,
             CAST((SELECT COUNT(*) FROM lc i WHERE i.source = o.source)
                  AS BIGINT) AS n_langs
      FROM (SELECT source, lang, n,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n DESC, lang ASC) AS rn
            FROM lc) o
      WHERE rn = 1
    ), dup AS (
      SELECT source,
             CAST(COALESCE(SUM(c) FILTER (c >= 2), 0) AS BIGINT) AS dup_docs
      FROM (SELECT source, fp, COUNT(*) AS c FROM base GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT t.source, t.n_docs, t.total_tokens,
           ROUND(CAST(t.total_tokens AS DOUBLE) / t.n_docs, 6)
             AS mean_tokens,
           t.p50_tokens, t.p90_tokens,
           l.n_langs, l.top_lang,
           ROUND(CAST(l.top_n AS DOUBLE) / t.n_docs, 6) AS top_lang_share,
           d.dup_docs,
           ROUND(CAST(d.dup_docs AS DOUBLE) / t.n_docs, 6) AS dup_rate
    FROM tok_stats t
    JOIN top_lang l ON l.source = t.source
    JOIN dup d ON d.source = t.source
    """,
)
def cur_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card ("datasheets for datasets", Gebru et
    al. 2021 — the release-notes table): document volume, token-count
    distribution (total / mean / exact p50 / p90), language mix
    (distinct languages, majority language and its share), and the
    exact-duplicate rate (share of documents whose text fingerprint
    repeats within the source). One row per source — the corpus
    profile a curation pipeline publishes beside the data and diffs
    between crawls.

    Plan: one scan computes token count + md5 fingerprint per doc
    (scan-stage expressions); three map-side-combinable aggregates
    (token stats incl. exact interpolated percentiles, language cells,
    fingerprint cells) reduce to |sources|-, |sources·langs|- and
    |distinct texts|-sized frames; the top-language argmax is a
    struct-min over the tiny language-cell table. All joins are on the
    |sources|-row spine — broadcast at any scale. Ratios divide exact
    integers once, 6dp display round."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "doc_id",
        F.size(T.words(F.col("text"))).cast("long").alias("tok"),
        F.md5(F.col("text")).alias("fp"),
    )
    tok_stats = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.round(F.percentile("tok", F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(F.percentile("tok", F.lit(0.9)), 6).alias("p90_tokens"),
    )
    lc = base.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n")
    )
    top_lang = (
        lc.select(
            "source",
            F.struct((-F.col("n")).alias("neg_n"), "lang", "n").alias("s"),
        )
        .groupBy("source")
        .agg(
            F.min("s").alias("m"),
            F.count("*").cast("long").alias("n_langs"),
        )
        .select(
            "source",
            F.col("m.lang").alias("top_lang"),
            F.col("m.n").alias("top_n"),
            "n_langs",
        )
    )
    dup = (
        base.groupBy("source", "fp")
        .agg(F.count("*").alias("c"))
        .groupBy("source")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
            )
            .cast("long")
            .alias("dup_docs")
        )
    )
    return (
        tok_stats.join(top_lang, "source")
        .join(dup, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("n_docs"), 6
            ).alias("mean_tokens"),
            "p50_tokens",
            "p90_tokens",
            "n_langs",
            "top_lang",
            F.round(
                F.col("top_n").cast("double") / F.col("n_docs"), 6
            ).alias("top_lang_share"),
            "dup_docs",
            F.round(
                F.col("dup_docs").cast("double") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# sp_domain_cap — per-source document cap by hash rank
# ---------------------------------------------------------------------------

_DC_CAP = 30


@query(
    "sp_domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          ::BIGINT ASC,
                        doc_id ASC) AS hash_rank
      FROM documents
    )
    SELECT doc_id, source, CAST(hash_rank AS BIGINT) AS hash_rank
    FROM ranked WHERE hash_rank <= {_DC_CAP}
    """,
)
def sp_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing by per-source cap (the RefinedWeb/C4 rule "no
    domain may dominate the mix"): keep at most {_DC_CAP} documents
    per source, selected by portable-hash rank — a deterministic
    uniform subsample WITHIN each source, so the kept set is stable
    across reruns and engines and unbiased w.r.t. document content
    (unlike keep-first-N, which biases toward crawl order).

    Plan: one shuffle on source + a per-source rank window. Under a
    skewed source at 100 TB the window sorts that source's whole
    partition; the production refinement is the two-phase trick the
    sketch queries use — per-partition hash top-{_DC_CAP} first (map
    combine), then rank the ≤{_DC_CAP}·P survivors — same answer,
    bounded reducer. Output is ≤{_DC_CAP}·|sources| rows."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        portable_hash(F.col("doc_id").cast("string")).asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).alias("hash_rank")
        )
        .filter(F.col("hash_rank") <= _DC_CAP)
        .withColumn("hash_rank", F.col("hash_rank").cast("long"))
    )


# ---------------------------------------------------------------------------
# ml_platt_scaling — sigmoid calibration fit by integer fixed-point GD
# ---------------------------------------------------------------------------

_PL_EPOCHS = 3


def _platt_oracle(epochs: int = _PL_EPOCHS) -> str:
    """Unrolled integer-GD replica — the ml_logreg_gd recipe applied
    to (centered score, bias) features on the calibration fixture."""
    parts = [
        """
    WITH feats AS (
      SELECT CAST(event_type = 'click' AS BIGINT) AS y,
             ((('0x' || substr(md5('cal|' || CAST(event_id AS VARCHAR)), 1,
                              15))::BIGINT % 700)
              + CASE WHEN event_type = 'click' THEN 300 ELSE 0 END - 500)
               AS x1,
             256::BIGINT AS x2
      FROM events
    ), nn AS (
      SELECT COUNT(*) AS n FROM feats
    ), w0 AS (
      SELECT 0::BIGINT AS w1, 0::BIGINT AS w2
    )"""
    ]
    for t in range(1, epochs + 1):
        parts.append(f"""
    , e{t} AS (
      SELECT f.*, LEAST(1000::BIGINT, GREATEST(0::BIGINT,
               500 + CAST(FLOOR(CAST(f.x1*w{t - 1}.w1 + f.x2*w{t - 1}.w2
                                     AS DOUBLE) / 4096000.0)
                          AS BIGINT))) AS yh
      FROM feats f, w{t - 1}
    ), g{t} AS (
      SELECT SUM((y*1000 - yh) * x1) AS g1, SUM((y*1000 - yh) * x2) AS g2
      FROM e{t}
    ), w{t} AS (
      SELECT w{t - 1}.w1 + CAST(FLOOR(CAST(g{t}.g1 * 25 AS DOUBLE)
                                      / (256 * nn.n)) AS BIGINT) AS w1,
             w{t - 1}.w2 + CAST(FLOOR(CAST(g{t}.g2 * 25 AS DOUBLE)
                                      / (256 * nn.n)) AS BIGINT) AS w2
      FROM w{t - 1}, g{t}, nn
    )""")
    return f"""{"".join(parts)}
    SELECT dim, w_micro, CAST(w_micro AS DOUBLE) / 1000000.0 AS weight
    FROM (SELECT 1 AS dim, w1 AS w_micro FROM w{epochs}
          UNION ALL SELECT 2 AS dim, w2 AS w_micro FROM w{epochs})
    """


@query("ml_platt_scaling", oracle=_platt_oracle())
def ml_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling (Platt 1999): fit the 2-parameter sigmoid
    P(y=1|s) = σ(A·s + B) on the deterministic scored fixture — the
    parametric calibration FIT beside ml_isotonic_calibration's PAV
    and the diagnostic ml_calibration_bins / ml_ece_brier read out.
    Training is {_PL_EPOCHS} full-batch gradient epochs in the
    integer fixed-point scheme ml_logreg_gd proved (hard-sigmoid
    clamp, micro-unit weights, floored-double learning-rate step on
    exactly-representable int64 inputs), with features (centered
    milli-score, constant bias).

    Scale: each epoch is one map-side-combined 2-term gradient SUM
    over the scan — no shuffle beyond the 1-row gradient; epochs
    chain lazily like PageRank rounds. Output: the two fitted
    weights in micro-units and as doubles."""
    ev = _t(spark, sf_dir, "events")
    h = portable_hash(F.concat_ws("|", F.lit("cal"), F.col("event_id")))
    score = (h % 700) + F.when(
        F.col("event_type") == "click", F.lit(300)
    ).otherwise(F.lit(0))
    feats = ev.select(
        (F.col("event_type") == "click").cast("long").alias("y"),
        (score - 500).cast("long").alias("x1"),
        F.lit(256).cast("long").alias("x2"),
    ).localCheckpoint(eager=False)
    n = feats.count()
    w1, w2 = 0, 0  # driver-side micro-unit weights: 1-row iterate
    for _ in range(_PL_EPOCHS):
        z = F.col("x1") * F.lit(w1) + F.col("x2") * F.lit(w2)
        yh = F.least(
            F.lit(1000).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.lit(500)
                + F.floor(z.cast("double") / F.lit(4096000.0)).cast("long"),
            ),
        )
        [g] = feats.select(
            F.sum((F.col("y") * 1000 - yh) * F.col("x1")).alias("g1"),
            F.sum((F.col("y") * 1000 - yh) * F.col("x2")).alias("g2"),
        ).collect()
        import math

        w1 += math.floor(float(g.g1 * 25) / (256 * n))
        w2 += math.floor(float(g.g2 * 25) / (256 * n))
    return spark.createDataFrame(
        [(1, w1, w1 / 1_000_000.0), (2, w2, w2 / 1_000_000.0)],
        "dim int, w_micro long, weight double",
    )
