"""Round-6 suite batch — bounded-output production twins.

The two exact similarity self-joins (``dd_jaccard_prefix_join``,
``dd_edit_distance_join``) are lossless by design, which makes their
OUTPUT quadratic on duplicate-dense corpora (~980× more pairs for 10×
rows on the replica scale corpus): any exact join pays the answer
size. These twins are the production path a 100 TB pipeline actually
ships: each document reports only its top-m strongest qualifying
partners, so output is ≤ m·|corpus| regardless of dup saturation,
while the uncapped originals remain registered as the losslessness
oracles.

Reference tie-in: the reference dedups by exact county/state name
equality only (cv-county-stats.py:49-52 groupby); the capped
similarity report is the scalable fuzzy generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .suite import _t, query

_TOP_M = 3


def _top_m_partners(
    pairs: DataFrame, metric: str, ascending: bool, m: int = _TOP_M
) -> DataFrame:
    """Mirror an (id_a < id_b) pair list to per-document view and keep
    each document's top-m partners by the metric (ties → smallest
    partner id). The rank window partitions by doc_id — per-key sort,
    bounded by the doc's own candidate count, never a global sort —
    and ORDERS BY THE ROUNDED metric both here and in the oracles
    (raw doubles could tie differently after rounding)."""
    sym = pairs.select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").alias("partner_id"),
        metric,
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("doc_id"),
            F.col("id_a").alias("partner_id"),
            metric,
        )
    )
    order = (
        F.col(metric).asc() if ascending else F.col(metric).desc()
    )
    w = Window.partitionBy("doc_id").orderBy(order, F.col("partner_id").asc())
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= m)
        .select("doc_id", "partner_id", metric, F.col("rk").cast("long").alias("rk"))
    )


@query(
    "dd_jaccard_topm_join",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([ ((ths[i] * 1000003 + ths[i+1]) % 2147483647
                              * 1000003 + ths[i+2]) % 2147483647
                             for i in generate_series(1, greatest(len(ths) - 2, 0)) ])
               AS hs
      FROM (SELECT doc_id,
                   [ (('0x' || substr(md5(t), 1, 15))::BIGINT) % 2147483647
                     for t in regexp_split_to_array(trim(text), '\\s+') ] AS ths
            FROM documents)
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.hs, b.hs))), 6)
               AS jaccard
      FROM sh a JOIN sh b ON b.doc_id > a.doc_id
      WHERE len(list_intersect(a.hs, b.hs)) * 100
            >= 60 * len(list_distinct(list_concat(a.hs, b.hs)))
    ), sym AS (
      SELECT id_a AS doc_id, id_b AS partner_id, jaccard FROM pairs
      UNION ALL
      SELECT id_b, id_a, jaccard FROM pairs
    )
    SELECT doc_id, partner_id, jaccard, rk FROM (
      SELECT doc_id, partner_id, jaccard,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY jaccard DESC, partner_id ASC) AS BIGINT) AS rk
      FROM sym
    ) WHERE rk <= {_TOP_M}
    """,
)
def dd_jaccard_topm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-m Jaccard partners per document — the CAPPED production
    twin of ``dd_jaccard_prefix_join``. Same lossless prefix-filter
    candidate generation and exact portable-shingle Jaccard ≥ 0.60,
    but each document ships only its m=3 strongest partners
    (rounded-jaccard desc, partner id asc), so the result is ≤ m·n
    rows on ANY corpus — a replica-dense corpus that inflates the
    uncapped join's answer ~980× leaves this output linear.

    Scale: the qualifying-pair stream still reflects true near-dup
    mass (that is what exact similarity costs), but it reduces
    per-document through a partitioned rank window — one shuffle on
    doc_id, per-key sort bounded by the doc's own partner count, and
    only m rows per document survive to downstream consumers. The
    oracle replays the naive all-pairs join plus the same window, so
    the hash match proves both the lossless candidates AND the cap
    semantics."""
    from .llmops import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_prefix_pairs(docs, "text", "doc_id", 60, 3)
    return _top_m_partners(pairs, "jaccard", ascending=False)


_ED_PFX = 24  # mirror dd_edit_distance_join's 24-char prefix


@query(
    "dd_edit_topm_join",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, substr(text, 1, {_ED_PFX}) AS pfx FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS ed
      FROM p a JOIN p b ON b.doc_id > a.doc_id
      WHERE levenshtein(a.pfx, b.pfx) <= 1
    ), sym AS (
      SELECT id_a AS doc_id, id_b AS partner_id, ed FROM pairs
      UNION ALL
      SELECT id_b, id_a, ed FROM pairs
    )
    SELECT doc_id, partner_id, ed, rk FROM (
      SELECT doc_id, partner_id, ed,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY ed ASC, partner_id ASC) AS BIGINT) AS rk
      FROM sym
    ) WHERE rk <= {_TOP_M}
    """,
)
def dd_edit_topm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-m edit-distance partners per document — the CAPPED
    production twin of ``dd_edit_distance_join``. Same lossless
    SymSpell deletion-neighborhood candidates over 24-char prefixes,
    but each document reports only its m=3 closest partners
    (ed asc, partner id asc), bounding output at m·n rows on
    duplicate-saturated corpora where the uncapped pair list is
    quadratic.

    Scale: variant equi-join as before (≤ L+1 variants per string),
    then a doc_id-partitioned rank window — per-key sort over the
    doc's own candidates, m survivors per document. The oracle is the
    naive levenshtein all-pairs plus the same window."""
    from .llmops.dedup import edit_distance_pairs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _ED_PFX).alias("pfx")
    )
    pairs = edit_distance_pairs(docs, "pfx", "doc_id")
    return _top_m_partners(pairs, "ed", ascending=True)
