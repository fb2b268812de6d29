"""Round-5 suite additions, batch F: sequence mining, hierarchy,
PQ search, parametric testing.

- ``x_path_trigrams`` — clickstream path mining: the top consecutive
  event-type trigrams across per-user ordered histories. The sequence
  primitive BETWEEN x_markov_transitions (1-step memory) and
  x_event_funnel (one fixed pattern): frequent free-form paths.
- ``x_bom_rollup`` — hierarchical subtree rollup over an implicit
  digit-tree (parent = key // 10): every node's descendant count and
  subtree value, computed bottom-up one level per round so each
  shuffle is 10× smaller than the last — the bill-of-materials /
  org-chart / category-tree recursive aggregation family, which
  GROUP BY ROLLUP (fixed column hierarchies) cannot express.
- ``ss_pq_adc_topk`` — asymmetric-distance top-k over the PQ codes
  (the SEARCH half of product quantization; ``ss_pq_quantize`` is the
  compression half): distance-table lookups summed per candidate,
  tournament top-k, exact integer micro-distances end to end.
- ``x_welch_ttest`` — Welch's unequal-variance two-sample t-test
  (t, Welch–Satterthwaite df, Cohen's d) from exact integer-cents
  moments; the parametric companion to the nonparametric battery.

Determinism discipline unchanged: struct-sorted sequences (never a
bare collect_list order), DECIMAL money sums, deterministic top-k
tie-breaks, float expression trees written identically in both
engines over exact integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llmops import similarity
from .suite import _t, query

# ---------------------------------------------------------------------------
# x_path_trigrams — top event-type trigram paths over user histories
# ---------------------------------------------------------------------------


@query(
    "x_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS tl
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY 1
    ), tri AS (
      SELECT tl[i] || '>' || tl[i+1] || '>' || tl[i+2] AS path
      FROM seq, LATERAL (
        SELECT unnest(generate_series(1, len(tl) - 2)) AS i
      ) g
      WHERE len(tl) >= 3
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY 1
    ORDER BY n DESC, path ASC LIMIT 15
    """,
)
def x_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 consecutive event-type trigram paths over per-user
    ordered event histories — the free-form clickstream-path miner
    (what do users actually DO, in order?) next to the fixed-pattern
    funnel and the 1-step Markov matrix.

    Determinism: the per-user sequence comes from array_sort over
    (ts, event_id, type) structs — never a bare collect_list, whose
    order is partition-dependent. Scale shape: one shuffle groups each
    user's events (arrays bounded by per-user activity; a production
    run sessionizes first, which this corpus's bounded histories stand
    in for), trigrams explode from scan-stage HOFs, and the count is
    map-combinable; top-15 ties break (count DESC, path ASC)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("s")
    )
    # Materialize the type list as a real column BEFORE the trigram
    # HOF (round 10): HOFs run interpreted with no common-subexpression
    # elimination, so referencing the `transform(s, …)` expression
    # inside the lambda re-projected the WHOLE struct array for every
    # element_at — 3 full-array projections per trigram position,
    # O(len²) per user (the word_shingles let-binding lesson).
    tl = seq.filter(F.size("s") >= 3).select(
        F.transform(F.col("s"), lambda x: x["event_type"]).alias("tl")
    )
    tri = tl.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tl") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(F.col("tl"), i),
                    F.element_at(F.col("tl"), i + 1),
                    F.element_at(F.col("tl"), i + 2),
                ),
            )
        ).alias("path")
    )
    return (
        tri.groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(15)
    )


# ---------------------------------------------------------------------------
# x_bom_rollup — recursive subtree aggregation over the digit tree
# ---------------------------------------------------------------------------


@query(
    "x_bom_rollup",
    oracle="""
    WITH RECURSIVE contrib AS (
      SELECT p_partkey AS node,
             CAST(p_retailprice AS DECIMAL(28,2)) AS v
      FROM part
      UNION ALL
      SELECT node // 10, v FROM contrib WHERE node >= 10
    )
    SELECT node,
           CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(v) AS DOUBLE) AS subtree_value
    FROM contrib
    WHERE node < 1000
    GROUP BY 1
    """,
)
def x_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy rollup (bill-of-materials / category-tree
    pattern): every part belongs to the implicit digit tree
    parent(k) = k // 10, and each node ≤ 3 digits reports its subtree
    size and total retail value — the arbitrary-depth aggregation that
    GROUP BY ROLLUP's fixed column list cannot express.

    Plan: bottom-up level propagation — round i lifts the level-i
    contribution table one digit (floor-div + groupBy SUM), so each
    shuffle is 10× SMALLER than the previous and the number of rounds
    is log10(max key) (7 at a 100 TB part table, each round a
    map-combinable agg). The oracle is the recursive-CTE closure over
    the same tree, proving the per-level propagation ≡ the full
    transitive contribution set. DECIMAL sums keep every partial
    associative-exact."""
    part = _t(spark, sf_dir, "part")
    contrib = part.select(
        F.col("p_partkey").cast("long").alias("node"),
        F.col("p_retailprice").cast("decimal(28,2)").alias("v"),
        F.lit(1).cast("long").alias("c"),
    )
    max_key = part.agg(F.max("p_partkey")).collect()[0][0]
    acc = contrib
    lifted = contrib
    k = max_key
    while k >= 10:
        lifted = (
            lifted.filter(F.col("node") >= 10)
            .groupBy(F.floor(F.col("node") / 10).cast("long").alias("node"))
            .agg(
                F.sum("v").cast("decimal(28,2)").alias("v"),
                F.sum("c").cast("long").alias("c"),
            )
        )
        acc = acc.unionByName(lifted)
        k //= 10
    return (
        acc.filter(F.col("node") < 1000)
        .groupBy("node")
        .agg(
            F.sum("c").cast("long").alias("n_desc"),
            F.sum("v").cast("double").alias("subtree_value"),
        )
    )


# ---------------------------------------------------------------------------
# ss_pq_adc_topk — asymmetric-distance search over PQ codes
# ---------------------------------------------------------------------------


def _pq_adc_oracle(m: int = 8, dims: int = 64, k: int = 5) -> str:
    """DuckDB replica of similarity.pq_adc_topk: the same codebooks,
    code assignment and 6dp-rounded sub-distances as _pq_oracle
    (suite_llmops), then the query-side distance table and the integer
    micro-distance ADC sum."""
    Q = int(similarity.CENTROID_Q)
    d = dims // m
    ids = "0, 1, 2, 3, 4, 5, 6, 7"
    diff2 = (
        "list_sum([ (CAST(sv[i] AS DOUBLE) - csub[i])"
        " * (CAST(sv[i] AS DOUBLE) - csub[i])"
        " for i in generate_series(1, len(sv)) ])"
    )
    qdiff2 = diff2.replace("sv[i]", "qsv[i]").replace("len(sv)", "len(qsv)")
    return f"""
    WITH cent_dims AS (
      SELECT label, i AS pos,
             SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {Q}) AS BIGINT)) AS sq,
             COUNT(*) AS n
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
      GROUP BY label, i
    ),
    cent AS (
      SELECT label, list((CAST(sq AS DOUBLE) / n) / {Q} ORDER BY pos) AS centroid
      FROM cent_dims GROUP BY label
    ),
    books AS (
      SELECT label, s AS sub_idx, centroid[s*{d}+1 : (s+1)*{d}] AS csub
      FROM cent, (SELECT unnest(generate_series(0, {m - 1})) AS s)
    ),
    subv AS (
      SELECT vec_id, s AS sub_idx, embedding[s*{d}+1 : (s+1)*{d}] AS sv
      FROM embeddings, (SELECT unnest(generate_series(0, {m - 1})) AS s)
    ),
    scored AS (
      SELECT vec_id, sub_idx, label, ROUND({diff2}, 6) AS dist
      FROM subv JOIN books USING (sub_idx)
    ),
    best AS (
      SELECT vec_id, sub_idx, label AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub_idx
                                     ORDER BY dist ASC, label ASC) AS rn
        FROM scored) WHERE rn = 1
    ),
    qsub AS (
      SELECT vec_id AS query_id, s AS sub_idx,
             embedding[s*{d}+1 : (s+1)*{d}] AS qsv
      FROM embeddings, (SELECT unnest(generate_series(0, {m - 1})) AS s)
      WHERE vec_id IN ({ids})
    ),
    dtab AS (
      SELECT query_id, sub_idx, label AS code,
             CAST(ROUND(ROUND({qdiff2.replace('csub', 'csub')}, 6) * 1e6, 0)
                  AS BIGINT) AS d_micro
      FROM qsub JOIN books USING (sub_idx)
    ),
    adc AS (
      SELECT query_id, vec_id, CAST(SUM(d_micro) AS BIGINT) AS adc_micro
      FROM best JOIN dtab USING (sub_idx, code)
      WHERE vec_id <> query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT query_id, vec_id AS neighbor_id,
             CAST(adc_micro AS DOUBLE) / 1e6 AS adc_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_micro ASC, vec_id ASC)
                  AS INT) AS rank
      FROM adc) WHERE rank <= {k}
    """


@query("ss_pq_adc_topk", oracle=_pq_adc_oracle())
def ss_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-5 for the 8 standard query
    vectors over the PQ codes — the FAISS-style scan where the corpus
    is m table lookups per candidate and only the query stays
    full-precision. Completes the PQ story begun by ss_pq_quantize
    (compression) with its retrieval half; see similarity.pq_adc_topk
    for the broadcast distance-table + tournament-top-k plan shape."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(emb, [0, 1, 2, 3, 4, 5, 6, 7], k=5)


# ---------------------------------------------------------------------------
# x_welch_ttest — unequal-variance two-sample t-test
# ---------------------------------------------------------------------------


@query(
    "x_welch_ttest",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), mom AS (
      SELECT
        CAST(SUM(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN grp = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN grp = '1-URGENT' THEN c ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN grp = '5-LOW' THEN c ELSE 0 END) AS BIGINT) AS s2,
        SUM(CASE WHEN grp = '1-URGENT' THEN c * c ELSE 0 END) AS ss1,
        SUM(CASE WHEN grp = '5-LOW' THEN c * c ELSE 0 END) AS ss2
      FROM cents
    ), v AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s2 AS DOUBLE) / n2 AS m2,
             CAST(n1 * ss1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) * n1 AS v1,
             CAST(n2 * ss2 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) * n2 AS v2
      FROM mom
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           ROUND(m1 / 100, 6) AS mean_urgent,
           ROUND(m2 / 100, 6) AS mean_low,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(
             (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch,
           ROUND((m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)),
                 6) AS cohen_d
    FROM v
    """,
)
def x_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test of mean order price,
    1-URGENT vs 5-LOW — t statistic, Welch–Satterthwaite df and
    Cohen's d: the parametric companion the nonparametric battery
    (Mann-Whitney/KS/runs) defers to when normality is defensible.

    Exactness: ONE conditional-aggregate scan produces integer-cents
    moments (Σc as BIGINT, Σc² in DECIMAL(38)/HUGEINT — c² sums
    overflow int64); every float is then derived from those exact
    integers through expression trees written identically in both
    engines (sample variance in its n·Σx²−(Σx)² form). Scale: one
    map-combinable pass, 1-row reduction — the same shape at any SF.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    is1 = F.col("o_orderpriority") == "1-URGENT"
    mom = orders.select(
        c.alias("c"), is1.alias("g1")
    ).agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("g1"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("g1"), F.col("c")).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(~F.col("g1"), F.col("c")).otherwise(0)).cast("long").alias("s2"),
        F.sum(
            F.when(F.col("g1"), (F.col("c") * F.col("c")).cast("decimal(38,0)"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ss1"),
        F.sum(
            F.when(~F.col("g1"), (F.col("c") * F.col("c")).cast("decimal(38,0)"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (
        (n1.cast("decimal(38,0)") * F.col("ss1")
         - F.col("s1").cast("decimal(38,0)") * F.col("s1")).cast("double")
        / (n1.cast("double") * n1 * (n1 - 1))
        * n1
    )
    v2 = (
        (n2.cast("decimal(38,0)") * F.col("ss2")
         - F.col("s2").cast("decimal(38,0)") * F.col("s2")).cast("double")
        / (n2.cast("double") * n2 * (n2 - 1))
        * n2
    )
    se1, se2 = v1 / n1, v2 / n2
    return mom.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(m1 / 100, 6).alias("mean_urgent"),
        F.round(m2 / 100, 6).alias("mean_low"),
        F.round((m1 - m2) / F.sqrt(se1 + se2), 6).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)),
            6,
        ).alias("df_welch"),
        F.round(
            (m1 - m2)
            / F.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)),
            6,
        ).alias("cohen_d"),
    )
