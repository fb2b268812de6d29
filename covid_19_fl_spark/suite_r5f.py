"""Round-5 suite additions, batch F: sequence mining + hierarchy.

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

Determinism discipline unchanged: struct-sorted sequences (never a
bare collect_list order), DECIMAL money sums, deterministic top-k
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    types = F.transform(F.col("s"), lambda x: x["event_type"])
    tri = seq.filter(F.size("s") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(types, i),
                    F.element_at(types, i + 1),
                    F.element_at(types, i + 2),
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
