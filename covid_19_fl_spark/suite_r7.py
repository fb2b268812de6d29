"""Round-7 suite batch — per-source capped link prediction.

``x_link_prediction`` ranks every non-adjacent common-neighbor pair
GLOBALLY (top-50 by resource allocation), which is the lossless
report shape but funnels the final rank through one ordered limit.
The production twin here is the recommender shape a 100 TB graph
actually serves: each source vertex u gets its own top-m predicted
partners via a u-partitioned rank — output bounded at m·|V| no
matter how score mass concentrates, no global ordering anywhere in
the plan (``dd_jaccard_topm_join``'s cap pattern applied to graphs).

Reference tie-in: the reference has no graph surface; the bought-
together graph derives from the same lineitem order/part pairs its
county groupbys aggregate (cv-county-stats.py:49-52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .suite import _t, query

_LP_TOP_M = 3


@query(
    "x_link_prediction_topm",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), adj AS (
      SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges
    ), deg AS (
      SELECT a AS z, COUNT(*) AS d FROM adj GROUP BY 1
    ), wedge AS (
      SELECT w1.a AS u, w1.b AS z, w2.b AS w
      FROM adj w1 JOIN adj w2 ON w1.b = w2.a
      WHERE w1.a < w2.b
    ), nonadj AS (
      SELECT wd.u, wd.z, wd.w FROM wedge wd
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u = wd.u AND e.v = wd.w)
    ), scores AS (
      SELECT n.u, n.w, CAST(COUNT(*) AS BIGINT) AS cn,
             ROUND(list_reduce(
               list_prepend(0.0::DOUBLE,
                            list_sort(list(CAST(d.d AS DOUBLE)))),
               (acc, x) -> acc + 1.0 / x), 6) AS ra
      FROM nonadj n JOIN deg d ON d.z = n.z
      GROUP BY n.u, n.w
    ), sym AS (
      SELECT u AS src, w AS partner, cn, ra FROM scores
      UNION ALL
      SELECT w AS src, u AS partner, cn, ra FROM scores
    )
    SELECT src, partner, cn, ra, rk FROM (
      SELECT src, partner, cn, ra,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY src
               ORDER BY ra DESC, cn DESC, partner ASC) AS BIGINT) AS rk
      FROM sym
    ) WHERE rk <= {_LP_TOP_M}
    """,
)
def x_link_prediction_topm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source capped link prediction — ``x_link_prediction``'s
    production twin (that query's own docstring prescribes this
    shape: "at 100 TB you'd cap per-u instead, doc-partitioned rank,
    dd_jaccard_topm_join's shape").

    Same exact graph and scoring (common neighbors + resource
    allocation RA = Σ_z 1/deg(z), order-pinned sorted fold so the 6dp
    round is bit-identical cross-engine), then the candidate pairs are
    SYMMETRIZED — a predicted link (u, w) is a recommendation for both
    endpoints — and each source vertex keeps only its top-m partners
    via a rank window PARTITIONED on the source. No global sort: the
    rank shuffles on src exactly like any keyed aggregation, every
    partition ranks its own sources, and output is ≤ m·|V| however
    densely score mass concentrates on hub pairs. The uncapped
    global-top-50 original stays registered as the lossless oracle
    twin."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        # feeds three subtrees (adjacency both ways + the anti probe)
        .cache()
    )
    adj = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("z")).agg(F.count("*").alias("d"))
    w1, w2 = adj.alias("w1"), adj.alias("w2")
    wedge = (
        w1.join(w2, F.col("w1.b") == F.col("w2.a"))
        .filter(F.col("w1.a") < F.col("w2.b"))
        .select(
            F.col("w1.a").alias("u"),
            F.col("w1.b").alias("z"),
            F.col("w2.b").alias("w"),
        )
    )
    probe = edges.select(F.col("u").alias("eu"), F.col("v").alias("ev"))
    nonadj = wedge.join(
        probe,
        (F.col("u") == F.col("eu")) & (F.col("w") == F.col("ev")),
        "left_anti",
    )
    wd = nonadj.join(deg, "z").select("u", "w", "d")
    scores = (
        wd.groupBy("u", "w")
        .agg(
            F.count("*").alias("cn"),
            F.sort_array(F.collect_list(F.col("d").cast("double"))).alias("ds"),
        )
        .select(
            "u",
            "w",
            "cn",
            F.round(
                F.aggregate(
                    "ds", F.lit(0.0), lambda acc, x: acc + F.lit(1.0) / x
                ),
                6,
            ).alias("ra"),
        )
    )
    sym = scores.select(
        F.col("u").alias("src"), F.col("w").alias("partner"), "cn", "ra"
    ).unionAll(
        scores.select(
            F.col("w").alias("src"), F.col("u").alias("partner"), "cn", "ra"
        )
    )
    wr = Window.partitionBy("src").orderBy(
        F.col("ra").desc(), F.col("cn").desc(), F.col("partner").asc()
    )
    return (
        sym.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= _LP_TOP_M)
        .select("src", "partner", "cn", "ra", "rk")
    )
