"""Round-5 suite additions, batch E: sequential statistics at scale.

- ``x_runs_test`` — Wald–Wolfowitz runs test for randomness of the
  daily order-count series around its median: completes the repo's
  nonparametric battery (Mann-Whitney / Kruskal-Wallis / Mann-Kendall
  / Kolmogorov-Smirnov / chi²) with the classic sequence-randomness
  test. Median comparison is done in doubled-integer space (2·count
  vs the two middle values summed) so the above/below/drop trichotomy
  never touches a float.
- ``x_jackknife_ci`` — delete-one-block jackknife standard error of
  the mean over md5-bucketed blocks: THE distributed resampling
  pattern (each replicate is "totals minus one block's totals", so B
  replicates cost ONE aggregation pass — no data is ever resampled or
  reshuffled). Bootstrap-grade uncertainty at 100 TB for the price of
  a groupBy.
- ``x_spearman_corr`` — tie-corrected Spearman rank correlation
  between lineitem quantity and extended price, with average ranks in
  doubled-integer space (2·rank is always integral) built from
  per-distinct-value counts + the ``operators/ranks`` bucket-spine
  prefix — NO global row sort: ranks come from value-level
  aggregation, so the plan scales like a groupBy, not like a sort.
- ``x_sprt_monitor`` — Wald's sequential probability ratio test over
  the daily purchase-conversion stream (H0: p=0.45 vs H1: p=0.55,
  α=β=0.05): the anytime-valid sequential A/B primitive next to the
  CUSUM drift monitor. The symmetric-hypotheses LLR collapses to
  (2k−n)·ln(p1/p0); the log-likelihood constant is quantized to
  integer nano-nats ONCE in Python and shared verbatim by both
  engines, so the cumulative walk is exact integer arithmetic.

Determinism discipline unchanged: integer sufficient statistics
across shuffles, md5-affine portable bucket assignment, shared
literal constants, ordered sequential folds where doubles must sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .llmops.dedup import portable_hash
from .operators.ranks import with_global_prefix
from .suite import _t, query

# ---------------------------------------------------------------------------
# x_runs_test — Wald–Wolfowitz runs test on daily order counts
# ---------------------------------------------------------------------------


@query(
    "x_runs_test",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), med AS (
      -- doubled median: the two middle values summed (equals 2*median),
      -- so the above/below/equal trichotomy stays in integers
      SELECT CAST(SUM(n_orders) AS BIGINT) AS med2 FROM (
        SELECT n_orders,
               ROW_NUMBER() OVER (ORDER BY n_orders, day) AS rn,
               COUNT(*) OVER () AS n
        FROM daily) t
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    ), signed AS (
      SELECT day, CASE WHEN 2 * n_orders > med2 THEN 1 ELSE 0 END AS sgn
      FROM daily, med
      WHERE 2 * n_orders <> med2
    ), runs AS (
      SELECT sgn,
             CASE WHEN LAG(sgn) OVER (ORDER BY day) IS NULL
                    OR LAG(sgn) OVER (ORDER BY day) <> sgn
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    )
    SELECT CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(SUM(new_run) AS BIGINT) AS n_runs,
           ROUND(1.0 + 2.0 * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                           * SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
                           / COUNT(*), 6) AS mu_r,
           ROUND((SUM(new_run)
                  - (1.0 + 2.0 * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                               * SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
                               / COUNT(*)))
                 / sqrt((2.0 * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                             * SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
                         * (2.0 * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                                * SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
                            - COUNT(*)))
                        / (1.0 * COUNT(*) * COUNT(*) * (COUNT(*) - 1))),
                 6) AS z_score
    FROM runs
    """,
)
def x_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test: is the daily order-count series
    random around its median, or does it trend/oscillate? Days equal
    to the median drop (the standard convention); the doubled-integer
    median (sum of the two middle values) keeps the trichotomy exact.

    Scale shape: ONE map-combined groupBy builds the daily series;
    every later window runs over the |days| domain-bounded aggregate
    (a few thousand rows at any corpus size), and the final statistic
    is a 1-row reduction of BIGINT counts — z's float expression tree
    is written identically in both engines over those exact integers.
    """
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("n_orders")
    )
    ranked = daily.select(
        "day",
        "n_orders",
        F.row_number().over(Window.partitionBy().orderBy("n_orders", "day")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    # Spark's / on ints is double division — explicit floor matches //
    med = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    ).agg(F.sum("n_orders").cast("long").alias("med2"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("n_orders") * 2 != F.col("med2"))
        .select(
            "day",
            F.when(F.col("n_orders") * 2 > F.col("med2"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("sgn"),
        )
    )
    wday = Window.partitionBy().orderBy("day")
    runs = signed.select(
        "sgn",
        F.when(
            F.lag("sgn").over(wday).isNull()
            | (F.lag("sgn").over(wday) != F.col("sgn")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("r"),
        F.count("*").cast("long").alias("n"),
    )
    n1, n2, r, n = (F.col(c).cast("double") for c in ("n1", "n2", "r", "n"))
    mu = F.lit(1.0) + F.lit(2.0) * n1 * n2 / n
    var = (
        (F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n))
        / (F.lit(1.0) * n * n * (n - F.lit(1.0)))
    )
    return agg.select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round(mu, 6).alias("mu_r"),
        F.round(F.try_divide(r - mu, F.sqrt(var)), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# x_jackknife_ci — delete-one-block jackknife SE of the mean
# ---------------------------------------------------------------------------

_JK_K = 30  # blocks; replicate k = totals minus block k's totals


@query(
    "x_jackknife_ci",
    oracle=f"""
    WITH blk AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                  % {_JK_K} AS BIGINT) AS b,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS s_k,
             CAST(COUNT(*) AS BIGINT) AS n_k
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(s_k) AS DECIMAL(28,2)) AS s, CAST(SUM(n_k) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS kk
      FROM blk
    ), theta AS (
      -- leave-one-block-out means, ordered by block id for the folds
      SELECT list(CAST(s - s_k AS DOUBLE) / CAST(n - n_k AS DOUBLE)
                  ORDER BY b) AS th,
             ANY_VALUE(CAST(s AS DOUBLE) / n) AS mean_all,
             ANY_VALUE(n) AS n, ANY_VALUE(kk) AS kk
      FROM blk, tot
    ), folded AS (
      SELECT n, kk, mean_all, th,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), th),
                         (acc, x) -> acc + x) / kk AS th_bar
      FROM theta
    )
    SELECT n,
           ROUND(mean_all, 6) AS mean_price,
           ROUND(th_bar, 6) AS theta_bar,
           ROUND(sqrt((kk - 1.0) / kk
                      * list_reduce(
                          list_prepend(CAST(0 AS DOUBLE),
                            list_transform(th, x -> (x - th_bar) * (x - th_bar))),
                          (acc, x) -> acc + x)),
                 6) AS se_jack
    FROM folded
    """,
)
def x_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife SE of the mean order price over
    30 md5-hash blocks — the resampling-without-resampling
    pattern: replicate k's statistic is (S − S_k)/(N − n_k), so ALL
    replicates come from one groupBy's block totals and the data is
    touched exactly once. At 100 TB this is how you put an error bar
    on any pipeline metric without a second pass (block = shard, and
    the hash block assignment is engine/partitioning-invariant).

    Exactness: block sums are DECIMAL (associative), replicate means
    are identical double expression trees, and the two double
    summations (Σθ and Σ(θ−θ̄)²) run as ORDERED sequential folds over
    the block-id-sorted array on both engines (the x_chi2 recipe) —
    never an unordered SUM of doubles."""
    orders = _t(spark, sf_dir, "orders")
    blk = orders.groupBy(
        (portable_hash(F.col("o_orderkey").cast("string")) % _JK_K)
        .cast("long")
        .alias("b")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
        .cast("decimal(28,2)")
        .alias("s_k"),
        F.count("*").cast("long").alias("n_k"),
    )
    tot = blk.agg(
        F.sum("s_k").cast("decimal(28,2)").alias("s"),
        F.sum("n_k").cast("long").alias("n"),
        F.count("*").cast("long").alias("kk"),
    )
    theta = (
        blk.crossJoin(F.broadcast(tot))
        .select(
            "b",
            "n",
            "kk",
            (F.col("s").cast("double") / F.col("n")).alias("mean_all"),
            (
                (F.col("s") - F.col("s_k")).cast("double")
                / (F.col("n") - F.col("n_k")).cast("double")
            ).alias("th_k"),
        )
    )
    folded = theta.groupBy("n", "kk", "mean_all").agg(
        F.array_sort(F.collect_list(F.struct("b", "th_k"))).alias("pairs")
    )
    th = F.transform(F.col("pairs"), lambda p: p["th_k"])
    th_sum = F.aggregate(
        th, F.lit(0.0).cast("double"), lambda acc, x: acc + x
    )
    folded = folded.withColumn("th_bar", th_sum / F.col("kk"))
    ss = F.aggregate(
        F.transform(
            th, lambda x: (x - F.col("th_bar")) * (x - F.col("th_bar"))
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return folded.select(
        "n",
        F.round("mean_all", 6).alias("mean_price"),
        F.round("th_bar", 6).alias("theta_bar"),
        F.round(
            F.sqrt((F.col("kk") - F.lit(1.0)) / F.col("kk") * ss), 6
        ).alias("se_jack"),
    )


# ---------------------------------------------------------------------------
# x_spearman_corr — tie-corrected Spearman without a global row sort
# ---------------------------------------------------------------------------


def _avg_rank2(df: DataFrame, col: str, bucket_width: float) -> DataFrame:
    """Per-distinct-value DOUBLED average rank (2·avg_rank is always
    an integer): avg_rank = cnt_less + (cnt_eq + 1)/2, so
    2·avg_rank = 2·cnt_less + cnt_eq + 1 — from value-level counts
    plus an exclusive prefix over the value order (bucket-spine
    decomposition; no global sort of rows OR of distinct values)."""
    counts = df.groupBy(col).agg(F.count("*").cast("long").alias("_c"))
    pref = with_global_prefix(
        counts,
        F.floor(F.col(col) / bucket_width),
        [F.col(col)],
        running_sums={"_cum": F.col("_c")},
    )
    return pref.select(
        col,
        (
            F.lit(2) * (F.col("_cum") - F.col("_c")) + F.col("_c") + F.lit(1)
        ).alias(f"_r2_{col}"),
    )


_SPEAR_ORACLE = """
    WITH ra AS (
      SELECT l_quantity AS v,
             2 * (SUM(CAST(COUNT(*) AS BIGINT)) OVER (ORDER BY l_quantity) - COUNT(*))
               + COUNT(*) + 1 AS r2
      FROM lineitem GROUP BY 1
    ), rb AS (
      SELECT l_extendedprice AS v,
             2 * (SUM(CAST(COUNT(*) AS BIGINT)) OVER (ORDER BY l_extendedprice) - COUNT(*))
               + COUNT(*) + 1 AS r2
      FROM lineitem GROUP BY 1
    ), joined AS (
      SELECT CAST(ra.r2 AS BIGINT) AS x, CAST(rb.r2 AS BIGINT) AS y
      FROM lineitem l
      JOIN ra ON l.l_quantity = ra.v
      JOIN rb ON l.l_extendedprice = rb.v
    ), mom AS (
      -- HUGEINT (int128) moment combination: n·Σxy ≈ 5·10²³ overflows
      -- BIGINT; Spark's side uses DECIMAL(38,0) — both exact integers,
      -- so the final int→double conversions round identically
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy
      FROM joined
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
    FROM mom
"""


@query("x_spearman_corr", oracle=_SPEAR_ORACLE)
def x_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation (quantity vs extended
    price): Pearson over average ranks, with ranks in doubled-integer
    space so every moment is exact BIGINT/DECIMAL — the float appears
    only in the final one-row ρ expression (identical tree both
    engines; Pearson is invariant under the affine 2r map).

    Scale shape: ranks come from per-DISTINCT-VALUE counts + the
    bucket-spine exclusive prefix (operators/ranks) — the plan is two
    groupBys and two equi-joins back to the fact table; NO global row
    sort anywhere, unlike the textbook rank() formulation. Moments
    combine in DECIMAL(38) (n·Σxy ≈ 5·10²³ overflows BIGINT), then
    one double division."""
    li = _t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    ra = _avg_rank2(li, "l_quantity", 1.0)
    rb = _avg_rank2(li, "l_extendedprice", 1000.0)
    joined = (
        li.join(F.broadcast(ra), "l_quantity")
        .join(rb, "l_extendedprice")
        .select(
            F.col("_r2_l_quantity").alias("x"),
            F.col("_r2_l_extendedprice").alias("y"),
        )
    )
    mom = joined.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# x_sprt_monitor — Wald sequential probability ratio test
# ---------------------------------------------------------------------------

# H0: p = 0.45, H1: p = 0.55 (symmetric around 1/2, so the LLR
# collapses to (2k − n)·ln(p1/p0)); α = β = 0.05. The irrational
# constants are quantized ONCE here and shared verbatim with the
# oracle SQL — the cumulative walk is then exact integer arithmetic.
_SPRT_LA_NANO = 200670695  # round(ln(0.55/0.45) · 1e9)
_SPRT_BOUND_NANO = 2944438979  # round(ln((1−β)/α) · 1e9) = ln(19)·1e9


@query(
    "x_sprt_monitor",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ), walk AS (
      SELECT day, n, k,
             CAST(SUM(2 * k - n) OVER (ORDER BY day)
                  * {_SPRT_LA_NANO} AS BIGINT) AS llr_nano
      FROM daily
    )
    SELECT day, n, k, llr_nano,
           CASE WHEN llr_nano >= {_SPRT_BOUND_NANO} THEN 'accept_h1'
                WHEN llr_nano <= -{_SPRT_BOUND_NANO} THEN 'accept_h0'
                ELSE 'continue' END AS state
    FROM walk
    """,
)
def x_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT over the daily purchase-conversion stream — the
    anytime-valid sequential A/B stopping rule (test H0: p=0.45 vs
    H1: p=0.55 of P(value ≥ 50) at α=β=0.05), emitting the daily
    log-likelihood-ratio walk and its decision state. Pairs with the
    CUSUM drift monitor (st_cusum_drift): CUSUM detects a CHANGE, the
    SPRT decides BETWEEN fixed hypotheses with guaranteed error rates.

    The symmetric hypotheses make LLR = (2k−n)·ln(p1/p0); with the
    log constant quantized to integer nano-nats in Python and embedded
    as the same literal in both engines, the whole walk — including
    the running sum over days — is exact BIGINT arithmetic. Scale:
    one map-combined daily aggregate, then a domain-bounded (|days|)
    ordered prefix."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("value") >= 50.0, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    wday = Window.partitionBy().orderBy("day")
    walk = daily.select(
        "day",
        "n",
        "k",
        (
            F.sum(F.lit(2) * F.col("k") - F.col("n")).over(
                wday.rowsBetween(Window.unboundedPreceding, 0)
            )
            * F.lit(_SPRT_LA_NANO)
        ).alias("llr_nano"),
    )
    return walk.select(
        "day",
        "n",
        "k",
        "llr_nano",
        F.when(F.col("llr_nano") >= _SPRT_BOUND_NANO, F.lit("accept_h1"))
        .when(F.col("llr_nano") <= -_SPRT_BOUND_NANO, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("state"),
    )
