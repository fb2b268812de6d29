"""Round-5 suite additions, batch G: information theory + spatial
statistics.

- ``ml_mutual_information`` — per-feature mutual information with the
  class label (the model-free feature-ranking screen): embedding dims
  binned deterministically, MI from exact integer contingency counts,
  the ln-term sum as an ordered fold.
- ``x_spatial_hotspots`` — Getis-Ord-style hotspot z-scores over the
  (day × value-bucket) event grid: 3×3 neighborhood sums as a bounded
  9-cell fan-out equi-join (no range join), global cell moments
  including EMPTY cells via the exact bounding-grid count.

Determinism discipline unchanged: integer counts across every
shuffle, identical float expression trees, ordered folds where
doubles must sum, rounded outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .suite import _t, query

# ---------------------------------------------------------------------------
# ml_mutual_information — feature ranking by MI with the label
# ---------------------------------------------------------------------------

_MI_DIMS = 8  # leading embedding dims screened
_MI_BINS = 8  # equal-width bins over [-1, 1): bin = clamp(floor(4v)+4)


@query(
    "ml_mutual_information",
    oracle=f"""
    WITH binned AS (
      SELECT d.dim, e.label,
             LEAST({_MI_BINS - 1}, GREATEST(0,
               CAST(FLOOR(CAST(e.embedding[d.dim] AS DOUBLE) * 4) AS BIGINT)
                 + 4)) AS bin
      FROM embeddings e,
           (SELECT unnest(generate_series(1, {_MI_DIMS})) AS dim) d
    ), joint AS (
      SELECT dim, bin, label, CAST(COUNT(*) AS BIGINT) AS c_bl
      FROM binned GROUP BY 1, 2, 3
    ), margb AS (
      SELECT dim, bin, CAST(SUM(c_bl) AS BIGINT) AS c_b
      FROM joint GROUP BY 1, 2
    ), margl AS (
      SELECT dim, label, CAST(SUM(c_bl) AS BIGINT) AS c_l
      FROM joint GROUP BY 1, 2
    ), tot AS (
      SELECT dim, CAST(SUM(c_bl) AS BIGINT) AS n FROM joint GROUP BY 1
    ), terms AS (
      SELECT j.dim,
             list(
               (CAST(c_bl AS DOUBLE) / n)
               * ln((CAST(n AS DOUBLE) * c_bl) / (1.0 * c_b * c_l))
               ORDER BY j.bin, j.label
             ) AS ts,
             ANY_VALUE(n) AS n
      FROM joint j
      JOIN margb USING (dim, bin)
      JOIN margl USING (dim, label)
      JOIN tot USING (dim)
      GROUP BY j.dim
    )
    SELECT dim,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), ts),
                             (acc, x) -> acc + x), 6) AS mi_nats,
           CAST(n AS BIGINT) AS n
    FROM terms
    """,
)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature_bin; label) for the leading 8
    embedding dims — the model-free feature-relevance screen (what a
    feature-selection pass runs before any training): each dim bins
    into 8 deterministic equal-width cells, and MI comes entirely
    from the (dim, bin, label) contingency counts.

    Exactness: all counts are BIGINT from ONE explode+groupBy scan;
    each MI term is the identical double tree
    (c_bl/n)·ln(n·c_bl/(c_b·c_l)) over those exact integers, and the
    per-dim term sum runs as an ORDERED (bin, label) fold on both
    engines (the x_chi2 recipe — never an unordered double SUM).
    Scale: the corpus is touched once (scan-stage posexplode of 8
    array slots); everything after the first agg is |dims·bins·labels|
    ≤ 640 rows."""
    emb = _t(spark, sf_dir, "embeddings")
    binned = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, _MI_DIMS)).alias("dim0", "v"),
    ).select(
        (F.col("dim0") + 1).alias("dim"),
        "label",
        F.least(
            F.lit(_MI_BINS - 1),
            F.greatest(
                F.lit(0),
                (F.floor(F.col("v").cast("double") * 4) + 4).cast("long"),
            ),
        ).alias("bin"),
    )
    joint = binned.groupBy("dim", "bin", "label").agg(
        F.count("*").cast("long").alias("c_bl")
    )
    margb = joint.groupBy("dim", "bin").agg(
        F.sum("c_bl").cast("long").alias("c_b")
    )
    margl = joint.groupBy("dim", "label").agg(
        F.sum("c_bl").cast("long").alias("c_l")
    )
    tot = joint.groupBy("dim").agg(F.sum("c_bl").cast("long").alias("n"))
    term = (
        (F.col("c_bl").cast("double") / F.col("n"))
        * F.log(
            (F.col("n").cast("double") * F.col("c_bl"))
            / (F.lit(1.0) * F.col("c_b") * F.col("c_l"))
        )
    )
    cells = (
        joint.join(margb, ["dim", "bin"])
        .join(margl, ["dim", "label"])
        .join(F.broadcast(tot), "dim")
        .select("dim", "bin", "label", "n", term.alias("t"))
    )
    folded = cells.groupBy("dim", "n").agg(
        F.array_sort(F.collect_list(F.struct("bin", "label", "t"))).alias("ts")
    )
    mi = F.aggregate(
        F.transform(F.col("ts"), lambda s: s["t"]),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return folded.select(
        "dim", F.round(mi, 6).alias("mi_nats"), F.col("n").cast("long").alias("n")
    )


# ---------------------------------------------------------------------------
# x_spatial_hotspots — Getis-Ord-style grid hotspot detection
# ---------------------------------------------------------------------------


@query(
    "x_spatial_hotspots",
    oracle="""
    WITH cells AS (
      SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
             CAST(FLOOR(CAST(value AS DOUBLE) / 5) AS BIGINT) AS vb,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), grid AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(SUM(c * c) AS BIGINT) AS ss,
             CAST((MAX(d) - MIN(d) + 1) * (MAX(vb) - MIN(vb) + 1) AS BIGINT)
               AS n_cells
      FROM cells
    ), hood AS (
      SELECT a.d, a.vb, CAST(SUM(b.c) AS BIGINT) AS s9
      FROM cells a JOIN cells b
        ON b.d BETWEEN a.d - 1 AND a.d + 1
       AND b.vb BETWEEN a.vb - 1 AND a.vb + 1
      GROUP BY 1, 2
    )
    SELECT d, vb, s9,
           ROUND(
             (s9 - 9.0 * n_events / n_cells)
             / sqrt(9.0 * (CAST(ss AS DOUBLE) / n_cells
                           - (CAST(n_events AS DOUBLE) / n_cells)
                             * (CAST(n_events AS DOUBLE) / n_cells))),
             6) AS gi_z
    FROM hood, grid
    ORDER BY gi_z DESC, d ASC, vb ASC
    LIMIT 20
    """,
)
def x_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord-style hotspot detection on the (day × value-bucket)
    event grid: each occupied cell's 3×3 neighborhood sum S9 scored as
    a z against the grid-wide cell mean/variance (empty cells counted
    via the exact bounding-grid extent) — the spatial-clustering
    screen behind outbreak/incident maps, top-20 hottest cells.

    Plan: one groupBy builds the cell counts; the neighborhood sum is
    a bounded 3×3 fan-out EQUI-join on shifted cell keys (the same
    lossless grid pattern as x_spatial_neighbors — no range join);
    the global moments are one 1-row broadcast. Boundary cells use
    the same n=9 normalization (the standard simplification,
    documented). Counts stay BIGINT until the one z division; ties
    break (z desc, d, vb). Scale: cells are domain-bounded (days ×
    buckets), so every post-scan stage is tiny at any SF."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = ev.groupBy(
        F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("d"),
        F.floor(F.col("value").cast("double") / 5).cast("long").alias("vb"),
    ).agg(F.count("*").cast("long").alias("c"))
    grid = cells.agg(
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        ((F.max("d") - F.min("d") + 1) * (F.max("vb") - F.min("vb") + 1))
        .cast("long")
        .alias("n_cells"),
    )
    offsets = [(dd, dv) for dd in (-1, 0, 1) for dv in (-1, 0, 1)]
    probes = cells.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("d") + dd).alias("d"),
                        (F.col("vb") + dv).alias("vb"),
                    )
                    for dd, dv in offsets
                ]
            )
        ).alias("p"),
        F.col("c").alias("cb"),
    ).select(F.col("p.d").alias("d"), F.col("p.vb").alias("vb"), "cb")
    hood = (
        probes.join(cells.select("d", "vb"), ["d", "vb"])
        .groupBy("d", "vb")
        .agg(F.sum("cb").cast("long").alias("s9"))
    )
    mu = F.lit(9.0) * F.col("n_events") / F.col("n_cells")
    var = (
        F.col("ss").cast("double") / F.col("n_cells")
        - (F.col("n_events").cast("double") / F.col("n_cells"))
        * (F.col("n_events").cast("double") / F.col("n_cells"))
    )
    return (
        hood.crossJoin(F.broadcast(grid))
        .select(
            "d",
            "vb",
            "s9",
            F.round(
                (F.col("s9") - mu) / F.sqrt(F.lit(9.0) * var), 6
            ).alias("gi_z"),
        )
        .orderBy(F.col("gi_z").desc(), F.col("d").asc(), F.col("vb").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ml_adaboost_stumps — exact fixed-point boosting on sufficient statistics
# ---------------------------------------------------------------------------

_AB_ROUNDS = 3
_AB_BINS = 16  # bin = clamp(floor(8v) + 8, 0, 15) over dim 1
_AB_Q = 1000  # weight-ratio quantum (thousandths)
_AB_CAP = 1000000  # ratio cap (the e_r = 0 perfect-stump case)


def _ab_pred_sql(t: str, pol: str, b: str) -> str:
    return f"CASE WHEN ({pol} = 1 AND {b} >= {t}) OR ({pol} = 0 AND {b} < {t}) THEN 1 ELSE 0 END"


def _ab_oracle() -> str:
    """DuckDB replica of the 3-round fixed-point AdaBoost: identical
    integer argmins, identical quantized ratio updates, identical
    cross-multiplied ensemble votes — unrolled one CTE block per
    round."""
    rounds_sql = []
    w_prev = "w0"
    for r in (1, 2, 3):
        pred = _ab_pred_sql("cand.t", "cand.pol", "w.bin")
        rounds_sql.append(f"""
    e{r} AS (
      SELECT cand.t, cand.pol,
             CAST(SUM(CASE WHEN {pred} <> w.y THEN w.w * w.c ELSE 0 END)
                  AS HUGEINT) AS err,
             CAST(SUM(w.w * w.c) AS HUGEINT) AS tot
      FROM {w_prev} w CROSS JOIN cand
      GROUP BY 1, 2
    ), s{r} AS (
      SELECT t, pol, err, tot,
             LEAST({_AB_CAP}, GREATEST(1,
               CAST(((tot - err) * {_AB_Q}) // GREATEST(err, 1) AS BIGINT)))
               AS rho
      FROM e{r} ORDER BY err, t, pol LIMIT 1
    ), w{r} AS (
      SELECT w.bin, w.y, w.c,
             w.w * (CASE WHEN {_ab_pred_sql("s.t", "s.pol", "w.bin")} <> w.y
                         THEN s.rho ELSE {_AB_Q} END) AS w
      FROM {w_prev} w CROSS JOIN s{r} s
    )""")
        w_prev = f"w{r}"
    vote_l = " * ".join(
        f"CAST(CASE WHEN {_ab_pred_sql(f's{r}.t', f's{r}.pol', 'w.bin')} = 1 "
        f"THEN s{r}.rho ELSE {_AB_Q} END AS BIGINT)"
        for r in (1, 2, 3)
    )
    vote_r = " * ".join(
        f"CAST(CASE WHEN {_ab_pred_sql(f's{r}.t', f's{r}.pol', 'w.bin')} = 0 "
        f"THEN s{r}.rho ELSE {_AB_Q} END AS BIGINT)"
        for r in (1, 2, 3)
    )
    # cumulative votes after rounds 1 and 2 use only the first r stumps
    def vote_expr(upto: int) -> tuple[str, str]:
        l = " * ".join(
            f"CAST(CASE WHEN {_ab_pred_sql(f's{r}.t', f's{r}.pol', 'w.bin')} = 1 "
            f"THEN s{r}.rho ELSE {_AB_Q} END AS BIGINT)"
            for r in range(1, upto + 1)
        )
        rr = " * ".join(
            f"CAST(CASE WHEN {_ab_pred_sql(f's{r}.t', f's{r}.pol', 'w.bin')} = 0 "
            f"THEN s{r}.rho ELSE {_AB_Q} END AS BIGINT)"
            for r in range(1, upto + 1)
        )
        return l, rr

    acc_cols = []
    for upto in (1, 2, 3):
        l, rr = vote_expr(upto)
        acc_cols.append(
            f"CAST(SUM(CASE WHEN (CASE WHEN {l} > {rr} THEN 1 ELSE 0 END) = w.y"
            f" THEN w.c ELSE 0 END) AS BIGINT) AS corr{upto}"
        )
    joins = ", ".join(f"s{r}" for r in (1, 2, 3))
    return f"""
    WITH cells AS (
      SELECT LEAST({_AB_BINS - 1}, GREATEST(0,
               CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 8) AS BIGINT) + 8))
               AS bin,
             label % 2 AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM embeddings GROUP BY 1, 2
    ), w0 AS (
      SELECT bin, y, c, CAST(1 AS BIGINT) AS w FROM cells
    ), cand AS (
      SELECT t, pol
      FROM (SELECT unnest(generate_series(0, {_AB_BINS - 1})) AS t) tt,
           (VALUES (0), (1)) pp(pol)
    ),{",".join(rounds_sql)},
    acc AS (
      SELECT {", ".join(acc_cols)},
             CAST(SUM(w.c) AS BIGINT) AS n
      FROM w0 w, {joins}
    )
    SELECT r.rnd AS round, r.t AS threshold, r.pol AS polarity,
           CAST(r.rho AS BIGINT) AS rho_milli,
           r.corr AS n_correct,
           ROUND(CAST(r.corr AS DOUBLE) / r.n, 6) AS train_acc
    FROM (
      SELECT 1 AS rnd, s1.t, s1.pol, s1.rho, acc.corr1 AS corr, acc.n FROM s1, acc
      UNION ALL
      SELECT 2, s2.t, s2.pol, s2.rho, acc.corr2, acc.n FROM s2, acc
      UNION ALL
      SELECT 3, s3.t, s3.pol, s3.rho, acc.corr3, acc.n FROM s3, acc
    ) r
    """


@query("ml_adaboost_stumps", oracle=_ab_oracle())
def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-round AdaBoost over decision stumps, trained ENTIRELY
    on sufficient statistics: the corpus reduces ONCE to the
    (bin, label) contingency table (≤ 32 cells — every row in a cell
    shares its feature bin, so it shares every stump's verdict and
    therefore every boosting weight), and all three rounds of
    weighted-error minimization, weight re-scaling and ensemble
    voting run on that bounded table. The sequential-looking ensemble
    algorithm becomes one distributed scan + O(1) model state — the
    same sufficient-statistics discipline as ml_decision_stump /
    ml_kfold_cv, extended to an iteratively REWEIGHTED ensemble.

    Fixed-point exactness (no float enters any decision):
    - round weights are integers: each round multiplies misclassified
      cells by the quantized ratio ρ_r = clamp(((T−e)·1000) div e,
      1, 1e6) and correct cells by 1000 — the AdaBoost
      exp(2α)=(1−e)/e update in thousandths;
    - the stump argmin compares exact integer weighted errors
      (tie-break err, t, pol);
    - the ensemble vote sign(Σ α_r h_r) is decided by integer
      cross-multiplication: Π_{h=1} ρ_r·1000^{#h=0} vs
      Π_{h=0} ρ_r·1000^{#h=1} (≤ 1e18 — BIGINT), because
      α_r = ½ln(ρ_r/1000) makes the log-sum comparison a product
      comparison. Ties vote negative.

    Output: per round — chosen stump (threshold, polarity), ρ in
    milli-units, and the cumulative ensemble's training accuracy.
    The float appears exactly once: the final accuracy division,
    written as the same expression tree both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    cells_df = emb.groupBy(
        F.least(
            F.lit(_AB_BINS - 1),
            F.greatest(
                F.lit(0),
                (
                    F.floor(F.element_at("embedding", 1).cast("double") * 8)
                    + 8
                ).cast("long"),
            ),
        ).alias("bin"),
        (F.col("label") % 2).alias("y"),
    ).agg(F.count("*").cast("long").alias("c"))
    # bounded by construction: ≤ bins × 2 rows of integer counts
    cells = [(r.bin, r.y, r.c) for r in cells_df.collect()]

    def pred(t: int, pol: int, b: int) -> int:
        return 1 if ((pol == 1 and b >= t) or (pol == 0 and b < t)) else 0

    w = {(b, y): 1 for b, y, _ in cells}
    cnt = {(b, y): c for b, y, c in cells}
    stumps: list[tuple[int, int, int]] = []  # (t, pol, rho)
    rows = []
    n = sum(cnt.values())
    for rnd in (1, 2, 3):
        best = None
        for t in range(_AB_BINS):
            for pol in (0, 1):
                err = sum(
                    w[k] * cnt[k] for k in cnt if pred(t, pol, k[0]) != k[1]
                )
                key = (err, t, pol)
                if best is None or key < best:
                    best = key
        err, t, pol = best
        tot = sum(w[k] * cnt[k] for k in cnt)
        rho = min(_AB_CAP, max(1, ((tot - err) * _AB_Q) // max(err, 1)))
        stumps.append((t, pol, rho))
        for k in list(w):
            w[k] *= rho if pred(t, pol, k[0]) != k[1] else _AB_Q
        # cumulative ensemble accuracy via integer cross-multiplication
        corr = 0
        for k, c in cnt.items():
            lhs = rhs = 1
            for st, sp, sr in stumps:
                if pred(st, sp, k[0]) == 1:
                    lhs *= sr
                    rhs *= _AB_Q
                else:
                    lhs *= _AB_Q
                    rhs *= sr
            h = 1 if lhs > rhs else 0
            if h == k[1]:
                corr += c
        rows.append((rnd, t, pol, rho, corr))
    out = spark.createDataFrame(
        rows, "round int, threshold int, polarity int, rho_milli long, n_correct long"
    )
    return out.select(
        "round",
        "threshold",
        "polarity",
        "rho_milli",
        "n_correct",
        F.round(F.col("n_correct").cast("double") / F.lit(n), 6).alias(
            "train_acc"
        ),
    )


# ---------------------------------------------------------------------------
# x_sax_motifs — symbolic aggregate approximation + motif counts
# ---------------------------------------------------------------------------

_SAX_W = 8  # PAA window: 8 consecutive days per segment
_SAX_A = 4  # alphabet size (equi-depth quartile symbols a-d)


@query(
    "x_sax_motifs",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS v
      FROM orders GROUP BY 1
    ), ext AS (
      SELECT MIN(d) AS d0,
             (CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) + 1)
               // {_SAX_W} AS n_full
      FROM daily
    ), paa AS (
      -- fixed-width CALENDAR segments (date-diff days from the series
      -- start): a day with no orders contributes 0, so the observed-
      -- day SUM is the exact 8-day total; only the ragged tail
      -- segment drops, so every kept segment covers the SAME width
      -- and the integer SUM is the exact sort key
      SELECT CAST(date_diff('day', d0, d) AS BIGINT) // {_SAX_W} AS widx,
             CAST(SUM(v) AS BIGINT) AS s
      FROM daily, ext GROUP BY 1
    ), full_w AS (
      SELECT widx, s FROM paa, ext WHERE widx < n_full
    ), sym AS (
      SELECT widx,
             chr(CAST(96 + NTILE({_SAX_A}) OVER (ORDER BY s, widx) AS INTEGER)) AS sy
      FROM full_w
    ), seq AS (
      SELECT list(sy ORDER BY widx) AS ss FROM sym
    ), tri AS (
      SELECT ss[i] || ss[i+1] || ss[i+2] AS motif
      FROM seq, LATERAL (
        SELECT unnest(generate_series(1, len(ss) - 2)) AS i
      ) g
      WHERE len(ss) >= 3
    )
    SELECT motif, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY 1
    ORDER BY n DESC, motif ASC LIMIT 10
    """,
)
def x_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolic motif mining over the daily order-count
    series: fixed 8-day PAA segments, equi-depth quartile symbols
    (a–d), and the top recurring 3-symbol motifs — the time-series
    data-mining primitive (HOT SAX / motif-discovery family) that
    turns a numeric series into a discrete alphabet cheap enough to
    index; completes the time-series family next to seasonal
    decomposition, autocorrelation and changepoints.

    Exactness: segments are fixed CALENDAR windows (a day with no
    orders contributes 0, so the observed-day SUM is the exact window
    total); the ragged tail segment drops, so every kept segment has
    the SAME width and the integer SUM is the exact PAA sort key (no
    mean division anywhere); equi-depth symbols come from
    NTILE over (sum, window-index) — deterministic in both engines;
    motif extraction runs on the struct-sorted symbol array. Scale:
    the series and everything after the first map-combinable daily
    aggregate is domain-bounded (|days|/8 segments)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").cast("long").alias("v")
    )
    ext = daily.agg(
        F.min("d").alias("d0"),
        F.floor(
            (F.datediff(F.max("d"), F.min("d")) + 1) / _SAX_W
        ).cast("long").alias("n_full"),
    )
    paa = (
        daily.crossJoin(F.broadcast(ext))
        .groupBy(
            F.floor(F.datediff(F.col("d"), F.col("d0")) / _SAX_W)
            .cast("long")
            .alias("widx"),
            F.col("n_full"),
        )
        .agg(F.sum("v").cast("long").alias("s"))
        .filter(F.col("widx") < F.col("n_full"))
    )
    from pyspark.sql import Window as W

    sym = paa.select(
        "widx",
        F.ntile(_SAX_A).over(W.partitionBy().orderBy("s", "widx")).alias("nt"),
    ).selectExpr("widx", "char(96 + nt) AS sy")
    seq = sym.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("widx", "sy"))).alias("ps")
    )
    ss = F.transform(F.col("ps"), lambda p: p["sy"])
    tri = seq.select(ss.alias("ss")).filter(F.size("ss") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ss") - 2),
                lambda i: F.concat(
                    F.element_at(F.col("ss"), i),
                    F.element_at(F.col("ss"), i + 1),
                    F.element_at(F.col("ss"), i + 2),
                ),
            )
        ).alias("motif")
    )
    return (
        tri.groupBy("motif")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("motif").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ml_learning_curve — sample-efficiency curve on sufficient statistics
# ---------------------------------------------------------------------------

_LC_FRACTIONS = (10, 25, 50)  # train on the first 10/25/50 md5-percent
# eval is ALWAYS the held-out >= 50% band


def _lc_oracle() -> str:
    """DuckDB replica: identical md5-percent banding, identical integer
    stump argmins per training fraction, identical held-out accuracy."""
    pred = (
        "CASE WHEN (cand.pol = 1 AND c.bin >= cand.t)"
        " OR (cand.pol = 0 AND c.bin < cand.t) THEN 1 ELSE 0 END"
    )
    frac_blocks = []
    for f in _LC_FRACTIONS:
        frac_blocks.append(f"""
    e{f} AS (
      SELECT cand.t, cand.pol,
             CAST(SUM(CASE WHEN c.pct < {f} AND {pred} <> c.y
                      THEN c.n ELSE 0 END) AS BIGINT) AS err
      FROM cells c CROSS JOIN cand
      GROUP BY 1, 2
    ), s{f} AS (
      SELECT t, pol FROM e{f} ORDER BY err, t, pol LIMIT 1
    ), a{f} AS (
      SELECT {f} AS train_pct, CAST(s.t AS INTEGER) AS threshold,
             CAST(s.pol AS INTEGER) AS polarity,
             CAST(SUM(CASE WHEN c.pct < {f} THEN c.n ELSE 0 END) AS BIGINT)
               AS n_train,
             CAST(SUM(CASE WHEN c.pct >= 50
                        AND (CASE WHEN (s.pol = 1 AND c.bin >= s.t)
                                    OR (s.pol = 0 AND c.bin < s.t)
                             THEN 1 ELSE 0 END) = c.y
                      THEN c.n ELSE 0 END) AS BIGINT) AS n_eval_correct,
             CAST(SUM(CASE WHEN c.pct >= 50 THEN c.n ELSE 0 END) AS BIGINT)
               AS n_eval
      FROM cells c CROSS JOIN s{f} s
      GROUP BY 2, 3
    )""")
    return f"""
    WITH cells AS (
      SELECT LEAST(15, GREATEST(0,
               CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 8) AS BIGINT) + 8))
               AS bin,
             label % 2 AS y,
             ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS pct,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY 1, 2, 3
    ), cand AS (
      SELECT t, pol
      FROM (SELECT unnest(generate_series(0, 15)) AS t) tt,
           (VALUES (0), (1)) pp(pol)
    ),{",".join(frac_blocks)}
    SELECT train_pct, threshold, polarity, n_train,
           ROUND(CAST(n_eval_correct AS DOUBLE) / n_eval, 6) AS eval_acc
    FROM (SELECT * FROM a10 UNION ALL SELECT * FROM a25
          UNION ALL SELECT * FROM a50)
    """


@query("ml_learning_curve", oracle=_lc_oracle())
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-efficiency (learning) curve for the decision stump:
    train on deterministic md5-percent prefixes of the corpus (10%,
    25%, 50%) and evaluate every model on the SAME held-out ≥50% band
    — the eval-rigor pattern that decides whether more data is worth
    buying. Like ml_kfold_cv, the whole curve costs ONE scan: the
    corpus reduces to (bin, label, md5-percent) integer cells, each
    training fraction's error table is a conditional SUM over those
    cells (train set = pct < f), and the held-out accuracy is another
    conditional SUM — no per-fraction rescans, no data movement
    between points on the curve.

    The md5-percent band is content-derived (engine- and
    partitioning-invariant), stump argmins compare exact BIGINT
    errors (tie-break err, t, pol), and the one float is the final
    accuracy division, written identically in both engines."""
    from .llmops.dedup import portable_hash

    emb = _t(spark, sf_dir, "embeddings")
    cells_df = emb.groupBy(
        F.least(
            F.lit(15),
            F.greatest(
                F.lit(0),
                (
                    F.floor(F.element_at("embedding", 1).cast("double") * 8)
                    + 8
                ).cast("long"),
            ),
        ).alias("bin"),
        (F.col("label") % 2).alias("y"),
        (portable_hash(F.col("vec_id").cast("string")) % 100).alias("pct"),
    ).agg(F.count("*").cast("long").alias("n"))
    # bounded by construction: ≤ 16 bins × 2 labels × 100 pct bands
    cells = [(r.bin, r.y, r.pct, r.n) for r in cells_df.collect()]

    def pred(t: int, pol: int, b: int) -> int:
        return 1 if ((pol == 1 and b >= t) or (pol == 0 and b < t)) else 0

    rows = []
    n_eval = sum(n for _, _, p, n in cells if p >= 50)
    for f in _LC_FRACTIONS:
        best = None
        for t in range(16):
            for pol in (0, 1):
                err = sum(
                    n
                    for b, y, p, n in cells
                    if p < f and pred(t, pol, b) != y
                )
                key = (err, t, pol)
                if best is None or key < best:
                    best = key
        _, t, pol = best
        n_train = sum(n for _, _, p, n in cells if p < f)
        corr = sum(
            n for b, y, p, n in cells if p >= 50 and pred(t, pol, b) == y
        )
        rows.append((f, t, pol, n_train, corr))
    out = spark.createDataFrame(
        rows,
        "train_pct int, threshold int, polarity int, n_train long, corr long",
    )
    return out.select(
        "train_pct",
        "threshold",
        "polarity",
        "n_train",
        F.round(F.col("corr").cast("double") / F.lit(n_eval), 6).alias(
            "eval_acc"
        ),
    )
