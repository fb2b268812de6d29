"""Round-5 suite additions, batch D: five new operator families.

- ``x_interval_coverage`` — per-user union-of-intervals coverage
  (merge overlapping/touching spans, total covered time + island
  count): the calendar/uptime primitive distinct from sessionization
  (gap-threshold grouping) and peak concurrency (sweep-line).
- ``x_fifo_allocation`` — FIFO lot matching via the prefix-sum
  interval-overlap formulation: receipts and issues each become
  half-open ranges on the cumulative-quantity axis and FIFO matching
  IS their interval intersection — a join, not a sequential loop.
- ``tx_dictionary_match`` — multi-phrase dictionary matching
  (brand-safety / blocklist counting) as a scan-stage n-gram build
  with a literal IN filter: no shuffle of document bodies.
- ``ss_mips_topk`` — exact maximum-inner-product top-k (the
  recommender objective), plus the norm-augmentation reduction to
  cosine pinned by test.
- ``ml_kfold_cv`` — 5-fold cross-validated decision stump: all five
  folds train/test in ONE plan from a shared (fold × bin) sufficient-
  statistics table (train stats = totals − held-out fold's stats).

Determinism discipline unchanged: integer sufficient statistics
across shuffles, md5-affine portable fold assignment, rounded doubles
only in final ratios, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .llmops.dedup import portable_hash
from .suite import _t, query

# ---------------------------------------------------------------------------
# x_interval_coverage — union-of-intervals length per user
# ---------------------------------------------------------------------------


@query(
    "x_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + (CAST(FLOOR(value) AS BIGINT) + 1) * 60000000
               AS e,
             event_id
      FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL
        AND value IS NOT NULL
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id
                    ORDER BY s, e, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR s > MAX(e) OVER (PARTITION BY user_id
                    ORDER BY s, e, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id
               ORDER BY s, e, new_island
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM marked
    ), per_island AS (
      SELECT user_id, island_id,
             MIN(s) AS s0, MAX(e) AS e1
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(e1 - s0) AS BIGINT) AS covered_us
    FROM per_island GROUP BY 1
    """,
)
def x_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union-of-intervals coverage: each view event opens a
    ``floor(value)+1``-minute interval; overlapping or touching
    intervals merge (gaps-and-islands), and the answer is each user's
    merged-island count and total covered microseconds — the uptime /
    watch-time / SLA-coverage primitive. Distinct from
    x_sessionization (gap THRESHOLD grouping of points) and
    x_peak_concurrency (sweep-line counting): this measures the
    MEASURE of the interval union.

    Islands form where the interval start exceeds the exclusive
    running MAX of previous ends — strictly greater, so touching
    intervals merge; the island id is the inclusive running count of
    those starts. Both windows partition by user (hash-distributed;
    per-user series are bounded), and every quantity is an exact
    BIGINT microsecond, so the island assignment and coverage sums are
    bit-identical across engines and partition counts. One shuffle on
    user_id; per-island and per-user rollups are map-side combinable.

    The tie order (s, e, event_id / s, e, new_island) is total within
    each user, making the running max and island numbering
    deterministic even with duplicate timestamps."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "view")
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    iv = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (
            F.unix_micros(F.col("ts"))
            + (F.floor(F.col("value")).cast("long") + 1) * 60_000_000
        ).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "new_island")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_cum).alias("island_id"),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    return per_island.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.col("e1") - F.col("s0")).cast("long").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# x_fifo_allocation — FIFO lot matching as a prefix-sum interval join
# ---------------------------------------------------------------------------


@query(
    "x_fifo_allocation",
    oracle="""
    WITH r AS (
      SELECT l_partkey AS part,
             CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               // CAST(ROUND(l_quantity) AS BIGINT) AS unit_c,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM lineitem WHERE l_linenumber % 2 = 1
    ), i AS (
      SELECT l_partkey AS part,
             CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM lineitem WHERE l_linenumber % 2 = 0
    ), m AS (
      SELECT r.part,
             CAST(SUM(LEAST(r.cum, i.cum)
                      - GREATEST(r.cum - r.q, i.cum - i.q)) AS BIGINT)
               AS matched_qty,
             CAST(SUM((LEAST(r.cum, i.cum)
                       - GREATEST(r.cum - r.q, i.cum - i.q))
                      * r.unit_c) AS BIGINT) AS alloc_cost_c
      FROM r JOIN i ON r.part = i.part
        AND r.cum > i.cum - i.q AND i.cum > r.cum - r.q
      GROUP BY 1
    ), s AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n_lots,
             CAST(SUM(q) AS BIGINT) AS supply_qty
      FROM r GROUP BY 1
    ), d AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n_issues,
             CAST(SUM(q) AS BIGINT) AS demand_qty
      FROM i GROUP BY 1
    )
    SELECT COALESCE(s.part, d.part) AS part,
           COALESCE(n_lots, 0) AS n_lots,
           COALESCE(supply_qty, 0) AS supply_qty,
           COALESCE(n_issues, 0) AS n_issues,
           COALESCE(demand_qty, 0) AS demand_qty,
           COALESCE(matched_qty, 0) AS matched_qty,
           COALESCE(alloc_cost_c, 0) AS alloc_cost_c
    FROM s FULL OUTER JOIN d ON s.part = d.part
    LEFT JOIN m ON COALESCE(s.part, d.part) = m.part
    """,
)
def x_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO inventory lot allocation, distributed: per part, odd
    line numbers are RECEIPTS (lots carrying an integer-cents unit
    cost) and even line numbers are ISSUES (consumption), each
    ship-date-ordered. FIFO says issue j consumes the oldest
    unconsumed supply — which is exactly the interval intersection of
    the two prefix-sum axes: lot i covers [cumR_{i-1}, cumR_i) of
    cumulative supply, issue j covers [cumI_{j-1}, cumI_j) of
    cumulative demand, and the matched quantity is the overlap of the
    two half-open ranges. The sequential "walk the lots" loop becomes
    a per-part equi-join with a range predicate — the formulation
    that distributes (accounting cost layers, tax-lot matching,
    storage-billing tiers all reduce to it).

    Exactness: quantities and unit costs are exact BIGINTs (integer
    division for unit cents — no rounding boundary), the prefix sums
    ride part-partitioned windows with a total tie order (shipdate,
    orderkey, linenumber), and the overlap formula
    ``LEAST(cumR,cumI) − GREATEST(cumR−q, cumI−q)`` is pure integer
    arithmetic. Scale: one shuffle on part for the windows, one
    co-partitioned self-join; per-part chain overlap is linear (each
    lot overlaps a contiguous run of issues), so candidate volume is
    O(lots + issues) per part, never quadratic."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity")).cast("long")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rec = (
        li.filter(F.col("l_linenumber") % 2 == 1)
        .select(
            F.col("l_partkey").alias("part"),
            q.alias("q"),
            F.expr(
                "CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
                "div CAST(ROUND(l_quantity) AS BIGINT)"
            ).alias("unit_c"),
            F.sum(q).over(w).cast("long").alias("cum"),
        )
    )
    iss = (
        li.filter(F.col("l_linenumber") % 2 == 0)
        .select(
            F.col("l_partkey").alias("part"),
            q.alias("q"),
            F.sum(q).over(w).cast("long").alias("cum"),
        )
    )
    r = rec.select(
        "part",
        F.col("q").alias("rq"),
        "unit_c",
        F.col("cum").alias("rcum"),
    )
    i = iss.select(
        "part", F.col("q").alias("iq"), F.col("cum").alias("icum")
    )
    overlap = F.least(F.col("rcum"), F.col("icum")) - F.greatest(
        F.col("rcum") - F.col("rq"), F.col("icum") - F.col("iq")
    )
    m = (
        r.join(
            i,
            (r.part == i.part)
            & (F.col("rcum") > F.col("icum") - F.col("iq"))
            & (F.col("icum") > F.col("rcum") - F.col("rq")),
        )
        .drop(i.part)
        .groupBy("part")
        .agg(
            F.sum(overlap).cast("long").alias("matched_qty"),
            F.sum(overlap * F.col("unit_c"))
            .cast("long")
            .alias("alloc_cost_c"),
        )
    )
    s = rec.groupBy("part").agg(
        F.count("*").cast("long").alias("n_lots"),
        F.sum("q").cast("long").alias("supply_qty"),
    )
    d = iss.groupBy("part").agg(
        F.count("*").cast("long").alias("n_issues"),
        F.sum("q").cast("long").alias("demand_qty"),
    )
    base = (
        s.join(d, "part", "full_outer")
        .join(m, "part", "left")
        .select(
            "part",
            F.coalesce("n_lots", F.lit(0)).alias("n_lots"),
            F.coalesce("supply_qty", F.lit(0)).alias("supply_qty"),
            F.coalesce("n_issues", F.lit(0)).alias("n_issues"),
            F.coalesce("demand_qty", F.lit(0)).alias("demand_qty"),
            F.coalesce("matched_qty", F.lit(0)).alias("matched_qty"),
            F.coalesce("alloc_cost_c", F.lit(0)).alias("alloc_cost_c"),
        )
    )
    return base


# ---------------------------------------------------------------------------
# tx_dictionary_match — multi-phrase dictionary matching
# ---------------------------------------------------------------------------

# Literal phrase dictionary (4 bigrams + 2 trigrams, all present at
# every shipped SF) — fixed constants like the LSH plane literals, so
# both engines filter on identical strings.
_DICT_PHRASES = [
    "table hash",
    "customer join",
    "vector small",
    "merge order",
    "slow hash batch",
    "stream table hash",
]


def _dict_oracle() -> str:
    phrases = ", ".join(f"'{p}'" for p in _DICT_PHRASES)
    return f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, UNNEST(
        [toks[i] || ' ' || toks[i+1]
         for i in generate_series(1, greatest(len(toks) - 1, 0))]
        || [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            for i in generate_series(1, greatest(len(toks) - 2, 0))]
      ) AS phrase
      FROM t
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM grams WHERE phrase IN ({phrases})
    GROUP BY 1
    """


@query("tx_dictionary_match", oracle=_dict_oracle())
def tx_dictionary_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-phrase dictionary matching — the blocklist / brand-safety
    / keyword-audit primitive: count occurrences and document reach of
    a fixed phrase dictionary (2- and 3-token phrases) across the
    corpus. The Aho-Corasick use case, re-expressed for a column
    engine: tokenize once, build the 2- and 3-gram streams as
    scan-stage higher-order functions (transform over sequence —
    whole-stage codegen, no Python), and filter with a literal IN
    before anything shuffles. Only (doc_id, phrase) survivors — a
    vanishing fraction of the corpus — reach the aggregation; document
    bodies never leave the scan stage.

    Grams and dictionary strings are identical on both engines (same
    trim/lower/whitespace-split recipe as the tx_* family), counts are
    pure integers. n_docs is a COUNT(DISTINCT) over the tiny survivor
    set. At 100 TB this is a scan-rate-bound pass with a 6-row
    result — the shape a trust-and-safety sweep wants."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = docs.select("doc_id", toks.alias("toks"))
    big = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("toks") - 1, F.lit(0))
        ),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i.cast("int")),
            F.element_at("toks", (i + 1).cast("int")),
        ),
    )
    tri = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("toks") - 2, F.lit(0))
        ),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i.cast("int")),
            F.element_at("toks", (i + 1).cast("int")),
            F.element_at("toks", (i + 2).cast("int")),
        ),
    )
    grams = d.select(
        "doc_id", F.explode(F.concat(big, tri)).alias("phrase")
    ).filter(F.col("phrase").isin(_DICT_PHRASES))
    return grams.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# ss_mips_topk — exact maximum-inner-product search
# ---------------------------------------------------------------------------

_MIPS_DOT = """
    list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
              for i in generate_series(1, len(q.embedding))])
"""


@query(
    "ss_mips_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_MIPS_DOT}, 6) AS dot
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN (0,1,2,3,4,5,6,7)
    ), ranked AS (
      SELECT query_id, neighbor_id, dot,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= 5
    """,
)
def ss_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maximum-inner-product top-5 for the 8 standard query
    vectors — the recommender-retrieval objective (user·item), which
    differs from ss_cosine_topk precisely where corpus norms vary
    (MIPS rewards long vectors; cosine ignores length). The shipped
    embeddings have near-uniform norms, so the two rankings happen to
    coincide HERE — the semantic gap is pinned in pytest on a
    norm-varying fixture where MIPS picks the long vector and cosine
    the aligned one.
    Execution matches cosine_topk: broadcast queries, Arrow-batched
    mapInPandas matmul, per-batch local top-k, global top-k over the
    |queries|·k intermediate; the corpus never shuffles. The
    norm-augmentation reduction (append sqrt(M²−‖x‖²); cosine in the
    augmented space ranks by inner product) is pinned equivalent in
    pytest — the trick that lets any angular ANN index serve MIPS."""
    from .llmops import similarity
    from .suite_llmops import _QUERY_IDS

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.mips_topk(emb, _QUERY_IDS, k=5)


# ---------------------------------------------------------------------------
# ml_kfold_cv — 5-fold cross-validated decision stump
# ---------------------------------------------------------------------------

_CV_FOLDS = 5


def _kfold_oracle() -> str:
    return f"""
    WITH rows_f AS (
      SELECT CAST(FLOOR(value) AS BIGINT) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             CAST((('0x' || substr(md5('cv|' || CAST(event_id AS VARCHAR)),
                    1, 15))::BIGINT % {_CV_FOLDS}) AS BIGINT) AS fold
      FROM events WHERE value IS NOT NULL
    ), fb AS (
      SELECT fold, bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM rows_f GROUP BY 1, 2
    ), tb AS (
      SELECT bin, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS p
      FROM fb GROUP BY 1
    ), folds AS (
      SELECT DISTINCT fold FROM fb
    ), train AS (
      SELECT folds.fold, tb.bin,
             tb.n - COALESCE(fb.n, 0) AS n,
             tb.p - COALESCE(fb.p, 0) AS p
      FROM folds JOIN tb ON TRUE
      LEFT JOIN fb ON fb.fold = folds.fold AND fb.bin = tb.bin
    ), cum AS (
      SELECT fold, bin,
             COALESCE(SUM(n) OVER (PARTITION BY fold ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ln,
             COALESCE(SUM(p) OVER (PARTITION BY fold ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lp,
             SUM(n) OVER (PARTITION BY fold) AS tn,
             SUM(p) OVER (PARTITION BY fold) AS tp
      FROM train
    ), gini AS (
      SELECT fold, bin AS threshold, ln, lp, tn, tp,
             ROUND((
               (ln - CAST(lp*lp + (ln-lp)*(ln-lp) AS DOUBLE) / ln)
               + ((tn-ln) - CAST((tp-lp)*(tp-lp)
                                 + ((tn-ln)-(tp-lp))*((tn-ln)-(tp-lp))
                            AS DOUBLE) / (tn-ln))
             ) / tn, 6) AS wg
      FROM cum WHERE ln > 0 AND tn - ln > 0
    ), best AS (
      SELECT fold, threshold, ln, lp, tn, tp, wg,
             ROW_NUMBER() OVER (PARTITION BY fold
                                ORDER BY wg ASC, threshold ASC) AS rk
      FROM gini
    ), chosen AS (
      SELECT fold, threshold,
             CASE WHEN 2 * lp > ln THEN 1 ELSE 0 END AS left_maj,
             CASE WHEN 2 * (tp - lp) > (tn - ln) THEN 1 ELSE 0 END
               AS right_maj,
             wg
      FROM best WHERE rk = 1
    )
    SELECT c.fold,
           CAST(c.threshold AS BIGINT) AS threshold,
           c.wg AS train_gini,
           CAST(COUNT(*) AS BIGINT) AS test_n,
           CAST(SUM(CASE WHEN (CASE WHEN r.bin < c.threshold
                                    THEN c.left_maj ELSE c.right_maj END)
                              = r.pos
                         THEN 1 ELSE 0 END) AS BIGINT) AS test_correct,
           ROUND(CAST(SUM(CASE WHEN (CASE WHEN r.bin < c.threshold
                                          THEN c.left_maj
                                          ELSE c.right_maj END) = r.pos
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS test_accuracy
    FROM chosen c JOIN rows_f r ON r.fold = c.fold
    GROUP BY 1, 2, 3
    """


@query("ml_kfold_cv", oracle=_kfold_oracle())
def ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated decision stump — the eval-rigor pattern
    (train on k−1 folds, test on the held-out fold, all folds at
    once) over the same Gini-split stump as ml_decision_stump. The
    whole CV runs in ONE distributed plan with NO per-fold rescans:
    the corpus aggregates once into a (fold × bin) sufficient-
    statistics table, each fold's TRAINING histogram is totals minus
    its own held-out cell (pure integer subtraction), the best split
    per fold comes from the same cumulative-Gini scan as the stump
    (rounded 6dp before the argmin so the cross-engine tie-break is
    exact), and held-out accuracy is a join of the five chosen stumps
    back to the binned rows. Fold assignment is the portable
    md5-affine hash of event_id — deterministic across engines,
    partitionings, and reruns.

    Scale: the only corpus-sized operations are the first binning
    aggregate and the final test join (a broadcast of 5 stump rows);
    everything between runs on the bin×fold table (domain-bounded).
    This is the shape a 100 TB model-selection sweep wants — k passes
    of a naive CV become 1."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    rows = ev.select(
        F.floor(F.col("value")).cast("long").alias("bin"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
        (
            portable_hash(
                F.concat_ws("|", F.lit("cv"), F.col("event_id"))
            )
            % _CV_FOLDS
        )
        .cast("long")
        .alias("fold"),
    )
    fb = rows.groupBy("fold", "bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    tb = fb.groupBy("bin").agg(
        F.sum("n").cast("long").alias("tn_b"),
        F.sum("p").cast("long").alias("tp_b"),
    )
    folds = fb.select("fold").distinct()
    train = (
        folds.crossJoin(F.broadcast(tb))
        .join(fb, ["fold", "bin"], "left")
        .select(
            "fold",
            "bin",
            (F.col("tn_b") - F.coalesce("n", F.lit(0))).alias("n"),
            (F.col("tp_b") - F.coalesce("p", F.lit(0))).alias("p"),
        )
    )
    w_prev = (
        Window.partitionBy("fold")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("fold")
    cum = train.select(
        "fold",
        "bin",
        F.coalesce(F.sum("n").over(w_prev), F.lit(0)).alias("ln"),
        F.coalesce(F.sum("p").over(w_prev), F.lit(0)).alias("lp"),
        F.sum("n").over(w_all).alias("tn"),
        F.sum("p").over(w_all).alias("tp"),
    )
    ln, lp = F.col("ln"), F.col("lp")
    tn, tp = F.col("tn"), F.col("tp")
    rn, rp = tn - ln, tp - lp
    wg = F.round(
        (
            (
                ln
                - (lp * lp + (ln - lp) * (ln - lp)).cast("double") / ln
            )
            + (
                rn
                - (rp * rp + (rn - rp) * (rn - rp)).cast("double") / rn
            )
        )
        / tn,
        6,
    )
    gini = cum.filter((ln > 0) & (tn - ln > 0)).select(
        "fold",
        F.col("bin").alias("threshold"),
        ln.alias("ln"),
        lp.alias("lp"),
        tn.alias("tn"),
        tp.alias("tp"),
        wg.alias("wg"),
    )
    w_best = Window.partitionBy("fold").orderBy(
        F.col("wg").asc(), F.col("threshold").asc()
    )
    chosen = (
        gini.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "fold",
            "threshold",
            F.when(2 * F.col("lp") > F.col("ln"), 1)
            .otherwise(0)
            .alias("left_maj"),
            F.when(
                2 * (F.col("tp") - F.col("lp"))
                > (F.col("tn") - F.col("ln")),
                1,
            )
            .otherwise(0)
            .alias("right_maj"),
            F.col("wg").alias("train_gini"),
        )
    )
    pred = F.when(
        F.col("bin") < F.col("threshold"), F.col("left_maj")
    ).otherwise(F.col("right_maj"))
    return (
        rows.join(F.broadcast(chosen), "fold")
        .groupBy("fold", "threshold", "train_gini")
        .agg(
            F.count("*").cast("long").alias("test_n"),
            F.sum((pred == F.col("pos")).cast("long"))
            .cast("long")
            .alias("test_correct"),
            F.round(
                F.sum((pred == F.col("pos")).cast("long")).cast("double")
                / F.count("*"),
                6,
            ).alias("test_accuracy"),
        )
        .select(
            "fold",
            F.col("threshold").cast("long").alias("threshold"),
            "train_gini",
            "test_n",
            "test_correct",
            "test_accuracy",
        )
    )
