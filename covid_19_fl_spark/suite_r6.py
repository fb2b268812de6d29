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

from .confs import ensure_session_defaults
from .suite import _t, query

_TOP_M = 3




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
    twin of ``dd_jaccard_prefix_join``: each document ships only its
    m=3 strongest partners (rounded-jaccard desc, partner id asc), so
    the result is ≤ m·n rows on ANY corpus.

    CLASS-COLLAPSED plan: documents with identical text form an
    equivalence class (4992 classes for 500k docs on the 100×
    replica corpus). Within a class every pair has Jaccard exactly
    1.0 — identical shingle sets; the corpus guarantees ≥ 3 tokens so
    sets are never empty — and a doc's top partners at 1.0 are just
    the class's m smallest other ids, read off one sorted member
    list. ACROSS classes, Jaccard is a function of the two texts
    alone, so the lossless prefix-filter join
    (``dedup.jaccard_prefix_pairs`` — prefix filtering is lossless
    under ANY consistent shingle ordering, so representative-corpus
    frequencies are fine) runs on ONE representative per class, and
    each class's cross-class top-m expands back to members by a
    linear join. Candidate work is now quadratic only in DISTINCT
    texts — the 10× replica corpus that made the naive capped plan
    enumerate ~950× more pairs leaves the class graph unchanged.
    This is the production shape: exact-dedup first, fuzzy-join the
    survivors, broadcast the verdicts back to replicas.

    The oracle replays the naive all-pairs join plus the same
    per-doc rank window, so the hash match proves the class
    decomposition, the lossless candidates, AND the cap semantics."""
    from .llmops import dedup

    m = _TOP_M
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cls = (
        docs.groupBy("text")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, m + 1
            ).alias("top_ids")
        )
        .withColumn("rep_id", F.element_at("top_ids", 1))
    )
    reps = cls.select(F.col("rep_id").alias("doc_id"), "text")
    cpairs = dedup.jaccard_prefix_pairs(reps, "text", "doc_id", 60, 3)
    adj = cpairs.select(
        F.col("id_a").alias("ca"), F.col("id_b").alias("cb"), "jaccard"
    ).unionByName(
        cpairs.select(
            F.col("id_b").alias("ca"), F.col("id_a").alias("cb"), "jaccard"
        )
    )
    # class-level cross-class candidates: each adjacent class
    # contributes only its m smallest members, then one rank window
    # over the CLASS graph (≤ m·deg rows per class) keeps the m best.
    extc = adj.join(
        cls.select(
            F.col("rep_id").alias("cb"),
            F.slice("top_ids", 1, m).alias("top_b"),
        ),
        "cb",
    ).select("ca", F.explode("top_b").alias("partner_id"), "jaccard")
    we = Window.partitionBy("ca").orderBy(
        F.col("jaccard").desc(), F.col("partner_id").asc()
    )
    ext = (
        extc.withColumn("r", F.row_number().over(we))
        .filter(F.col("r") <= m)
        .select("ca", "partner_id", "jaccard")
    )
    d = docs.join(cls, "text").select("doc_id", "top_ids", "rep_id")
    within = d.select(
        "doc_id",
        F.explode(
            F.slice(
                F.filter("top_ids", lambda x: x != F.col("doc_id")), 1, m
            )
        ).alias("partner_id"),
        F.lit(1.0).alias("jaccard"),
    )
    cross = d.select("doc_id", F.col("rep_id").alias("ca")).join(
        ext, "ca"
    ).select("doc_id", "partner_id", "jaccard")
    cand = within.unionByName(cross)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("partner_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= m)
        .select("doc_id", "partner_id", "jaccard", "rk")
    )


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
    production twin of ``dd_edit_distance_join``: each document
    reports only its m=3 closest partners (ed asc, partner id asc),
    bounding output at m·n rows.

    CLASS-COLLAPSED plan: documents sharing the same 24-char prefix
    form an equivalence class (ed = 0 exactly within it, 4751
    classes for 500k docs on the 100× replica corpus), so a doc's
    ed-0 partners are the class's m smallest other ids, read off one
    sorted member list. The SymSpell deletion-neighborhood equi-join
    (``dedup.edit_distance_pairs``, lossless for k=1) runs on ONE
    representative per DISTINCT prefix — every cross-class qualifying
    pair has ed exactly 1 — and each class's ed-1 partner pool is the
    m smallest ids across its adjacent classes' m-smallest lists
    (the true m smallest of a union are each within their own class's
    m smallest). A final per-doc rank window then merges ≤ 2m
    candidates per document. Candidate work is quadratic only in
    DISTINCT prefixes: the replica corpus that blew the naive capped
    plan past the per-row gate (3.1× at 10× rows — every replica
    matched every replica before the window could cap) leaves the
    class graph unchanged. The oracle replays the naive levenshtein
    all-pairs plus the same window, proving the decomposition."""
    from .llmops.dedup import edit_distance_pairs

    m = _TOP_M
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _ED_PFX).alias("pfx")
    )
    cls = (
        docs.groupBy("pfx")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, m + 1
            ).alias("top_ids")
        )
        .withColumn("rep_id", F.element_at("top_ids", 1))
    )
    reps = cls.select(F.col("rep_id").alias("doc_id"), "pfx")
    cpairs = edit_distance_pairs(reps, "pfx", "doc_id")
    adj = cpairs.select(
        F.col("id_a").alias("ca"), F.col("id_b").alias("cb")
    ).unionByName(
        cpairs.select(F.col("id_b").alias("ca"), F.col("id_a").alias("cb"))
    )
    ext = (
        adj.join(
            cls.select(
                F.col("rep_id").alias("cb"),
                F.slice("top_ids", 1, m).alias("top_b"),
            ),
            "cb",
        )
        .groupBy("ca")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("top_b"))), 1, m
            ).alias("ext_ids")
        )
    )
    d = (
        docs.join(cls, "pfx")
        .select("doc_id", "top_ids", F.col("rep_id").alias("ca"))
        .join(ext, "ca", "left")
    )
    cand_arr = F.concat(
        F.transform(
            F.slice(
                F.filter("top_ids", lambda x: x != F.col("doc_id")), 1, m
            ),
            lambda x: F.struct(
                x.alias("partner_id"), F.lit(0).cast("long").alias("ed")
            ),
        ),
        F.transform(
            F.coalesce("ext_ids", F.array().cast("array<long>")),
            lambda x: F.struct(
                x.alias("partner_id"), F.lit(1).cast("long").alias("ed")
            ),
        ),
    )
    cand = d.select(
        "doc_id", F.explode(cand_arr).alias("c")
    ).select("doc_id", "c.partner_id", "c.ed")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("ed").asc(), F.col("partner_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= m)
        .select("doc_id", "partner_id", "ed", "rk")
    )


# ---------------------------------------------------------------------------
# Link prediction: common neighbors + resource allocation
# ---------------------------------------------------------------------------


@query(
    "x_link_prediction",
    oracle="""
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
    )
    SELECT u, w, cn, ra, rk FROM (
      SELECT u, w, cn, ra,
             CAST(ROW_NUMBER() OVER (
               ORDER BY ra DESC, cn DESC, u ASC, w ASC) AS BIGINT) AS rk
      FROM scores
    ) WHERE rk <= 50
    """,
)
def x_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the parts-bought-together graph
    (x_triangle_count's edge set): for every NON-adjacent pair with at
    least one common neighbor, the common-neighbor count and the
    resource-allocation index RA = Σ_z 1/deg(z) — the classic
    recommender primitives (Zhou et al. RA beats Adamic-Adar's
    1/log deg, and stays exactly cross-engine: no transcendental).

    Plan shape (round 11): wedge pairs come from the codegen'd
    adj⋈adj equi-join (AQE can skew-split its partitions; the
    round-10 neighbor-array generate could not be split and measured
    slower), the center degree is attached to the 2|E|-row adjacency
    BEFORE the wedge join instead of a wedge-sized join after it, and
    the adjacency anti-join probes the (u, w) AGGREGATE rather than
    the raw wedge stream (operators/graph.ra_link_scores — full
    accounting in its docstring). RA still folds each
    pair's SORTED degree list sequentially — the order-pinned
    summation both engines replay bit-for-bit before the 6dp round.
    Output is the global top-50 by (RA, CN) via
    TakeOrderedAndProject — at 100 TB you'd cap per-u instead
    (doc-partitioned rank, dd_jaccard_topm_join's shape).
    """
    from .operators.graph import ra_link_scores

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
        # feeds two subtrees (adjacency + the anti probe)
        .cache()
    )
    scores = ra_link_scores(edges)
    top = scores.orderBy(
        F.col("ra").desc(), F.col("cn").desc(), F.col("u").asc(), F.col("w").asc()
    ).limit(50)
    wr = Window.orderBy(
        F.col("ra").desc(), F.col("cn").desc(), F.col("u").asc(), F.col("w").asc()
    )
    return top.withColumn("rk", F.row_number().over(wr).cast("long"))


# ---------------------------------------------------------------------------
# MMR diversity re-ranking over the retrieval top-k
# ---------------------------------------------------------------------------

_MMR_QID = 0       # the query vector (same id family as ss_cosine_topk)
_MMR_NCAND = 12    # relevance-ranked candidate pool
_MMR_K = 5         # diversified results to emit
_MMR_LAMBDA = 0.7  # relevance weight; 0.3 = diversity weight


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB: the k-step argmax chain becomes
    k static CTEs (s1..sk), each picking the highest
    ``0.7·rel − 0.3·max_pair_sim_to_selected`` among the unpicked
    candidates. Every float that feeds a comparison is the SAME
    6dp-rounded double on both engines (cosines round before the
    greedy), and the score expression uses literal 0.7/0.3 with
    identical operation order, so the argmax chain is bit-identical;
    the emitted score goes through the shared FLOOR half-up ladder."""
    from .suite_llmops import _cos_expr

    cos_qc = _cos_expr("q.qv", "c.embedding")
    cos_ab = _cos_expr("a.embedding", "b.embedding")
    sql = f"""
    WITH q AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = {_MMR_QID}
    ), cand AS (
      SELECT cid, rel FROM (
        SELECT c.vec_id AS cid, ROUND({cos_qc}, 6) AS rel
        FROM embeddings c, q WHERE c.vec_id <> {_MMR_QID}
      ) ORDER BY rel DESC, cid ASC LIMIT {_MMR_NCAND}
    ), ce AS (
      SELECT c.cid, e.embedding FROM cand c
      JOIN embeddings e ON e.vec_id = c.cid
    ), pairs AS (
      SELECT a.cid AS ca, b.cid AS cb, ROUND({cos_ab}, 6) AS ps
      FROM ce a JOIN ce b ON a.cid <> b.cid
    ),
    s1 AS (
      SELECT cid, rel, rel AS score FROM cand
      ORDER BY rel DESC, cid ASC LIMIT 1
    )"""
    for i in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT cid FROM s{j}" for j in range(1, i)
        )
        sql += f""",
    sel{i} AS ({prev}),
    s{i} AS (
      SELECT c.cid, c.rel,
             {_MMR_LAMBDA} * c.rel - {1 - _MMR_LAMBDA:.1f} * MAX(p.ps) AS score
      FROM cand c
      JOIN pairs p ON p.ca = c.cid AND p.cb IN (SELECT cid FROM sel{i})
      WHERE c.cid NOT IN (SELECT cid FROM sel{i})
      GROUP BY c.cid, c.rel
      ORDER BY score DESC, c.cid ASC LIMIT 1
    )"""
    branches = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, cid AS vec_id, rel AS relevance, "
        f"FLOOR(score * 1000000 + 0.5) / 1000000 AS mmr_score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return sql + "\n    " + branches


@query("ss_mmr_rerank", oracle=_mmr_oracle())
def ss_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein):
    retrieve a relevance-ranked candidate pool, then greedily pick k
    results maximizing ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` — the
    standard diversity pass between ANN retrieval and a RAG context
    window, which plain top-k (ss_cosine_topk) lacks: near-duplicate
    hits crowd out coverage.

    Execution: the candidate pool comes from the distributed
    brute-force scorer (``similarity.cosine_topk`` — corpus never
    shuffles, local top-k per Arrow batch), and the pool's pairwise
    cosines run as a broadcast self-join of the |pool|=12-row subset
    with sequential-fold dots. Only the greedy itself — O(k·|pool|)
    comparisons over ≤ 12 relevances + 132 pair sims, all
    6dp-rounded — runs at the driver, the same bounded
    planning-time-scalar pattern as the suite's other ≤32-row
    sufficient-statistics collects. At 100 TB the pool is still k·20
    rows per query; the greedy cost never grows with the corpus."""
    from .llmops import similarity

    emb = _t(spark, sf_dir, "embeddings")
    cand = similarity.cosine_topk(emb, [_MMR_QID], k=_MMR_NCAND)
    rel = {
        int(r["neighbor_id"]): float(r["cos_sim"]) for r in cand.collect()
    }
    ids = sorted(rel)
    sub = emb.filter(F.col("vec_id").isin(ids)).select("vec_id", "embedding")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, v: p.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a, b = sub.alias("a"), sub.alias("b")
    ea, eb = F.col("a.embedding"), F.col("b.embedding")
    pair_df = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ca"),
            F.col("b.vec_id").alias("cb"),
            F.round(
                dot(ea, eb) / (F.sqrt(dot(ea, ea)) * F.sqrt(dot(eb, eb))), 6
            ).alias("ps"),
        )
    )
    ps: dict = {}
    for r in pair_df.collect():
        ps[(int(r["ca"]), int(r["cb"]))] = float(r["ps"])
        ps[(int(r["cb"]), int(r["ca"]))] = float(r["ps"])

    import math

    selected: list[int] = []
    rows: list[tuple] = []
    for step in range(1, _MMR_K + 1):
        best_cid, best_score = None, None
        for cid in ids:
            if cid in selected:
                continue
            if step == 1:
                score = rel[cid]
            else:
                mx = max(ps[(cid, s)] for s in selected)
                score = _MMR_LAMBDA * rel[cid] - (1 - _MMR_LAMBDA) * mx
            if (
                best_score is None
                or score > best_score
                or (score == best_score and cid < best_cid)
            ):
                best_cid, best_score = cid, score
        selected.append(best_cid)
        rows.append(
            (
                step,
                best_cid,
                rel[best_cid],
                math.floor(best_score * 1000000 + 0.5) / 1000000,
            )
        )
    return spark.createDataFrame(
        rows, "rank long, vec_id long, relevance double, mmr_score double"
    )


# ---------------------------------------------------------------------------
# Gini feature importance (multi-feature decision-stump sweep)
# ---------------------------------------------------------------------------

@query(
    "ml_gini_importance",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(FLOOR(value) AS BIGINT) AS f_val,
             CAST(hour(ts) AS BIGINT) AS f_hour,
             CAST(dayofweek(ts) AS BIGINT) AS f_dow,
             CAST(user_id % 10 AS BIGINT) AS f_user
      FROM events WHERE value IS NOT NULL
    ), longf AS (
      SELECT 'val_bin' AS feature, f_val AS bin, y FROM base
      UNION ALL SELECT 'hour', f_hour, y FROM base
      UNION ALL SELECT 'dow', f_dow, y FROM base
      UNION ALL SELECT 'user_mod', f_user, y FROM base
    ), bins AS (
      SELECT feature, bin, COUNT(*) AS n, SUM(y) AS pos
      FROM longf GROUP BY 1, 2
    ), tot AS (
      SELECT feature, CAST(SUM(n) AS BIGINT) AS tn,
             CAST(SUM(pos) AS BIGINT) AS tp
      FROM bins GROUP BY 1
    ), cum AS (
      SELECT feature, bin,
             COALESCE(SUM(n) OVER (PARTITION BY feature ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ln,
             COALESCE(SUM(pos) OVER (PARTITION BY feature ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lp
      FROM bins
    ), gini AS (
      SELECT c.feature, c.bin AS threshold,
             CAST(c.ln AS BIGINT) AS left_n,
             CAST(t.tn - c.ln AS BIGINT) AS right_n,
             ((c.ln - CAST(c.lp*c.lp + (c.ln-c.lp)*(c.ln-c.lp) AS DOUBLE)
               / c.ln)
              + ((t.tn-c.ln)
                 - CAST((t.tp-c.lp)*(t.tp-c.lp)
                        + ((t.tn-c.ln)-(t.tp-c.lp))
                          * ((t.tn-c.ln)-(t.tp-c.lp)) AS DOUBLE)
                   / (t.tn-c.ln))) / t.tn AS wg,
             (t.tn - CAST(t.tp*t.tp + (t.tn-t.tp)*(t.tn-t.tp) AS DOUBLE)
              / t.tn) / t.tn AS rg
      FROM cum c JOIN tot t ON t.feature = c.feature
      WHERE c.ln > 0 AND t.tn - c.ln > 0
    ), best AS (
      SELECT feature, threshold, left_n, right_n,
             ROUND(wg, 6) AS weighted_gini,
             ROUND(rg - wg, 6) AS importance,
             ROW_NUMBER() OVER (PARTITION BY feature
                                ORDER BY wg ASC, threshold ASC) AS brk
      FROM gini
    )
    SELECT feature, threshold, left_n, right_n, weighted_gini, importance,
           CAST(ROW_NUMBER() OVER (
             ORDER BY importance DESC, feature ASC) AS BIGINT) AS rk
    FROM best WHERE brk = 1
    """,
)
def ml_gini_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini feature importance: ``ml_decision_stump``'s exact
    histogram-split search swept across FOUR candidate features
    (integer-binned value, hour-of-day, day-of-week, a user-id hash
    bucket), ranking features by impurity decrease vs the root — the
    feature-selection read-out every tree ensemble reports, computed
    exactly.

    Plan shape: one stack() explode to long form (4× rows, one
    map-combined shuffle into per-feature bins), per-feature prefix
    windows over the |bins|-row aggregates for every threshold's
    left/right class counts, and the same all-integer Gini algebra as
    the stump (one double division per side, identical on both
    engines). dayofweek is normalized to DuckDB's 0-based form
    (x_dow_seasonality's recipe); hour() agrees natively under the
    UTC session. Importance = root Gini − best split Gini, rounded
    once after the subtraction."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    longf = ev.select(
        (F.col("event_type") == "purchase").cast("long").alias("y"),
        F.expr(
            "stack(4, "
            "'val_bin', CAST(FLOOR(value) AS BIGINT), "
            "'hour',    CAST(hour(ts) AS BIGINT), "
            "'dow',     CAST(dayofweek(ts) - 1 AS BIGINT), "
            "'user_mod', CAST(user_id % 10 AS BIGINT)) AS (feature, bin)"
        ),
    )
    bins = longf.groupBy("feature", "bin").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    tot = bins.groupBy("feature").agg(
        F.sum("n").alias("tn"), F.sum("pos").alias("tp")
    )
    wpre = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = bins.select(
        "feature",
        "bin",
        F.coalesce(F.sum("n").over(wpre), F.lit(0)).alias("ln"),
        F.coalesce(F.sum("pos").over(wpre), F.lit(0)).alias("lp"),
    )
    ln, lp = F.col("ln"), F.col("lp")
    tn, tp = F.col("tn"), F.col("tp")
    rn, rp = tn - ln, tp - lp
    wg = (
        (ln - (lp * lp + (ln - lp) * (ln - lp)).cast("double") / ln)
        + (rn - (rp * rp + (rn - rp) * (rn - rp)).cast("double") / rn)
    ) / tn
    rg = (tn - (tp * tp + (tn - tp) * (tn - tp)).cast("double") / tn) / tn
    gini = (
        cum.join(tot, "feature")
        .filter((ln > 0) & (tn - ln > 0))
        .select(
            "feature",
            F.col("bin").alias("threshold"),
            ln.alias("left_n"),
            (tn - ln).alias("right_n"),
            wg.alias("wg"),
            rg.alias("rg"),
        )
    )
    wbest = Window.partitionBy("feature").orderBy(
        F.col("wg").asc(), F.col("threshold").asc()
    )
    best = (
        gini.withColumn("brk", F.row_number().over(wbest))
        .filter(F.col("brk") == 1)
        .select(
            "feature",
            "threshold",
            "left_n",
            "right_n",
            F.round("wg", 6).alias("weighted_gini"),
            F.round(F.col("rg") - F.col("wg"), 6).alias("importance"),
        )
    )
    wr = Window.orderBy(F.col("importance").desc(), F.col("feature").asc())
    return best.withColumn("rk", F.row_number().over(wr).cast("long"))


# ---------------------------------------------------------------------------
# Streaming: stream-static broadcast enrichment join
# ---------------------------------------------------------------------------


@query(
    "st_stream_static_enrich",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
    FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
    GROUP BY 1
    """,
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join under the exactness gate — the
    ONE streaming join shape the st_ suite didn't cover: a micro-batch
    stream joined to a bounded BATCH dimension (here the nation table
    keyed by a user-id hash), Spark's idiomatic slowly-changing-dim
    enrichment (no watermark needed — the static side is re-resolved
    per micro-batch and never holds join state).

    The enriched stream rolls up per dimension attribute in complete
    mode (|nation| = 25 keyed states, bounded) with a replay- and
    order-independent DECIMAL sum, drained by availableNow — so the
    final sink state equals the batch join+aggregate the oracle
    spells. At 100 TB the same plan runs against Kafka with the dim
    in a Delta/parquet snapshot: the static side broadcasts per
    micro-batch, the aggregate state stays |dim|-bounded."""
    import uuid as _uuid

    from .suite_r4 import _stage_stream_dir, _stream_shuffle_partitions

    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ensure_session_defaults(spark)
    # ts is unused here, but the schema read must survive both parquet
    # physical types the corpus has shipped (nanos long / micros).
    ensure_session_defaults(spark)
    stage = _stage_stream_dir(sf_dir, "events")
    src = spark.readStream.schema(spark.read.parquet(stage).schema).parquet(stage)
    enriched = src.withColumn(
        "nk", F.pmod(F.col("user_id"), F.lit(25)).cast("int")
    ).join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
    agg = enriched.groupBy("n_name").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,4)")).alias("tv"),
    )
    sink = f"st_enrich_{_uuid.uuid4().hex[:8]}"
    with _stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(120):
                raise TimeoutError(
                    "st_stream_static_enrich: availableNow drain did not "
                    "finish within 120s"
                )
        finally:
            q.stop()
    return spark.table(sink).select(
        "n_name", "n_events", F.col("tv").cast("double").alias("total_value")
    )


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training (first k merges, exact)
# ---------------------------------------------------------------------------

_BPE_K = 6


def _bpe_oracle(k: int) -> str:
    """DuckDB twin of llmops.text.bpe_learn: k unrolled merge rounds.

    The greedy leftmost non-overlapping merge is expressed per round as
    gaps-and-islands over exploded symbol positions — positions whose
    (sym, next_sym) equals the round's winning pair form runs; within a
    run exactly the even offsets merge (leftmost-first, a merged token
    never immediately re-merges); position i+1 of a selected i is
    consumed. Same tie-break as the Spark plan: count DESC, pair ASC.

    Every multiply-referenced CTE is MATERIALIZED — DuckDB would
    otherwise inline seq{r}/sel{r} at each reference and re-evaluate
    the whole round chain exponentially (2^k blowup measured).
    """
    sql = """
    WITH words AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    seq0 AS MATERIALIZED (
      SELECT w AS wk, c,
             list_append(
               [substr(w, i, 1) for i in generate_series(1, length(w))],
               '</w>') AS seq
      FROM words
    )"""
    for r in range(1, k + 1):
        p = r - 1
        sql += f""",
    pc{r} AS MATERIALIZED (
      SELECT p['a'] AS a, p['b'] AS b, CAST(SUM(c) AS BIGINT) AS cnt FROM (
        SELECT c, unnest([{{'a': seq[i], 'b': seq[i+1]}}
                          for i in generate_series(1, len(seq) - 1)]) AS p
        FROM seq{p}
      ) GROUP BY 1, 2
    ),
    top{r} AS MATERIALIZED (SELECT a, b, cnt FROM pc{r}
               ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
    ex{r} AS MATERIALIZED (
      SELECT wk, c, seq, len(seq) AS n,
             unnest(generate_series(1, len(seq))) AS i
      FROM seq{p}
    ),
    mm{r} AS MATERIALIZED (
      SELECT e.wk, e.i,
             e.i - ROW_NUMBER() OVER (PARTITION BY e.wk ORDER BY e.i) AS run
      FROM ex{r} e CROSS JOIN top{r} t
      WHERE e.i < e.n AND e.seq[e.i] = t.a AND e.seq[e.i + 1] = t.b
    ),
    sel{r} AS MATERIALIZED (
      SELECT wk, i FROM (
        SELECT wk, i, MIN(i) OVER (PARTITION BY wk, run) AS rs FROM mm{r}
      ) WHERE (i - rs) % 2 = 0
    ),
    seq{r} AS MATERIALIZED (
      SELECT e.wk, ANY_VALUE(e.c) AS c,
             list(CASE WHEN si.i IS NOT NULL THEN t.a || t.b
                       ELSE e.seq[e.i] END ORDER BY e.i)
               FILTER (WHERE sp.i IS NULL) AS seq
      FROM ex{r} e
      CROSS JOIN top{r} t
      LEFT JOIN sel{r} si ON si.wk = e.wk AND si.i = e.i
      LEFT JOIN sel{r} sp ON sp.wk = e.wk AND sp.i = e.i - 1
      GROUP BY e.wk
    )"""
    branches = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS left_sym, "
        f"b AS right_sym, a || b AS merged, cnt AS pair_count FROM top{r}"
        for r in range(1, k + 1)
    )
    return sql + "\n    " + branches


def _bpe_encode_oracle(k: int) -> str:
    """DuckDB twin of tx_bpe_encode: reuse _bpe_oracle's k unrolled
    rounds up to the final per-word sequences (seq{k}), then score the
    corpus — per source, document count, whitespace token total, BPE
    token total under the learned merges, and the compression ratio."""
    head, _, _ = _bpe_oracle(k).rpartition("\n    SELECT CAST(1")
    return (
        head
        + f""",
    wmap AS MATERIALIZED (
      SELECT wk, CAST(len(seq) AS BIGINT) AS toks FROM seq{k}
    ),
    corpus AS (
      SELECT source, w, COUNT(*) AS c FROM (
        SELECT source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY 1, 2
    ),
    perdoc AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
    )
    SELECT c.source,
           ANY_VALUE(p.n_docs) AS n_docs,
           CAST(SUM(c.c) AS BIGINT) AS ws_tokens,
           CAST(SUM(c.c * m.toks) AS BIGINT) AS bpe_tokens,
           ROUND(CAST(SUM(c.c * m.toks) AS DOUBLE) / SUM(c.c), 6)
             AS tokens_per_word
    FROM corpus c
    JOIN wmap m ON m.wk = c.w
    JOIN perdoc p ON p.source = c.source
    GROUP BY c.source
    """
    )


@query("tx_bpe_merges", oracle=_bpe_oracle(_BPE_K))
def tx_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training — the first 6 merge
    operations of a byte-pair-encoding vocabulary (Sennrich et al.
    2016), learned exactly over the documents corpus. The op the tx_
    family lacked: tx_token_stats COUNTS tokens under a fixed
    tokenizer; this LEARNS the tokenizer.

    Scale shape (llmops/text.py bpe_learn): the corpus is read once
    into a word-frequency vocabulary (one map-combined shuffle); all k
    rounds run on the bounded vocab — per round one adjacent-pair
    explode + sum keyed by (a, b), a TakeOrdered(1) winner, a 1-row
    broadcast, and a zero-shuffle JVM fold (bpe_merge_once) applying
    the greedy leftmost non-overlapping rewrite. localCheckpoint
    truncates lineage so the k-branch union never recomputes earlier
    rounds. At 100 TB the corpus crosses the wire once; rounds cost
    O(|vocab|) each.

    Reference tie-in: the reference tokenizes nothing (its text
    columns are county names, cv-county-stats.py:49-52); this is the
    training-data-pipeline generalization the brief's §text-analysis
    row asks for ("token counting (whitespace + a BPE-ish regex)")."""
    from .llmops import text as T

    docs = _t(spark, sf_dir, "documents")
    return T.bpe_learn(docs, "text", _BPE_K)


@query("tx_bpe_encode", oracle=_bpe_encode_oracle(_BPE_K))
def tx_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE tokenizer (tx_bpe_merges' 6 merges) to the
    corpus and report per-source compression — document count,
    whitespace-token total, BPE-token total, tokens-per-word. The
    "apply" half of tokenizer training: learn picks the merges, encode
    is what every downstream token-budget op (sp_token_budget_sample,
    sp_pack_sequences) consumes.

    Scale shape: the 6 learned merge pairs are a bounded planning-time
    collect (6 rows — the suite's ≤32-row sufficient-statistics
    pattern). Encoding never touches documents twice: one explode into
    (source, word) counts, a DISTINCT-word table folds the 6 merges as
    chained zero-shuffle bpe_merge_once rewrites (vocabulary-sized,
    corpus-independent), and a broadcast join maps word → token count
    back onto the grouped corpus. At 100 TB: corpus crosses the wire
    once, the merge fold costs O(|vocab|), and the word→toks map stays
    broadcast-able (~10M distinct words × 12 bytes)."""
    from .llmops import text as T

    docs = _t(spark, sf_dir, "documents")
    merges = sorted(
        (
            (int(r["merge_rank"]), r["left_sym"], r["right_sym"])
            for r in T.bpe_learn(docs, "text", _BPE_K).collect()
        )
    )
    corpus = (
        docs.select(
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    vocab = corpus.select("w").distinct().withColumn(
        "seq",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ),
            F.array(F.lit("</w>")),
        ),
    )
    for _, a, b in merges:
        vocab = vocab.withColumn(
            "seq", T.bpe_merge_once(F.col("seq"), F.lit(a), F.lit(b))
        )
    wmap = vocab.select("w", F.size("seq").cast("long").alias("toks"))
    perdoc = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        corpus.join(F.broadcast(wmap), "w")
        .groupBy("source")
        .agg(
            F.sum("c").alias("ws_tokens"),
            F.sum(F.col("c") * F.col("toks")).alias("bpe_tokens"),
            F.round(
                F.sum(F.col("c") * F.col("toks"))
                / F.sum("c").cast("double"),
                6,
            ).alias("tokens_per_word"),
        )
        .join(F.broadcast(perdoc), "source")
        .select(
            "source", "n_docs", "ws_tokens", "bpe_tokens", "tokens_per_word"
        )
    )
