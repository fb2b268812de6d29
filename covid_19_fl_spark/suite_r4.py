"""Round-4 suite additions.

Promotes more non-batch surfaces into the exact-oracle gate:

- ``st_cusum_drift`` — the streaming stateful CUSUM monitor
  (``streaming/stateful.cusum_monitor``, applyInPandasWithState)
  drained with an availableNow trigger and hash-checked against a
  closed-form batch oracle: the one-sided CUSUM recursion
  ``s_i = max(0, s_{i-1} + d_i)`` has the prefix-sum identity
  ``s_i = P_i − min(0, min_{j≤i} P_j)``, so the whole per-key fold is
  two running-sum/running-min windows in ANSI SQL — no recursion
  needed. All arithmetic is integer micro-units, so the streaming
  state store and the oracle agree bit-for-bit.

Every query keeps the suite's determinism discipline: integer/DECIMAL
accumulation across shuffles, doubles only in final rounded ratios.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llmops import similarity
from .streaming import stateful
from .suite import _t, query

# CUSUM parameters (micro-units are applied inside cusum_monitor):
# target/slack/threshold chosen against the events.value domain
# (0..490, heavy-tailed) so both one-sided statistics and the alarm
# excursion counter exercise non-trivially at sf0.01.
_CUSUM_TARGET = 120.0
_CUSUM_SLACK = 10.0
_CUSUM_THRESHOLD = 5000.0


def _stage_stream_dir(sf_dir: str, table: str) -> str:
    """File streaming sources need a DIRECTORY; the corpus ships
    read-only single files — stage a symlink dir under /tmp (no data
    copy, corpus untouched)."""
    stage = os.path.join(
        "/tmp/covid_19_fl_spark-stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, f"{table}.parquet"), link)
    return stage


@query(
    "st_cusum_drift",
    oracle=f"""
    WITH q AS (
      SELECT event_type AS key, event_id,
             CAST(FLOOR(CAST(value AS DOUBLE)) AS BIGINT) * 1000000 AS v_u
      FROM events
    ), p AS (
      SELECT key, event_id,
             SUM(v_u - {int(_CUSUM_TARGET * 1_000_000)}
                     - {int(_CUSUM_SLACK * 1_000_000)}) OVER w AS pu,
             SUM({int(_CUSUM_TARGET * 1_000_000)} - v_u
                     - {int(_CUSUM_SLACK * 1_000_000)}) OVER w AS pd_,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY event_id) AS rn,
             COUNT(*) OVER (PARTITION BY key) AS n
      FROM q
      WINDOW w AS (PARTITION BY key ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT key, rn, n,
             pu - LEAST(0, MIN(pu) OVER w3) AS s_up,
             pd_ - LEAST(0, MIN(pd_) OVER w3) AS s_dn
      FROM p
      WINDOW w3 AS (PARTITION BY key ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT key,
           CAST(MAX(rn) AS BIGINT) AS n_seen,
           CAST(MAX(CASE WHEN rn = n THEN s_up END) AS BIGINT) AS cusum_up,
           CAST(MAX(CASE WHEN rn = n THEN s_dn END) AS BIGINT) AS cusum_down,
           CAST(SUM(CASE WHEN s_up > {int(_CUSUM_THRESHOLD * 1_000_000)}
                         OR s_dn > {int(_CUSUM_THRESHOLD * 1_000_000)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS alarms
    FROM s GROUP BY key
    """,
)
def st_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM drift monitor over events.value, keyed by
    event_type, drained bounded-source with availableNow and compared
    against the closed-form batch oracle — the oracle-gated twin of
    x_cusum_changepoint for the ONLINE path (SURVEY §2.11: custom
    stateful operator via applyInPandasWithState).

    Exactness: values pre-floor to integers before the monitor's
    micro-unit quantization (exact in float64), the per-key fold
    orders by the globally-unique event_id, and the oracle replaces
    the recursion with the prefix identity
    ``s_i = P_i − min(0, min_{j≤i} P_j)`` — pure BIGINT windows. The
    update-mode memory sink emits one row per touched key per
    micro-batch; the final state per key is the row with the largest
    n_seen (monotone), selected with one tiny max_by aggregate.

    Scale: state is four longs per key (hash-partitioned), the sink
    output is |keys| rows per batch — at 100 TB the same plan runs
    against Kafka with the state store bounding memory, while the
    batch oracle remains the offline backfill/audit path.
    """
    stage = _stage_stream_dir(sf_dir, "events")
    # Same physical-type normalization as tables.load (nanos long vs
    # micros timestamp_ntz), applied to the STREAM.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    src = spark.readStream.schema(schema).parquet(stage)
    # Integer-floor the value BEFORE the monitor's ×1e6 quantization:
    # floor(value) ≤ 2^53/1e6, so round(float(v)*1e6) is exact and the
    # state fold is bit-identical to the oracle's BIGINT arithmetic.
    src = src.select(
        "event_type",
        "event_id",
        F.floor(F.col("value").cast("double")).cast("long").alias("v_int"),
    )
    mon = stateful.cusum_monitor(
        src,
        key_col="event_type",
        value_col="v_int",
        order_cols=["event_id"],
        target=_CUSUM_TARGET,
        slack=_CUSUM_SLACK,
        threshold=_CUSUM_THRESHOLD,
    )
    sink = f"st_cusum_{uuid.uuid4().hex[:8]}"
    q = (
        mon.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            raise TimeoutError(
                "st_cusum_drift: availableNow drain did not finish "
                "within 120s — refusing to read partial update-mode "
                "state"
            )
    finally:
        q.stop()
    out = spark.table(sink)
    # Final state per key: the update-mode row with the largest n_seen.
    return out.groupBy("key").agg(
        F.max("n_seen").alias("n_seen"),
        F.max_by("cusum_up", "n_seen").alias("cusum_up"),
        F.max_by("cusum_down", "n_seen").alias("cusum_down"),
        F.max_by("alarms", "n_seen").alias("alarms"),
    )


# ---------------------------------------------------------------------------
# IVF nprobe sweep: recall@5 vs probe width
# ---------------------------------------------------------------------------


def _ivf_sweep_oracle() -> str:
    # Deferred import dance mirrors ss_ivf_recall: suite_llmops is
    # loaded before this module, so its oracle builders are available.
    from .suite_llmops import _ivf_oracle
    from .suite import ORACLES as _OR

    approx_union = "\n      UNION ALL\n".join(
        f"      SELECT {n} AS nprobe, * FROM ({_ivf_oracle(k=5, nprobe=n)}) iv{n}"
        for n in (1, 2, 4)
    )
    return f"""
    WITH exact AS (
      SELECT * FROM ({_OR["ss_cosine_topk"]}) e
    ), approx AS (
{approx_union}
    ), grid AS (
      SELECT n.nprobe, e.query_id, e.neighbor_id
      FROM exact e CROSS JOIN (SELECT DISTINCT nprobe FROM approx) n
    )
    SELECT g.nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS recall
    FROM grid g LEFT JOIN approx a
      ON a.nprobe = g.nprobe AND a.query_id = g.query_id
     AND a.neighbor_id = g.neighbor_id
    GROUP BY g.nprobe
    """


@query("ss_ivf_recall_sweep", oracle=_ivf_sweep_oracle())
def ss_ivf_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF retriever at nprobe ∈ {1, 2, 4} against the
    exact brute-force ranker — the cost/recall curve that decides the
    one knob an IVF deployment tunes. nprobe=1 was the round-3 gap
    (recall capped by single-cell probing); widening to 2-4 cells
    recovers neighbors that straddle cell boundaries at 2-4× probe
    cost, and recall is monotone non-decreasing in nprobe by
    construction (each wider routing is a superset of candidates —
    asserted in tests). Evaluation joins result sets only
    (|queries|·k·|sweep| rows), never re-scans the corpus; each IVF
    run itself probes nprobe clusters, so the sweep's total scan cost
    is Σ nprobe/nlist of the corpus."""
    from .suite_llmops import _QUERY_IDS

    emb = _t(spark, sf_dir, "embeddings")
    exact = similarity.cosine_topk(emb, _QUERY_IDS, k=5).select(
        "query_id", "neighbor_id"
    )
    # One centroid build shared by all three probe widths — the
    # quantize-sum explode shuffle runs once, not per sweep point.
    cents = similarity.label_centroids(emb).localCheckpoint(eager=False)
    runs = None
    for n in (1, 2, 4):
        r = (
            similarity.ivf_topk(emb, _QUERY_IDS, k=5, nprobe=n, centroids=cents)
            .select(
                F.lit(n).alias("a_np"),
                F.col("query_id").alias("a_qid"),
                F.col("neighbor_id").alias("a_nid"),
            )
        )
        runs = r if runs is None else runs.unionByName(r)
    grid = exact.crossJoin(
        F.broadcast(runs.select(F.col("a_np").alias("nprobe")).distinct())
    )
    joined = grid.join(
        runs,
        (F.col("nprobe") == F.col("a_np"))
        & (F.col("query_id") == F.col("a_qid"))
        & (F.col("neighbor_id") == F.col("a_nid")),
        "left",
    )
    hit = F.sum(F.col("a_nid").isNotNull().cast("long"))
    return joined.groupBy("nprobe").agg(
        F.count("*").cast("long").alias("n_pairs"),
        hit.alias("n_hit"),
        F.round(hit.cast("double") / F.count("*"), 6).alias("recall"),
    )
