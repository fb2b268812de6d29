"""Round-5 suite additions.

Closes the round-4 verdict's remaining streaming weak spot: the
stream-stream join existed under the oracle gate only in its
unwatermarked full-state form. ``st_stream_stream_join_wm`` is the
production shape — event-time columns on BOTH sides, ``withWatermark``
on both sides, and an event-time RANGE predicate in the join condition,
so the symmetric join state is evictable: once the watermark passes
``o_ts + band + delay``, a buffered order row can never match a future
lineitem row and the state store drops it. The oracle is the batch
join restricted to the same time band.

Exactness under the gate: the drain pins a single micro-batch
(``maxFilesPerTrigger`` above any corpus's file count, asserted after
the drain, same discipline as ``st_cusum_drift``) — during the one
data batch the watermark is still at its initial floor, so no input
row is late-filtered and the joined output equals the batch join
bit-for-bit; eviction then fires on the trailing batch. The
multi-batch eviction behavior itself (state rows dropping once the
watermark passes the band) is pinned by
``tests/test_streaming_join_wm.py`` on an ordered two-file stage.

Every query keeps the suite's determinism discipline: integer/DECIMAL
accumulation across shuffles, doubles only in final rounded ratios.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .suite import _t, query  # noqa: F401  (_t used by later additions)
from .suite_r4 import _stage_stream_dir, _stream_shuffle_partitions

# Event-time band for the watermarked join: a lineitem matches its
# order only if shipped within BAND days of the order date. TPC-H ships
# 1..121 days after the order, so 60 is a real restriction (≈ half the
# pairs survive), not a vacuous always-true range.
_SSJ_BAND_DAYS = 60
_SSJ_WM_DELAY = "30 days"


@query(
    "st_stream_stream_join_wm",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL {_SSJ_BAND_DAYS} DAY
    GROUP BY 1
    """,
)
def st_stream_stream_join_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join — the production twin of
    ``st_stream_stream_join`` whose state EVICTS (round-5 verdict
    item 3). Both sides carry an event-time column (order date / ship
    date as timestamps), both declare a watermark, and the join
    condition adds the event-time range ``o_ts <= l_ts <= o_ts +
    {band} days`` — the three ingredients Spark needs to compute a
    state watermark per side and drop buffered rows that can no
    longer match (reference cadence: cv-api.py:91-98's bounded
    polling loop re-joins only the recent window).

    Under the gate the drain is pinned to ONE data micro-batch
    (asserted), so the initial watermark filters nothing and the
    appended output equals the band-restricted batch join exactly;
    state cleanup runs in the trailing no-data batch. Multi-batch
    eviction is pinned separately in pytest, where the final
    progress's state rows drop below the total buffered input.

    Scale: join state is hash-partitioned on orderkey; with the
    watermark the per-partition store holds only the trailing
    ``band + delay`` window of each side instead of the whole history
    — the difference between O(stream) and O(window) memory on an
    unbounded deployment.
    """
    ostage = _stage_stream_dir(sf_dir, "orders")
    lstage = _stage_stream_dir(sf_dir, "lineitem")
    oschema = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).schema
    lschema = spark.read.parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    ).schema
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = (
        spark.readStream.schema(oschema)
        .option("maxFilesPerTrigger", 1_000_000)
        .parquet(ostage)
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_ts"),
        )
        .withWatermark("o_ts", _SSJ_WM_DELAY)
    )
    items = (
        spark.readStream.schema(lschema)
        .option("maxFilesPerTrigger", 1_000_000)
        .parquet(lstage)
        .select(
            "l_orderkey",
            "l_returnflag",
            "l_extendedprice",
            F.col("l_shipdate").cast("timestamp").alias("l_ts"),
        )
        .withWatermark("l_ts", _SSJ_WM_DELAY)
    )
    joined = items.join(
        orders,
        (items.l_orderkey == orders.o_orderkey)
        & (items.l_ts >= orders.o_ts)
        & (
            items.l_ts
            <= orders.o_ts + F.expr(f"INTERVAL {_SSJ_BAND_DAYS} DAYS")
        ),
    ).select("l_returnflag", "l_extendedprice")
    sink = f"st_ssjwm_{uuid.uuid4().hex[:8]}"
    with _stream_shuffle_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(180):
                raise TimeoutError(
                    "st_stream_stream_join_wm: availableNow drain did "
                    "not finish within 180s — refusing to aggregate a "
                    "partial sink"
                )
        finally:
            data_batches = sum(
                1
                for p in q.recentProgress
                if p and p.get("numInputRows", 0) > 0
            )
            q.stop()
    if data_batches > 1:
        raise AssertionError(
            f"st_stream_stream_join_wm: drain took {data_batches} data "
            "batches — the single-batch no-late-filtering assumption is "
            "violated; raise maxFilesPerTrigger"
        )
    return (
        spark.table(sink)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )
