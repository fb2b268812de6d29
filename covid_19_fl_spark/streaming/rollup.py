"""Streaming continuous aggregate — the incremental twin of the batch
``x_agg_state_rollup`` query (and of the reference's nightly full
recompute, cv-stats.py:54-56: instead of rescanning history every run,
each micro-batch folds into a persisted partial-state table).

The state table holds one row per (event_type, event_date) of MERGEABLE
aggregate states — count, DECIMAL sum, min, max — so any coarser rollup
(monthly, per-type, global) is derived by merging states, never by
re-reading raw events. At 100 TB of history that is the difference
between an O(batch + |state|) maintenance step and an O(history) scan.

Exactly-once: foreachBatch is at-least-once (a failed batch replays
with the SAME batch_id), so the merge stamps the state table with the
last applied batch_id and skips any batch at-or-below it — the standard
transactional-sink idempotence recipe; replays become no-ops and counts
can never double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..sinks.batch import ParquetTable

_STATE_KEYS = ("event_type", "event_date")
_LAST_BATCH = "_last_batch"


def batch_states(events: DataFrame, ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Daily partial aggregate states for one slice of events. DECIMAL
    sum keeps the eventual double exact and partition-order-proof
    (same contract as the batch rollup query)."""
    return events.groupBy(
        "event_type", F.col(ts_col).cast("date").alias("event_date")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(28,4)")).alias("sum_state"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two partial-state tables (associative + commutative:
    count→sum, sum→sum, min→min, max→max)."""
    return (
        a.unionByName(b)
        .groupBy(*_STATE_KEYS)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_state").cast("decimal(28,4)").alias("sum_state"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def write_rollup_states(
    stream: DataFrame,
    table: ParquetTable,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataStreamWriter:
    """foreachBatch sink maintaining the daily state table. Caller
    starts it with ``.trigger(...)`` of choice.

    Each batch: aggregate the micro-batch to partial states (tiny —
    |touched keys| rows), merge with the stored states, atomically swap.
    The swap rewrites O(|state|); at a scale where |state| itself is
    large the same merge goes through ``replace_where`` on the touched
    date partitions instead — the states make that a drop-in change."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        apply_batch(table, batch, batch_id, ts_col, value_col)

    return stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )


def apply_batch(
    table: ParquetTable,
    batch: DataFrame,
    batch_id: int,
    ts_col: str = "ts",
    value_col: str = "value",
) -> bool:
    """One maintenance step (the foreachBatch body, exposed so replay
    semantics are directly testable). Returns True iff the batch was
    applied, False for empty batches and at-least-once replays."""
    if batch.isEmpty():
        return False
    bstates = batch_states(batch, ts_col, value_col)
    if not table.exists():
        table.overwrite(bstates.withColumn(_LAST_BATCH, F.lit(batch_id)))
        return True
    cur = table.read()
    last = cur.agg(F.max(_LAST_BATCH)).first()[0]
    if last is not None and batch_id <= last:
        return False  # at-least-once replay of an already-applied batch
    merged = merge_states(cur.drop(_LAST_BATCH), bstates)
    table.overwrite(merged.withColumn(_LAST_BATCH, F.lit(batch_id)))
    return True


def read_daily(table: ParquetTable) -> DataFrame:
    """Daily rollup view over the maintained states."""
    s = table.read().drop(_LAST_BATCH)
    return s.select(
        "event_type",
        "event_date",
        F.col("cnt").alias("n_events"),
        F.col("sum_state").cast("double").alias("total_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
        F.round(F.col("sum_state").cast("double") / F.col("cnt"), 6).alias("avg_value"),
    )


def read_monthly(table: ParquetTable) -> DataFrame:
    """Monthly rollup derived purely by merging daily states — never
    touches raw events (column contract identical to the batch
    ``x_agg_state_rollup`` query)."""
    s = table.read().drop(_LAST_BATCH)
    monthly = s.groupBy(
        "event_type", F.trunc("event_date", "month").alias("month")
    ).agg(
        F.sum("cnt").alias("n_events"),
        F.sum("sum_state").cast("double").alias("total_value"),
        F.min("min_v").alias("min_value"),
        F.max("max_v").alias("max_value"),
        F.round(
            F.sum("sum_state").cast("double") / F.sum("cnt"), 6
        ).alias("avg_value"),
    )
    return monthly
