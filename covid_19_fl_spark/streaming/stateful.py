"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.11; brief: "applyInPandasWithState for custom stateful
operators").

The flagship use is the reference's epidemic curve as a TRUE streaming
operator: the batch engine recomputes ``groupBy(date).count().cumsum()``
from scratch every run (cv-stats.py:54-56); here per-key running totals
live in the state store and each micro-batch emits updated cumulative
rows for exactly the keys it touched. State is per-key (hash-partitioned
across executors) and explicitly evictable via timeout — bounded, unlike
the reference's ever-growing recompute.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("batch_rows", LongType(), False),
        StructField("running_total", LongType(), False),
    ]
)

_STATE_SCHEMA = "total LONG"


def running_totals(
    stream: DataFrame,
    key_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running row count across micro-batches.

    Input: any streaming DataFrame with ``key_col`` (cast to string).
    Output per batch: one row per touched key with the batch's row
    count and the all-time running total — the W1 cumulative series,
    maintained incrementally in keyed state instead of recomputed.
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in batches:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame(
            {"key": [key[0]], "batch_rows": [n], "running_total": [total]}
        )

    # Reserved-name grouping copy: "CAST(k) AS key, *" would collide
    # with an existing `key` column and fail with AMBIGUOUS_REFERENCE.
    keyed = stream.withColumn("__rt_key", F.col(key_col).cast("string"))
    return keyed.groupBy("__rt_key").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def running_totals_tws(stream: DataFrame, key_col: str) -> DataFrame:
    """`running_totals` on the Spark 4 arbitrary-state API
    (``transformWithStateInPandas`` + ``StatefulProcessor``): typed
    value state, explicit lifecycle, optional per-state TTL — the
    successor to applyInPandasWithState's single blob state. State
    lives in the state store keyed by the shuffle key, so at scale the
    operator is bounded by distinct keys, not stream volume; both
    variants are kept so the suite pins the old and new contracts.

    Runtime note: the transformWithState worker protocol needs
    ``protobuf`` on the Python workers; environments without it should
    use ``running_totals`` (applyInPandasWithState) — same semantics.
    The processor itself (:func:`make_running_total_processor`) and
    the plan-level schema plumbing are protobuf-free and contract-
    tested everywhere; only the executed drain needs the wheel.
    """
    keyed = stream.withColumn("__rt_key", F.col(key_col).cast("string"))
    return keyed.groupBy("__rt_key").transformWithStateInPandas(
        make_running_total_processor(),
        outputStructType=RUNNING_TOTAL_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def make_running_total_processor():
    """The ``StatefulProcessor`` behind :func:`running_totals_tws`,
    exposed at module level so its lifecycle contract (init →
    handleInputRows carrying typed value state across calls → close)
    is directly testable against a stub handle without the
    transformWithState worker protocol (which needs protobuf)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total LONG")

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            for pdf in rows:
                n += len(pdf)
            total = self._total.get()[0] if self._total.exists() else 0
            total += n
            self._total.update((total,))
            yield pd.DataFrame(
                {"key": [key[0]], "batch_rows": [n], "running_total": [total]}
            )

        def close(self) -> None:
            pass

    return RunningTotal()


CUSUM_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("cusum_up", LongType(), False),
        StructField("cusum_down", LongType(), False),
        StructField("alarms", LongType(), False),
    ]
)

_CUSUM_STATE = "n LONG, s_up LONG, s_dn LONG, alarms LONG"


def cusum_monitor(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: list[str],
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
) -> DataFrame:
    """Streaming CUSUM drift monitor — the online twin of the batch
    x_cusum_changepoint query. Per key, the state store carries the
    two one-sided CUSUM statistics
    ``s_up = max(0, s_up + (v - target - slack))`` /
    ``s_dn = max(0, s_dn + (target - v - slack))`` folded over values
    in ``order_cols`` order, plus a count of samples observed while
    either statistic exceeded ``threshold`` (excursion length — a
    sustained drift keeps incrementing it; it is NOT a count of
    distinct alarm events, which would need a post-alarm reset).
    Unlike the batch query (which learns the mean from the data), the
    online detector folds against a caller-fixed ``target`` — the
    standard SPC formulation, since a stream has no final mean.

    Determinism: values are quantized to integer micro-units before the
    fold, so state is pure BIGINT and the result is bit-identical for
    any micro-batch slicing of the same in-order stream (replay-
    invariance is pinned by test). State per key is four longs —
    bounded regardless of stream volume; keys hash-partition across
    executors like every keyed stateful operator.
    """
    t_u = round(target * 1_000_000)
    k_u = round(slack * 1_000_000)
    thr_u = round(threshold * 1_000_000) if threshold is not None else None

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s_up, s_dn, alarms = state.get if state.exists else (0, 0, 0, 0)
        # One key's micro-batch data can arrive as several Arrow chunks
        # (arrow.maxRecordsPerBatch) in arbitrary shuffle order — the
        # fold is order-sensitive, so concatenate THEN sort once; a
        # per-chunk sort would break the replay-invariance contract.
        all_chunks = list(batches)
        if all_chunks:
            pdf = pd.concat(all_chunks).sort_values(order_cols)
            for v in pdf[value_col]:
                v_u = round(float(v) * 1_000_000)
                s_up = max(0, s_up + (v_u - t_u - k_u))
                s_dn = max(0, s_dn + (t_u - v_u - k_u))
                n += 1
                if thr_u is not None and (s_up > thr_u or s_dn > thr_u):
                    alarms += 1
        state.update((n, s_up, s_dn, alarms))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n],
                "cusum_up": [s_up],
                "cusum_down": [s_dn],
                "alarms": [alarms],
            }
        )

    # Group on a reserved-name copy of the key: "CAST(k) AS key, *"
    # would collide if the input already has a column named `key`
    # (or key_col == "key") and fail analysis with AMBIGUOUS_REFERENCE.
    keyed = stream.withColumn("__cusum_key", F.col(key_col).cast("string"))
    return keyed.groupBy("__cusum_key").applyInPandasWithState(
        update,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
