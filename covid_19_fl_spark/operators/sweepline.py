"""Sweep-line interval analytics (peak concurrency).

The classic resource-occupancy question — "how many intervals are live
at once, and when does the maximum happen" — is a running sum over the
+1/-1 edge stream of interval starts and ends. The naive formulation
is a data-sized global window per key; here the prefix is decomposed
through :mod:`covid_19_fl_spark.operators.ranks` so the sort
distributes across a domain-bounded bucket spine (e.g. days), which is
the shape that survives a 1000-executor shuffle.

Tie rule: ends sort before starts at the same instant (delta −1 < +1),
i.e. intervals are half-open ``[start, end)`` — an interval ending
exactly when another starts does not overlap it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ranks


def peak_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    order_col: str,
    bucket_width: int = 86_400_000_000,
) -> DataFrame:
    """Peak number of concurrently-live ``[start, end)`` intervals per
    key, plus the earliest instant the peak is reached.

    ``start_col``/``end_col`` are BIGINT instants (e.g. epoch micros);
    ``order_col`` is a unique BIGINT id making the edge order total
    (deterministic across engines). ``bucket_width`` sizes the ranks
    spine buckets — non-decreasing along the time axis by construction.

    Plan: one union (no shuffle), one map-combined spine aggregation +
    broadcast join from :func:`ranks.with_global_prefix` (the windows
    partition on (key, bucket) — bounded slices), then one struct-max
    hash aggregate for the (peak, earliest-instant) pair. Output:
    (key, peak BIGINT, peak_at_us BIGINT).
    """
    edges = df.select(
        F.col(key_col).alias("__k"),
        F.col(start_col).alias("t_us"),
        F.lit(1).alias("d"),
        F.col(order_col).alias("__o"),
    ).unionByName(
        df.select(
            F.col(key_col).alias("__k"),
            F.col(end_col).alias("t_us"),
            F.lit(-1).alias("d"),
            F.col(order_col).alias("__o"),
        )
    )
    pref = ranks.with_global_prefix(
        edges,
        bucket=F.floor(F.col("t_us") / F.lit(bucket_width)),
        order_cols=[F.col("t_us"), F.col("d"), F.col("__o")],
        partition_cols=["__k"],
        running_sums={"conc": F.col("d").cast("long")},
    )
    best = F.max(
        F.struct(
            F.col("conc").cast("long").alias("c"), (-F.col("t_us")).alias("nt")
        )
    )
    return (
        pref.groupBy("__k")
        .agg(best.alias("b"))
        .select(
            F.col("__k").alias(key_col),
            F.col("b.c").alias("peak"),
            (-F.col("b.nt")).alias("peak_at_us"),
        )
    )
