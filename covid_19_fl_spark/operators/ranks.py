"""Distributed global-order primitives (scale-safe rank / prefix scans).

A bare ``Window.orderBy(...)`` with no partition key plans a
single-partition sort — the one WindowExec shape that cannot scale
past one reducer, fine over a 10-row post-agg series but a
scale-killer over a per-entity aggregate whose cardinality grows with
the data (|customers|, |parts|, |documents|). These helpers decompose
an exact global ROW_NUMBER / running SUM / running MAX into:

1. a *partitioned* window WITHIN a deterministic bucket of the sort
   key (the bucket expression must be non-decreasing along the
   intended global order, e.g. ``floor(value / W)`` for an ascending
   value sort), which distributes the sort across executors; plus
2. a prefix scan over the tiny per-bucket spine (hundreds of rows —
   bounded by the value DOMAIN, not the data size), broadcast back.

Exactness: the spine offsets are plain COUNT/SUM/MAX of the same
values (BIGINT/DECIMAL), so ``offset + local`` equals the
single-sort global answer row-for-row and bit-for-bit — oracle SQL
written against the naive global window needs no change.

This is the same decomposition x_equidepth_histogram uses for global
row numbering (suite_advanced.py), promoted to a reusable operator.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__gp_bkt"


def _guarded_bucket(bucket: Column) -> Column:
    """Bucket cast to long with a lazy NULL trap.

    A NULL bucket would silently corrupt the decomposition: the inner
    equi-join on the bucket tag never matches NULL (rows vanish) while
    the spine's NULL group would still shift other buckets' offsets —
    and Spark windows sort NULLS FIRST where DuckDB oracles sort NULLS
    LAST, so the divergence would be quiet. Fail loudly at execution
    time instead (``raise_error`` stays inside codegen; the non-null
    path is unchanged)."""
    bkt = bucket.cast("long")
    return F.when(bkt.isNotNull(), bkt).otherwise(
        F.raise_error(
            F.lit(
                "ranks: NULL bucket value — global-order decomposition "
                "requires a non-null bucket expression; filter NULLs or "
                "handle the NULL group explicitly"
            )
        )
    )


def with_global_prefix(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence,
    *,
    partition_cols: Optional[Sequence[str]] = None,
    rn: Optional[str] = None,
    running_sums: Optional[Mapping[str, Column]] = None,
    total_count: Optional[str] = None,
    total_sums: Optional[Mapping[str, Column]] = None,
) -> DataFrame:
    """Add exact ordered-prefix columns without a global sort.

    The total order (within each ``partition_cols`` group, or globally
    when none are given) is ``(bucket ASC, *order_cols)``; the caller
    must pick ``bucket`` so this equals the intended order (i.e.
    bucket is a non-decreasing function of the leading sort key —
    negate it for a DESC sort).

    rn            — name for the ROW_NUMBER (1-based, BIGINT).
    running_sums  — {name: value_col} inclusive running sums in order
                    (ROWS UNBOUNDED PRECEDING .. CURRENT ROW).
    total_count   — name for the whole-frame COUNT(*) (replaces
                    ``count(*) over ()``, itself a single-partition
                    global window).
    total_sums    — {name: value_col} whole-frame sums (replaces
                    ``sum(x) over ()``).
    """
    pc = list(partition_cols or [])
    running_sums = dict(running_sums or {})
    total_sums = dict(total_sums or {})
    tagged = df.withColumn(_BKT, _guarded_bucket(bucket))

    # One map-combined shuffle builds the bucket spine; every summed
    # column rides the same agg.
    sum_src: dict = {}
    sum_src.update(total_sums)
    sum_src.update(running_sums)  # running wins on name collision
    aggs = [F.count("*").alias("__cnt")]
    for name, col in sum_src.items():
        aggs.append(F.sum(col).alias(f"__s_{name}"))
    spine = tagged.groupBy(*pc, _BKT).agg(*aggs)

    # Prefix scan over the spine: a window over B buckets
    # (domain-bounded), not over the data.
    wprev = (
        Window.partitionBy(*pc) if pc else Window.partitionBy()
    ).orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        *[F.col(c) for c in pc],
        F.col(_BKT),
        F.coalesce(F.sum("__cnt").over(wprev), F.lit(0)).alias("__off_cnt"),
    ]
    for name in running_sums:
        off_cols.append(
            F.coalesce(F.sum(f"__s_{name}").over(wprev), F.lit(0)).alias(
                f"__off_{name}"
            )
        )
    offsets = spine.select(*off_cols)

    out = tagged.join(F.broadcast(offsets), [*pc, _BKT])
    if rn is not None:
        wrow = Window.partitionBy(*pc, _BKT).orderBy(*order_cols)
        out = out.withColumn(
            rn, (F.col("__off_cnt") + F.row_number().over(wrow)).cast("long")
        )
    if running_sums:
        wloc = (
            Window.partitionBy(*pc, _BKT)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for name, col in running_sums.items():
            out = out.withColumn(
                name, F.col(f"__off_{name}") + F.sum(col).over(wloc)
            )

    if total_count is not None or total_sums:
        tot_aggs = []
        if total_count is not None:
            tot_aggs.append(F.sum("__cnt").cast("long").alias(total_count))
        for name in total_sums:
            tot_aggs.append(F.sum(f"__s_{name}").alias(name))
        if pc:
            totals = spine.groupBy(*pc).agg(*tot_aggs)
            out = out.join(F.broadcast(totals), pc)
        else:
            out = out.crossJoin(F.broadcast(spine.agg(*tot_aggs)))

    return out.drop(_BKT, "__off_cnt", *[f"__off_{n}" for n in running_sums])


def with_ntile(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence,
    k: int,
    name: str,
    *,
    partition_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact NTILE(k) over ``(bucket ASC, *order_cols)`` without a
    single-partition sort: the global rank comes from
    :func:`with_global_prefix`, and the standard SQL NTILE rule
    (first ``n % k`` buckets get ``n div k + 1`` rows, the rest
    ``n div k``) is spelled explicitly from (rank, n) with pure
    integer arithmetic — agreeing with both Spark's and DuckDB's
    built-in NTILE row-for-row (pinned by test). The CASE is
    evaluated lazily per-row, so the small-bucket branch's division
    by ``n div k`` never runs when n < k would make it zero."""
    out = with_global_prefix(
        df,
        bucket,
        order_cols,
        partition_cols=partition_cols,
        rn="__nt_i",
        total_count="__nt_n",
    )
    expr = (
        f"CASE WHEN __nt_i <= (__nt_n % {k}) * (__nt_n div {k} + 1) "
        f"THEN (__nt_i - 1) div (__nt_n div {k} + 1) + 1 "
        f"ELSE (__nt_n % {k}) + (__nt_i - 1 - (__nt_n % {k}) * (__nt_n div {k} + 1)) "
        f"     div (__nt_n div {k}) + 1 END"
    )
    return out.withColumn(name, F.expr(expr).cast("int")).drop(
        "__nt_i", "__nt_n"
    )


def with_prior_running_max(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence,
    value: Column,
    name: str,
    *,
    partition_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact *exclusive* running MAX of ``value`` over
    ``(bucket ASC, *order_cols)`` — the skyline / record-to-date
    primitive (``MAX(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``) without a single-partition sort.
    NULL on the first row, matching the empty-prefix window."""
    pc = list(partition_cols or [])
    tagged = df.withColumn(_BKT, _guarded_bucket(bucket))
    spine = tagged.groupBy(*pc, _BKT).agg(F.max(value).alias("__mx"))
    wprev = (
        Window.partitionBy(*pc) if pc else Window.partitionBy()
    ).orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = spine.select(
        *pc, _BKT, F.max("__mx").over(wprev).alias("__off_mx")
    )
    wloc = (
        Window.partitionBy(*pc, _BKT)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        tagged.join(F.broadcast(offsets), [*pc, _BKT])
        .withColumn("__loc_mx", F.max(value).over(wloc))
        # greatest() skips NULLs and is NULL only when both are — i.e.
        # exactly on the first row, like the naive window.
        .withColumn(name, F.greatest("__off_mx", "__loc_mx"))
    )
    return out.drop(_BKT, "__off_mx", "__loc_mx")
