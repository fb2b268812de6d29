"""As-of (point-in-time) join — an operator the reference lacks and
Spark has no built-in for (SURVEY §2.4 "not present"; brief: custom
operators as compositions of existing DataFrame ops where semantics
allow).

Semantics (trailing as-of, DuckDB/`ASOF LEFT JOIN`-compatible): for
each left row, attach the single right row with the same key and the
greatest right-timestamp ≤ the left timestamp; null if none.

Implementation is the union + last(ignorenulls) window trick, NOT a
range join: tag both sides, union them, and for every left row take
the last non-null right payload in key-partitioned timestamp order.
One shuffle on (key), no fan-out, no nested-loop/range join — at
100 TB both sides hash-partition by key and each partition sorts
locally (the same cost profile as one SortMergeJoin, but immune to
the unbounded-candidate blowup a `BETWEEN` range join has when keys
are hot).

Right side must be unique per (key, ts); pre-aggregate if it isn't
(ties would otherwise be nondeterministic under partition order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_on: str | None = None,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Trailing as-of left join.

    left:  fact rows, each gets the most recent right row at-or-before
           its ``on`` timestamp, matched on ``by`` key(s)
    right: reference series; ``right_on`` (default: ``on``) is its
           timestamp column; ``payload_cols`` (default: all non-key,
           non-ts columns) are attached to the left rows
    """
    keys = [by] if isinstance(by, str) else list(by)
    r_on = right_on or on
    payload = payload_cols or [c for c in right.columns if c not in (*keys, r_on)]

    # Common spine: (key..., __ts, __is_left, payload..., left-cols...)
    l_tagged = left.select(
        *keys,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        *[F.col(c) for c in left.columns if c not in keys],
    )
    r_tagged = right.select(
        *keys,
        F.col(r_on).cast(dict(left.dtypes)[on]).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at equal __ts (__is_left asc), so
    # a right row AT the left timestamp is visible — the `<=` semantics.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload
        ],
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *keys,
            *[c for c in left.columns if c not in keys],
            *[F.col(f"__f_{c}").alias(c) for c in payload],
        )
    )
