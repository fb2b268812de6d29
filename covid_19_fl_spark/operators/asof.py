"""As-of (point-in-time) join — an operator the reference lacks and
Spark has no built-in for (SURVEY §2.4 "not present"; brief: custom
operators as compositions of existing DataFrame ops where semantics
allow).

Semantics: for each left row, attach the single right row with the same
key and the right-timestamp closest to the left timestamp in the chosen
``direction`` — ``backward`` (greatest right ts ≤ left ts; the
DuckDB/pandas `merge_asof` default), ``forward`` (smallest right ts ≥
left ts), or ``nearest`` (whichever of the two is closer; backward wins
ties). ``tolerance_sec`` nulls out matches farther than the given
distance, like ``merge_asof(tolerance=...)``.

Implementation is the union + last(ignorenulls) window trick, NOT a
range join: tag both sides, union them, and for every left row take
the last non-null right payload in key-partitioned timestamp order
(reversed order for the forward direction; both passes for nearest).
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

_TS = "__asof_rts"  # matched right timestamp, carried as hidden payload


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_on: str | None = None,
    payload_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of left join.

    left:  fact rows, each gets the right row nearest its ``on``
           timestamp in ``direction``, matched on ``by`` key(s)
    right: reference series; ``right_on`` (default: ``on``) is its
           timestamp column; ``payload_cols`` (default: all non-key,
           non-ts columns) are attached to the left rows
    direction: ``backward`` | ``forward`` | ``nearest``
    tolerance_sec: if set, matches farther than this many seconds from
           the left timestamp are nulled out (the row itself survives —
           left-join semantics are unchanged)
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    r_on = right_on or on
    payload = list(
        payload_cols or [c for c in right.columns if c not in (*keys, r_on)]
    )

    # Common spine: (key..., __ts, __is_left, payload..., left-cols...).
    # The matched right timestamp rides along as one more payload column
    # so tolerance/nearest can measure distance after the fill.
    l_tagged = left.select(
        *keys,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(dict(left.dtypes)[on]).alias(f"__r_{_TS}"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    r_tagged = right.select(
        *keys,
        F.col(r_on).cast(dict(left.dtypes)[on]).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(r_on).cast(dict(left.dtypes)[on]).alias(f"__r_{_TS}"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = [*payload, _TS]

    def fill(df: DataFrame, forward: bool, tag: str) -> DataFrame:
        # Right rows sort before left rows at equal __ts (__is_left asc
        # under either ts direction), so a right row AT the left
        # timestamp is visible — the `<=` / `>=` boundary semantics.
        order = F.col("__ts").desc() if forward else F.col("__ts").asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(order, F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.select(
            "*",
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__{tag}_{c}")
                for c in carried
            ],
        )

    def dist(match_ts):
        # Timestamp distance in seconds (exact micros arithmetic);
        # numeric ts columns subtract directly.
        if dict(left.dtypes)[on].startswith("timestamp"):
            return F.abs(
                F.unix_micros(F.col("__ts")) - F.unix_micros(match_ts)
            ) / F.lit(1_000_000.0)
        return F.abs(F.col("__ts").cast("double") - match_ts.cast("double"))

    if direction == "nearest":
        filled = fill(fill(unioned, forward=False, tag="b"), forward=True, tag="f")
        b_ts, f_ts = F.col(f"__b_{_TS}"), F.col(f"__f_{_TS}")
        use_fwd = b_ts.isNull() | (f_ts.isNotNull() & (dist(f_ts) < dist(b_ts)))
        picked = [
            F.when(use_fwd, F.col(f"__f_{c}")).otherwise(F.col(f"__b_{c}")).alias(f"__m_{c}")
            for c in carried
        ]
    else:
        tag = "f" if direction == "forward" else "b"
        filled = fill(unioned, forward=direction == "forward", tag=tag)
        picked = [F.col(f"__{tag}_{c}").alias(f"__m_{c}") for c in carried]

    out = filled.filter(F.col("__is_left") == 1).select("*", *picked)
    keep = F.col(f"__m_{_TS}").isNotNull()
    if tolerance_sec is not None:
        keep = keep & (dist(F.col(f"__m_{_TS}")) <= F.lit(float(tolerance_sec)))
    return out.select(
        *keys,
        *[c for c in left.columns if c not in keys],
        *[F.when(keep, F.col(f"__m_{c}")).alias(c) for c in payload],
    )
