"""Data-quality audit — composable constraint checks as DataFrame ops.

The reference validated nothing (SURVEY §5.1: zero assertions; bad rows
crashed the row loop or landed silently in MongoDB — e.g. the stale
other_stats.csv fixture that would crash cv-csv.py:87-95). A pipeline
engine needs the checks as first-class, distributed operators: each
check compiles to one aggregate over the table (map-side combined, one
scalar per partition crosses the exchange), and an audit is a union of
scalars — O(checks) tiny rows out of any input size.

Checks return one-row DataFrames `(check: string, violations: long)` so
they compose with unionByName and sink anywhere. No collect, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _result(df: DataFrame, name: str, violations: Column) -> DataFrame:
    return df.agg(violations.cast("long").alias("violations")).select(
        F.lit(name).alias("check"), "violations"
    )


def not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Rows where ``col`` is null."""
    return _result(
        df, name or f"{col}_not_null", F.count_if(F.col(col).isNull())
    )


def in_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    """Rows outside [lo, hi] (nulls count as violations)."""
    ok = F.col(col).between(F.lit(lo), F.lit(hi))
    return _result(
        df, name or f"{col}_in_range", F.count_if(~F.coalesce(ok, F.lit(False)))
    )


def accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    """Rows whose ``col`` is outside the accepted domain."""
    ok = F.col(col).isin(values)
    return _result(
        df,
        name or f"{col}_accepted_values",
        F.count_if(~F.coalesce(ok, F.lit(False))),
    )


def unique_key(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Excess rows beyond one per key (0 ⇔ ``cols`` is a unique key).

    count(*) − count(distinct key) needs no per-key state to survive the
    aggregation — two scalars per partition, exact at any scale.
    """
    key = F.struct(*[F.col(c) for c in cols])
    return _result(
        df,
        name or f"{'_'.join(cols)}_unique",
        F.count(F.lit(1)) - F.count_distinct(key),
    )


def referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Orphans: child rows whose key has no parent (left-anti join).

    The anti-join shuffles on the key (or broadcasts a small parent);
    non-null orphan detection only — null FKs are not_null's job.
    """
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return _result(
        orphans, name or f"{child_key}_referential", F.count(F.lit(1))
    )


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union the check results into one `(check, violations)` report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
