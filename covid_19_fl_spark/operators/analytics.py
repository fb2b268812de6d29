"""Analytics operators (SURVEY.md §2.5 aggregations, §2.6 windows,
§2.7 top-k, §2.9 sequence generation) as composable
DataFrame → DataFrame functions.

Design notes for 100 TB scale (SURVEY.md §4.3):

- Global-order windows (cumulative sum / growth rate with no partition
  key) run on *post-aggregation* series — one row per date — never on
  raw facts. The expensive part (groupBy date) is a partial+final
  HashAggregate that shuffles pre-combined per-partition counts, so the
  single-partition window step sees only |dates| rows regardless of fact
  cardinality.
- Partitioned windows (per-group cumsum) keep the group key as the
  window partition key, so work distributes across executors.
- Top-K compiles to ``TakeOrderedAndProject`` — per-partition heaps, no
  global sort.
- The growth simulation is closed-form (``explode(sequence())`` +
  ``pow``) instead of the reference's sequential driver loop
  (cv-stats.py:69-83), so it is distributable and O(1) in driver memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_counts(df: DataFrame, date_col: str, key_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """A2/A3 — count of non-null ``key_col`` per date (and optional extra keys).

    Reference: ``data.groupby("date_added")["case_number"].count()``
    (cv-stats.py:55) and the composite-key variant (cv-county-stats.py:55).
    pandas sorts group keys implicitly; Spark does not, so callers that
    need date order apply an explicit ``orderBy`` (SURVEY.md O2).
    """
    keys = (group_cols or []) + [date_col]
    return df.groupBy(*keys).agg(F.count(key_col).alias("count"))


def cumulative_sum(
    df: DataFrame,
    order_col: str,
    value_col: str = "count",
    partition_cols: list[str] | None = None,
    out_col: str = "cum_count",
) -> DataFrame:
    """W1/W2 — running cumulative sum over an ordered series.

    Reference: ``count_by_date.cumsum()`` (cv-stats.py:54-56) and the
    per-county variant (cv-county-stats.py:60). Partitioned when
    ``partition_cols`` given; otherwise a single-partition window that
    must only ever run on post-aggregation series (≤ one row per date).
    """
    w = Window.orderBy(order_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def growth_rates(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
    out_col: str = "rate",
) -> DataFrame:
    """W3 — lag-ratio: ``cur / prev`` over an ordered series; null first row.

    Reference: ``cum_sum().pct_change()`` then ``+ 1`` (cv-stats.py:59-66).
    """
    w = (
        Window.partitionBy(*partition_cols).orderBy(order_col)
        if partition_cols
        else Window.orderBy(order_col)
    )
    prev = F.lag(value_col, 1).over(w)
    return df.withColumn(out_col, F.col(value_col).cast("double") / prev)


def daily_delta(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
    default: float = 0.0,
    out_col: str = "delta",
) -> DataFrame:
    """W4 — running previous-value delta with seeded first row.

    Reference: ``new_tests = tests - prev_tests`` loop-carried with seed
    0 (cv-csv.py:86-94) → ``value - lag(value, 1, default)``.
    """
    w = (
        Window.partitionBy(*partition_cols).orderBy(order_col)
        if partition_cols
        else Window.orderBy(order_col)
    )
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col, 1, default).over(w))


def tail_n(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """W5 — last N rows of an ordered series, returned in ascending order.

    Reference: ``growth_rate.tail(tail)`` (cv-stats.py:63-66). Compiles
    to TakeOrderedAndProject (desc limit N), then a tiny re-sort.
    """
    return df.orderBy(F.col(order_col).desc()).limit(n).orderBy(order_col)


def last_row(df: DataFrame, order_col: str) -> DataFrame:
    """W6 — max-``order_col`` row (cv-stats.py:73-74)."""
    return df.orderBy(F.col(order_col).desc()).limit(1)


def top_k_by_count(
    df: DataFrame,
    key_col: str,
    k: int,
    count_col: str | None = None,
) -> DataFrame:
    """A4/O3 — top-K keys by count, deterministically tie-broken by key.

    Reference: ``groupby('county').count().nlargest(5)``
    (cv-county-stats.py:71-73). pandas keeps first-seen on ties; the
    engine declares (count desc, key asc) as canonical tie-break
    (SURVEY.md §7.3) so results are stable under any partitioning.
    Compiles to partial+final HashAggregate → TakeOrderedAndProject.
    """
    counted = df.groupBy(key_col).agg(F.count(count_col or key_col).alias("count"))
    return counted.orderBy(F.col("count").desc(), F.col(key_col).asc()).limit(k)


def per_capita_counts(
    counts: DataFrame,
    dim: DataFrame,
    key_col: str,
    population_col: str = "population",
    count_col: str = "count",
    per: int = 1000,
    dp: int = 2,
) -> DataFrame:
    """J2 + P9 — join counts to a small dimension and normalize per capita.

    Reference: ``county_info[county]["population"]`` probe + round
    (cv-county-stats.py:57-66). The dimension is broadcast — the probe
    side never shuffles.
    """
    joined = counts.join(F.broadcast(dim), key_col, "inner")
    return joined.withColumn(
        "normalized_count",
        F.round(F.col(count_col) / (F.col(population_col) / F.lit(per)), dp),
    )


def growth_sim(
    last_date: Column,
    last_count: Column,
    growth_factor: Column,
) -> list[Column]:
    """G1 — geometric growth simulation, closed form.

    Reference (cv-stats.py:69-83) iterates ``count_i = count_{i-1} * gf``
    day by day on the driver. The closed form ``count_i = last * gf^i``
    turns the loop into ``explode(sequence(1, N))`` + ``pow`` — fully
    distributable, no driver loop. Returns (date, count) column exprs
    to select after exploding the day index as column ``i`` (the
    horizon lives in that sequence, not here).
    """
    i = F.col("i")
    return [
        F.date_add(last_date, i).alias("date"),
        (last_count * F.pow(growth_factor, i)).alias("count"),
    ]


def simulate_growth(seed: DataFrame, days: int) -> DataFrame:
    """Explode a 1-row seed (last_date, last_count, growth_factor) into a
    ``days``-row projected series. See ``growth_sim`` for the math."""
    return (
        seed.select(
            "*", F.explode(F.sequence(F.lit(1), F.lit(days))).alias("i")
        ).select(*growth_sim(F.col("last_date"), F.col("last_count"), F.col("growth_factor")))
    )
