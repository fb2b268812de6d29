"""Query suite registry — the driver-contract surface.

Every operator from SURVEY.md §2 is exposed here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a matching DuckDB oracle SQL string. The driver runs
both at sf0.01 and compares row count + schema + order-insensitive
value hash, so every computed column is identically aliased on both
sides, date-like outputs are cast to DATE on both sides, and
order-sensitive double sums go through exact DECIMAL accumulation
before a final cast to double (deterministic regardless of partition
order — a requirement at 100 TB, not just for the oracle).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from . import tables
from .confs import ensure_session_defaults
from .operators import analytics

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def drain_persisted_state(spark: SparkSession) -> None:
    """Release every cache/persist/localCheckpoint registration left in
    the session (round-11 cache-lifecycle fix).

    Round 10 added ~20 within-query ``.cache()``/``localCheckpoint``
    sites with zero unpersists in batch paths; Spark's CacheManager
    matches by logical plan and holds every registration for the
    session's life, so a 342-query × 3-pass bench session accumulated
    hundreds of cached plans + checkpoint block sets, degrading even
    untouched queries 1.5-5× late in the suite (driver suite total
    292.99 s r9 → 433.35 s r10; the bench's own self-triage showed
    flagged queries clearing once the suite drained). Per-query scope
    keeps the within-query sharing those sites exist for and drops the
    cross-query residue.

    Safe ONLY between top-level queries: unpersisting a localCheckpoint
    frees blocks that its (lineage-truncated) frame cannot recompute,
    so this must never run while a previous query's undrained frame is
    still live — which is why it is called at registered-query ENTRY
    (the previous query has been consumed by then in every sequential
    harness: bench, full sweep, gate check, the driver session)."""
    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001 — drain is best-effort hygiene
        pass
    try:
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in jrdds.values():
            jrdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass


# Reentrancy latch: entry() / tests may compose registered queries; the
# drain must only fire at the OUTERMOST registered-query entry, never
# mid-build (it would free a frame the outer query still references).
_IN_QUERY = False


def query(name: str, oracle: str | None = None):
    """Register a suite query; ``oracle`` is DuckDB-ANSI SQL or None for
    rows-only checks (non-SQL-expressible operators).

    The registered callable pins ``confs.SESSION_DEFAULTS`` before the
    query body runs (round-10 determinism fix): every query starts from
    the SAME session-conf state, so no query's result can depend on
    which queries ran before it in a long driver/bench session. It also
    drains the PREVIOUS query's cache/checkpoint registrations
    (round-11 cache-lifecycle fix — see ``drain_persisted_state``), so
    session storage state is per-query scoped exactly like session
    confs. The undecorated function is returned so intra-suite
    composition (e.g. x_modularity calling x_label_propagation)
    doesn't re-pin or re-drain.
    """

    def deco(fn):
        @functools.wraps(fn)
        def pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
            global _IN_QUERY
            ensure_session_defaults(spark)
            if _IN_QUERY:
                return fn(spark, sf_dir)
            drain_persisted_state(spark)
            _IN_QUERY = True
            try:
                return fn(spark, sf_dir)
            finally:
                _IN_QUERY = False

        QUERIES[name] = pinned
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


# Hard ceiling for the two deliberately-uncapped lossless similarity
# self-joins (dd_jaccard_prefix_join, dd_edit_distance_join). They are
# oracle twins whose OUTPUT is expected-quadratic on duplicate-dense
# corpora; the capped dd_*_topm_join twins are the production path.
# The ceiling is far above every test corpus (sf0.1 = 5k docs, the
# 100x scale replica = 500k) but trips LOUDLY before anyone schedules
# an answer-sized join on a production corpus by accident.
QUADRATIC_GUARD_MAX_ROWS = 2_000_000


def guard_quadratic(df: DataFrame, query_name: str) -> DataFrame:
    """Refuse to run an expected-quadratic lossless join above
    QUADRATIC_GUARD_MAX_ROWS input rows (one cheap count job — linear,
    column-pruned — against a potentially answer-sized output)."""
    n = df.count()
    if n > QUADRATIC_GUARD_MAX_ROWS:
        raise RuntimeError(
            f"{query_name}: corpus has {n:,} rows, above the "
            f"{QUADRATIC_GUARD_MAX_ROWS:,}-row quadratic guard. This "
            "query is the uncapped LOSSLESS oracle twin (output can be "
            "quadratic in duplicate mass); run the capped top-m "
            "production twin instead (dd_jaccard_topm_join / "
            "dd_edit_topm_join)."
        )
    return df


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "a1_global_max",
    oracle="SELECT COALESCE(MAX(o_orderkey), 0) AS max_orderkey FROM orders",
)
def a1_global_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — global max with empty-default (cv.py:93-107's Mongo $group $max).

    Catalyst partial+final HashAggregate: each partition computes its own
    max, one scalar per partition crosses the exchange.
    """
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(F.coalesce(F.max("o_orderkey"), F.lit(0)).alias("max_orderkey"))


@query(
    "a2_daily_counts",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           COUNT(o_orderkey) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def a2_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — count by single key (cv-stats.py:55 groupby(date).count()).

    Map-side partial count per partition, then a shuffle of |dates|
    pre-combined rows — fact cardinality never crosses the exchange.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "a3_counts_by_composite_key",
    oracle="""
    SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS order_date,
           COUNT(o_orderkey) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
)
def a3_counts_by_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — count by composite key (cv-county-stats.py:55)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_orderpriority", F.col("o_orderdate").cast("date").alias("order_date")
        )
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "a4_top5_by_count",
    oracle="""
    SELECT o_custkey, COUNT(o_orderkey) AS count
    FROM orders GROUP BY 1
    ORDER BY count DESC, o_custkey ASC LIMIT 5
    """,
)
def a4_top5_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O3 — top-K by aggregate (cv-county-stats.py:71-73 nlargest(5)).

    Canonical tie-break (count desc, key asc) per SURVEY §7.3; compiles
    to TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    orders = _t(spark, sf_dir, "orders")
    return analytics.top_k_by_count(
        orders.select(F.col("o_custkey"), F.col("o_orderkey")), "o_custkey", 5, "o_orderkey"
    )


@query(
    "a5_mean_tail_rates",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(o_orderkey) AS n
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT order_date,
             SUM(n) OVER (ORDER BY order_date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      FROM daily
    ), rates AS (
      SELECT order_date,
             CAST(cum_n AS DOUBLE) / LAG(cum_n) OVER (ORDER BY order_date) AS rate
      FROM cum
    )
    SELECT ROUND(AVG(rate), 12) AS mean_rate
    FROM (SELECT rate FROM rates WHERE rate IS NOT NULL
          ORDER BY order_date DESC LIMIT 5) t
    """,
)
def a5_mean_tail_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — mean of the trailing-5 growth ratios (cv-stats.py:107).

    The window chain runs on the post-aggregation daily series (≤ one
    row per date), so the unpartitioned windows are cheap by design.
    """
    rates = _growth_rate_series(spark, sf_dir)
    tail = analytics.tail_n(rates.filter(F.col("rate").isNotNull()), "order_date", 5)
    # Rounded to 12dp: engines may differ in the final ulp of a float AVG.
    return tail.agg(F.round(F.avg("rate"), 12).alias("mean_rate"))


@query("a6_table_cardinality", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def a6_table_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — exact table cardinality (cv-api.py:185 estimated_document_count)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.6)
# ---------------------------------------------------------------------------


def _daily_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared daily-count + cumulative-sum series over orders (the
    epidemic-curve plan shape of cv-stats.py:54-56)."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return analytics.cumulative_sum(daily, "order_date", "n_orders", out_col="cum_orders")


_CUM_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             COUNT(o_orderkey) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT order_date, n_orders,
           CAST(SUM(n_orders) OVER (ORDER BY order_date
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_orders
    FROM daily
"""


@query("w1_cumulative_daily", oracle=_CUM_SQL)
def w1_cumulative_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — flagship: running cumulative sum of daily counts
    (cv-stats.py:54-56's epidemic curve, over orders)."""
    return _daily_cum(spark, sf_dir)


@query(
    "w2_cumulative_by_group",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS order_date,
             COUNT(o_orderkey) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, order_date, n_orders,
           CAST(SUM(n_orders) OVER (PARTITION BY o_orderpriority ORDER BY order_date
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_orders
    FROM daily
    """,
)
def w2_cumulative_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — partitioned cumulative sum (cv-county-stats.py:60): the
    window partition key keeps work distributed across executors."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            "o_orderpriority", F.col("o_orderdate").cast("date").alias("order_date")
        )
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return analytics.cumulative_sum(
        daily, "order_date", "n_orders", partition_cols=["o_orderpriority"], out_col="cum_orders"
    )


def _growth_rate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    cum = _daily_cum(spark, sf_dir).select("order_date", "cum_orders")
    return analytics.growth_rates(cum, "order_date", "cum_orders", out_col="rate").select(
        "order_date", "rate"
    )


_RATES_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(o_orderkey) AS n
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT order_date,
             SUM(n) OVER (ORDER BY order_date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_orders
      FROM daily
    )
    SELECT order_date,
           CAST(cum_orders AS DOUBLE) / LAG(cum_orders) OVER (ORDER BY order_date) AS rate
    FROM cum
"""


@query("w3_growth_rates", oracle=_RATES_SQL)
def w3_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — lag-ratio growth rate, null first row (cv-stats.py:59-66)."""
    return _growth_rate_series(spark, sf_dir)


@query(
    "w4_daily_delta",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS event_date,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1
    )
    SELECT event_date,
           total_value,
           total_value - LAG(total_value, 1, 0.0) OVER (ORDER BY event_date) AS new_value
    FROM daily
    """,
)
def w4_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — previous-value delta with seed 0 (cv-csv.py:86-94).

    Double sums go through DECIMAL so the aggregate is exact and
    order-independent — deterministic under any partitioning.
    """
    events = _t(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.col("ts").cast("date").alias("event_date"))
        .agg(F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total_value"))
    )
    return analytics.daily_delta(daily, "event_date", "total_value", out_col="new_value")


@query(
    "w5_tail_n",
    oracle=f"""
    WITH rates AS ({_RATES_SQL})
    SELECT order_date, rate FROM
      (SELECT * FROM rates ORDER BY order_date DESC LIMIT 5) t
    ORDER BY order_date
    """,
)
def w5_tail_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — tail-N of an ordered series (cv-stats.py:63-66)."""
    return analytics.tail_n(_growth_rate_series(spark, sf_dir), "order_date", 5)


@query(
    "w6_last_row",
    oracle=f"""
    WITH cum AS ({_CUM_SQL})
    SELECT order_date AS last_date, cum_orders AS last_count
    FROM cum ORDER BY order_date DESC LIMIT 1
    """,
)
def w6_last_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — last element of an ordered series (cv-stats.py:73-74)."""
    cum = _daily_cum(spark, sf_dir)
    return analytics.last_row(cum, "order_date").select(
        F.col("order_date").alias("last_date"), F.col("cum_orders").alias("last_count")
    )


# ---------------------------------------------------------------------------
# Register the rest of the suite (decorator side effects on import).
# Placed at the bottom: these modules import `query`/`_t` from here.
# ---------------------------------------------------------------------------

from . import suite_relational  # noqa: E402,F401
from . import suite_transforms  # noqa: E402,F401
from . import suite_tpch  # noqa: E402,F401
from . import suite_llmops  # noqa: E402,F401
from . import suite_advanced  # noqa: E402,F401
from . import suite_r3  # noqa: E402,F401
from . import suite_r4  # noqa: E402,F401
from . import suite_r5  # noqa: E402,F401
from . import suite_r5b  # noqa: E402,F401
from . import suite_r5c  # noqa: E402,F401
from . import suite_r5d  # noqa: E402,F401
from . import suite_r5e  # noqa: E402,F401
from . import suite_r5f  # noqa: E402,F401
from . import suite_r5g  # noqa: E402,F401
from . import suite_r5h  # noqa: E402,F401
from . import suite_r6  # noqa: E402,F401
from . import suite_r6b  # noqa: E402,F401
from . import suite_r7  # noqa: E402,F401
from . import suite_r7b  # noqa: E402,F401
from . import suite_r7c  # noqa: E402,F401
from . import suite_r7d  # noqa: E402,F401
from . import suite_r7e  # noqa: E402,F401
from . import suite_r7f  # noqa: E402,F401
from . import suite_r7g  # noqa: E402,F401
from . import suite_r8  # noqa: E402,F401
from . import suite_r8b  # noqa: E402,F401
from . import suite_r9  # noqa: E402,F401
