"""Round-8 suite batch B — storage-layout locality operators: the two
IO-side levers that matter most at 100 TB, each under the exact-oracle
gate AND a plan-shape test (tests/test_r8_operators.py):

- ``x_bucketed_join_agg`` — co-located fact/dim join over BUCKETED
  tables: both sides are written once with ``bucketBy(8, key) +
  sortBy(key)`` (Spark's hash-bucketed data-source layout), so the
  join executes as a zero-exchange, zero-sort sort-merge join — the
  shuffle that dominates a 100 TB fact-fact join is paid once at
  write time and amortized over every subsequent query.
- ``x_partition_pruned_scan`` — dynamic partition pruning the storage
  way: events re-laid-out ``partitionBy(dt)``, then a one-day query
  whose scan lists exactly one partition directory (PartitionFilters
  in the plan, 1/30th of the bytes) instead of filtering 100 TB
  post-scan.

Both layouts materialize under /tmp once per sf corpus and are reused
across calls (bench warm passes, repeated driver runs); the catalog
registration is per-session (Spark's in-memory catalog), the parquet
layout on disk survives and is overwritten only when absent from the
catalog.

Reference tie-in: the reference re-reads its whole MongoDB collection
for every analytics run (cv-stats.py:38-51 ``pd.DataFrame(list(
cursor))``); these operators are the engine-side answer — lay the
data out once so every later query touches only the co-located or
pruned fraction.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .suite import _t, query

_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9A-Za-z]+", "_", os.path.basename(os.path.normpath(sf_dir)))


def bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, n: int = _BUCKETS
) -> DataFrame:
    """Return ``table`` as a hash-bucketed, per-bucket-sorted catalog
    table (written once per sf corpus under /tmp, external path).
    Both sides of a join bucketed by the join key with the same bucket
    count scan co-located — the SortMergeJoin planner elides BOTH the
    exchange and the sort. The in-memory catalog forgets tables across
    sessions; the data does not — re-registration overwrites in place
    (idempotent: same deterministic input, same layout)."""
    name = f"bkt_{table}_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(name):
        (
            _t(spark, sf_dir, table)
            .write.mode("overwrite")
            .option("path", f"/tmp/spark_graft_bucketed/{_tag(sf_dir)}/{table}")
            .bucketBy(n, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)


@query(
    "x_bucketed_join_agg",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) / 100.0, 2) AS total_spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def x_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders⋈customer per-segment revenue over CO-LOCATED bucketed
    tables: both sides bucketed by the join key (bucketBy 8 + sortBy),
    so the join plan is a SortMergeJoin with NO exchange and NO sort
    on either input (pinned by tests/test_r8_operators.py::
    test_bucketed_join_plan_has_no_exchange). Money is summed in
    integer cents (the repo-wide fixed-point pattern) so the oracle
    is order-independent.

    Scale: at 100 TB the bucketed layout turns every recurring
    fact/dim join on the bucket key into a map-side zip of
    pre-sorted bucket files — the one remaining exchange here is the
    bounded ≤|segments| aggregation."""
    orders = bucketed_table(spark, sf_dir, "orders", "o_custkey")
    cust = bucketed_table(spark, sf_dir, "customer", "c_custkey")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        orders.select("o_custkey", cents.alias("cents"))
        .join(cust.select("c_custkey", "c_mktsegment"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("cents").cast("long") / 100.0, 2).alias("total_spend"),
        )
    )


@query(
    "x_partition_pruned_scan",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) FROM events)
    GROUP BY 1
    """,
)
def x_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-day rollup against a ``partitionBy(dt)`` re-layout of the
    events table: the literal dt predicate becomes a PartitionFilter —
    the scan LISTS one directory out of 30 and never opens the other
    29 days' files (pinned by tests/test_r8_operators.py::
    test_partition_pruned_scan_lists_one_partition). The probe day is
    the corpus' min event date, computed as a 1-row scalar aggregate
    (bounded driver transfer by contract).

    Scale: partition pruning is THE first-order lever on a 100 TB
    time-series table — a day query on a year of data touches 0.3%
    of the bytes, before any row filter runs."""
    dest = f"/tmp/spark_graft_partitioned/{_tag(sf_dir)}/events"
    marker = os.path.join(dest, "_SPARK_GRAFT_READY")
    if not os.path.exists(marker):
        (
            _t(spark, sf_dir, "events")
            .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
            .write.partitionBy("dt")
            .mode("overwrite")
            .parquet(dest)
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    first_day = (
        _t(spark, sf_dir, "events")
        .agg(F.date_format(F.min(F.to_date("ts")), "yyyy-MM-dd"))
        .collect()[0][0]
    )
    return (
        spark.read.parquet(dest)
        .filter(F.col("dt") == first_day)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long")
                / 100.0,
                2,
            ).alias("total_value"),
        )
    )
