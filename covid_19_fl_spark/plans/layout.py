"""Physical layout control (SURVEY §4.3 scale posture): bucketing for
co-located, shuffle-free joins, and date-partitioned writes for
partition pruning.

At 100 TB the dominant cost of a fact-fact join is the shuffle. If both
tables are bucketed (and sorted) on the join key with the same bucket
count, the SortMergeJoin reads co-located buckets directly — zero
Exchange in the plan. That is the difference between re-shuffling
100 TB per query and reading pre-organized data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+ sorted) managed table. Joins and
    aggregations keyed on ``bucket_key`` against tables with matching
    bucketing skip their Exchange (and with ``sort``, their Sort)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table_name)


def write_date_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Hive-style partitioned parquet: predicates on the partition
    columns prune directories at planning time (PartitionFilters in the
    scan, verified in tests/test_plans.py)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key —
    compiles to SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
