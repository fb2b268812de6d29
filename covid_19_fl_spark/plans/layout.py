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


def write_clustered(
    df: DataFrame, path: str, cluster_cols: Sequence[str], files: int = 8
) -> None:
    """Range-cluster data files on ``cluster_cols`` (the open-source
    stand-in for Delta OPTIMIZE ZORDER on a single sort axis):
    ``repartitionByRange`` gives each output file a disjoint key range,
    ``sortWithinPartitions`` tightens every parquet row-group's min/max
    stats inside the file.

    Why it matters at 100 TB: a pushed predicate on the cluster column
    then skips whole files (and row groups within files) via footer
    stats — the scan does I/O proportional to the selected key range,
    not the table. Verified in tests by reading the written footers:
    per-file [min, max] ranges must not overlap.
    """
    (
        df.repartitionByRange(files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def clustered_file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer statistics
    — the metadata a clustered scan prunes against. Driver-side footer
    read only; no data I/O."""
    import glob
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == column
                )
            )
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


def with_runtime_filters(spark: SparkSession) -> None:
    """Enable runtime (Bloom-filter) join pruning with thresholds low
    enough to fire at test scale. In a selective fact-dim join Catalyst
    injects `BloomFilterAggregate` on the filtered side and a
    `might_contain` predicate into the big side's scan stage — rows that
    cannot match are dropped BEFORE the shuffle, cutting exchange volume
    by the join's selectivity. At 100 TB this is the difference between
    shuffling the whole fact table and shuffling only the ~matching
    fraction. (Production defaults: creation side ≤ 10 MB broadcast-ish
    threshold, application side ≥ 10 GB scan — the knobs here exist so
    the plan shape is testable on MBs.)"""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
