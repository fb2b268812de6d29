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

from contextlib import contextmanager

from ..confs import scoped_conf

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


def _morton_spread(col, bits: int = 16):
    """Spread the low ``bits`` bits of an integer column so they occupy
    even bit positions (b15..b0 → positions 30,28,…,0) — the standard
    4-step mask-and-shift Morton expansion, as pure JVM bitwise column
    expressions (codegen'd in the scan/project stage, no UDF). The mask
    ladder handles at most 16 input bits; a wider request would
    silently discard bits 16+ and collide distinct high values, so it
    is rejected outright."""
    from pyspark.sql import functions as F

    if bits > 16:
        raise ValueError(f"Morton spread supports at most 16 bits, got {bits}")

    x = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16):
    """Morton (Z-order) interleave of two numeric columns, each min/max
    scaled to ``bits`` bits. Returns the key Column.

    The min/max pass is one tiny stats job (at 100 TB: a footer-only
    scan for native parquet stats, or a sampled approxQuantile for
    rank-scaling skewed columns — linear scaling is the simple default
    and right for roughly uniform keys like ids/dates)."""
    from pyspark.sql import functions as F

    assert len(cols) == 2, "zorder_key interleaves exactly two columns"
    stats = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in cols for n, f in (("mn", F.min), ("mx", F.max))]
    ).first()
    parts = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1
        scaled = ((F.col(c) - F.lit(mn)) / F.lit(span) * F.lit((1 << bits) - 1)).cast(
            "long"
        )
        parts.append(F.shiftleft(_morton_spread(scaled, bits), i))
    return parts[0].bitwiseOR(parts[1])


def write_zordered(
    df: DataFrame, path: str, cols: Sequence[str], files: int = 16, bits: int = 16
) -> None:
    """Z-order-cluster data files on TWO columns (the multi-dimension
    counterpart of ``write_clustered``): range-partition and sort by the
    Morton interleave of both keys, so every output file covers a
    compact tile in (col1, col2) space rather than a stripe along one
    axis.

    Why it matters at 100 TB: single-axis clustering makes footer-stat
    pruning perfect on one column and useless on the other; Z-ordering
    gives BOTH columns per-file min/max spans ~sqrt(files) narrower
    than the global range, so selective predicates on either (or both)
    skip most files. Verified in tests by reading written footers and
    measuring per-file span on each dimension.
    """
    z = zorder_key(df, cols, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
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


@contextmanager
def with_runtime_filters(spark: SparkSession):
    """Scope runtime (Bloom-filter) join pruning with thresholds low
    enough to fire at test scale. In a selective fact-dim join Catalyst
    injects `BloomFilterAggregate` on the filtered side and a
    `might_contain` predicate into the big side's scan stage — rows that
    cannot match are dropped BEFORE the shuffle, cutting exchange volume
    by the join's selectivity. At 100 TB this is the difference between
    shuffling the whole fact table and shuffling only the ~matching
    fraction. (Production defaults: creation side ≤ 10 MB broadcast-ish
    threshold, application side ≥ 10 GB scan — the knobs here exist so
    the plan shape is testable on MBs.)

    A CONTEXT MANAGER since round 10: optimizer thresholds tuned for a
    demonstration must not leak into every later query in the session
    (the conf-discipline rule confs.py documents); callers hold the
    scope open over the plan build AND its collect."""
    with scoped_conf(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        },
    ):
        yield
