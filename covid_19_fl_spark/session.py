"""SparkSession factory.

One place to encode the engine's execution posture (SURVEY.md §4.3):
AQE on (runtime shuffle coalescing + skew-join handling), UTC session
timezone (the reference used local wall-clock — cv-api.py:115 — which we
canonicalize to UTC), Arrow for any pandas interchange, and a shuffle
partition count sized for the local test harness (AQE coalesces down, so
this is an upper bound, not a fixed fan-out; on a real cluster you'd
raise it and let AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "covid_19_fl_spark", cpus: str | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Upper bound on shuffle fan-out; AQE coalesces small partitions.
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # Managed tables (bucketing) land outside the repo tree.
        .config("spark.sql.warehouse.dir", "/tmp/covid_19_fl_spark-warehouse")
        # Python Data Source pushFilters (REST source F5 pushdown).
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
