"""SQL entry surface — the corpus as temp views for ad-hoc spark.sql.

The reference's only "query language" was MongoDB find/aggregate specs
embedded in Python (SURVEY §2.1 S6-S8). The engine exposes the full
declarative surface instead: register the tables once, then any ANSI
query plans through the same Catalyst pipeline as the DataFrame suite
(identical optimization — views are lazy plan aliases, not copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import tables


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create (or replace) one temp view per corpus table; returns the
    registered names. Views carry the same pushdown-friendly scans as
    tables.load — filter/projection pruning reaches the parquet reader
    through a view exactly as through the DataFrame API."""
    for name in tables.TABLE_NAMES:
        tables.load(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(tables.TABLE_NAMES)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the corpus views and run one ANSI SQL query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
