"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (daily cumulative order curve, the
reference's epidemic-curve plan shape, cv-stats.py:54-56) on sf0.001.

``queries()`` / ``oracle_sql()`` — the full operator suite from
SURVEY.md §2, registered in ``covid_19_fl_spark.suite``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_19_fl_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.QUERIES["w1_cumulative_daily"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLES)
