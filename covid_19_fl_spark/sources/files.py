"""File sources (SURVEY §2.1 S4/S5).

The reference parses these with driver-side ``csv.reader`` / ``json.load``
row loops; here each is a declarative ``spark.read`` so the scan is
distributed, schema-checked, and prunable by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import schemas


def read_cases_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4 — positional 10-column case-line CSV, no header (cv-csv.py:41-46).

    Returns the *raw* string-typed frame (schemas.CASES_RAW_CSV);
    canonicalization to schemas.CASES happens in ``ingest.normalize_cases``
    so the parse step stays a pure pushdown-friendly scan.
    """
    return (
        spark.read.schema(schemas.CASES_RAW_CSV)
        .option("header", False)
        .csv(path)
    )


def read_daily_stats_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4 — positional daily-stats CSV (cv-csv.py:81-87).

    The committed reference fixture has 2 columns (date, tests) while the
    committed parser reads 3 — a stale-fixture bug noted in SURVEY §5.2.
    The engine declares the 2-column shape actually on disk; the
    3-column variant (with hospitalized) is a superset handled by the
    same schema plus a nullable column.
    """
    schema = T.StructType(
        [
            T.StructField("date_raw", T.StringType(), True),
            T.StructField("tests_raw", T.StringType(), True),
            T.StructField("hospitalized_raw", T.StringType(), True),
        ]
    )
    return spark.read.schema(schema).option("header", False).csv(path)


def read_counties_json(spark: SparkSession, path: str) -> DataFrame:
    """S5 — multiLine JSON array dimension, 67 counties (cv-api.py:233-240).

    67 rows — always below the broadcast threshold; join it with an
    explicit ``broadcast()`` hint anyway (ingest.attach_location) so the
    plan never degrades to a shuffle join if stats are missing.
    """
    return (
        spark.read.option("multiLine", True)
        .schema(schemas.COUNTIES)
        .json(path)
    )
