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


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """S4 hardened: PERMISSIVE CSV scan that captures malformed lines
    instead of failing the job or silently nulling them — the
    operational posture a 100 TB ingest needs (one mangled line in a
    million-file drop must quarantine, not kill the stage or corrupt
    the table). Returns ``(good, rejects)``: good rows without the
    capture column, rejects as the raw offending lines for triage.

    The reference's csv.reader loop (cv-csv.py:41-46) had the opposite
    failure mode: any short row raised IndexError and aborted the whole
    load. FAILFAST is still available by just using the plain readers.

    The one-pass split requires materializing the scan (Spark disallows
    filtering on only the internal corrupt-record column of a live
    file scan); at real scale point ``badRecordsPath`` at a quarantine
    prefix instead and skip the cache — the API contract stays the
    same."""
    capture = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(capture)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    from pyspark.sql import functions as F

    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    rejects = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, rejects
