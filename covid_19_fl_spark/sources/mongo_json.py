"""Mongo Extended JSON export source (SURVEY §5.2) — the reference's
dataset snapshots (datasets/json/*.json) are NDJSON dumps of the
``florida`` collection with Extended JSON type wrappers
(``{"$numberInt": "404"}``, ``{"$date": {"$numberLong": "…"}}``,
``{"$oid": "…"}``; datasets/json/032820202114.json:1).

The engine reads them distributed: a text scan, a fixed chain of
regexp rewrites that strip the wrappers (pure Column expressions —
the wrapper grammar is mechanical, no Python parsing), then one
``from_json`` against the declared schema. Used by the golden-replay
tests to field-compare engine output against the reference's own
persisted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas

# Unwrap order matters: $date nests a $numberLong, so it rewrites first.
_REWRITES = [
    (r'\{"\$date":\{"\$numberLong":"(-?\d+)"\}\}', "$1"),
    (r'\{"\$numberInt":"(-?\d+)"\}', "$1"),
    (r'\{"\$numberLong":"(-?\d+)"\}', "$1"),
    (r'\{"\$numberDouble":"(-?[0-9.eE+]+)"\}', "$1"),
    (r'\{"\$oid":"([0-9a-f]+)"\}', '"$1"'),
]

# Post-unwrap parse schema: date_added arrives as epoch millis.
_CASES_EXPORT = T.StructType(
    [
        T.StructField("_id", T.StringType(), True),
        T.StructField("case_number", T.LongType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("sex", T.StringType(), True),
        T.StructField("travel", T.StringType(), True),
        T.StructField("travel_detail", T.ArrayType(T.StringType()), True),
        T.StructField("contact_with_confirmed_case", T.StringType(), True),
        T.StructField("date_added", T.LongType(), True),
        T.StructField("deceased", T.StringType(), True),
        T.StructField("location", schemas.LOCATION, True),
        T.StructField("hospitalized", T.StringType(), True),
        T.StructField("ed_visit", T.StringType(), True),
    ]
)


def unwrap_extended_json(col: F.Column) -> F.Column:
    """Strip Mongo Extended JSON type wrappers from a raw JSON line."""
    out = col
    for pattern, replacement in _REWRITES:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def read_cases_export(spark: SparkSession, path: str) -> DataFrame:
    """Golden ``florida``-collection export → canonical cases frame
    (schemas.CASES plus the export's ``_id``)."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(unwrap_extended_json(F.col("value")), _CASES_EXPORT).alias("r")
    ).select("r.*")
    return parsed.withColumn(
        "date_added", F.timestamp_millis(F.col("date_added"))
    )
