"""Declared schemas for the reference-shaped domain tables (SURVEY §1.2,
FIXTURES.md §A).

The reference is schema-on-write (dict literals into MongoDB, three
divergent shapes for the same logical table). The engine's contract is
a fixed StructType per table; ingest normalizes into it (e.g. the
reference's ``age: int ∪ 'Unknown' ∪ null`` mixed type canonicalizes to
nullable int — SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# GeoJSON Point (florida_counties.json shape)
LOCATION = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("coordinates", T.ArrayType(T.DoubleType()), True),
    ]
)

# Canonical case-line table (cv-api.py:107-120 output shape)
CASES = T.StructType(
    [
        T.StructField("case_number", T.LongType(), False),
        T.StructField("county", T.StringType(), False),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("sex", T.StringType(), True),
        T.StructField("travel", T.StringType(), True),
        T.StructField("travel_detail", T.ArrayType(T.StringType()), True),
        T.StructField("contact_with_confirmed_case", T.StringType(), True),
        T.StructField("date_added", T.TimestampType(), False),
        T.StructField("deceased", T.StringType(), True),
        T.StructField("location", LOCATION, True),
        T.StructField("hospitalized", T.StringType(), True),
        T.StructField("ed_visit", T.StringType(), True),
    ]
)

# Raw positional CSV case file (cv-csv.py:48-60; no header, 10 cols)
CASES_RAW_CSV = T.StructType(
    [
        T.StructField("case_number_raw", T.StringType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("age_raw", T.StringType(), True),
        T.StructField("sex", T.StringType(), True),
        T.StructField("travel", T.StringType(), True),
        T.StructField("travel_detail_raw", T.StringType(), True),
        T.StructField("contact_raw", T.StringType(), True),
        T.StructField("jurisdiction", T.StringType(), True),
        T.StructField("date_added_raw", T.StringType(), True),
        T.StructField("deceased", T.StringType(), True),
    ]
)

# State-level daily series (cv-api.py:155-165 ∪ cv-csv.py:88-93)
DAILY_STATS = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("tests", T.LongType(), True),
        T.StructField("new_tests", T.LongType(), True),
        T.StructField("deaths", T.LongType(), True),
        T.StructField("new_deaths", T.LongType(), True),
        T.StructField("deaths_growth", T.DoubleType(), True),
        T.StructField("hospitalized", T.LongType(), True),
        T.StructField("new_hospitalized", T.LongType(), True),
        T.StructField("hospitalized_growth", T.DoubleType(), True),
    ]
)

# Broadcast dimension (florida_counties.json; 67 rows)
COUNTIES = T.StructType(
    [
        T.StructField("county", T.StringType(), False),
        T.StructField("population", T.LongType(), False),
        T.StructField("location", LOCATION, False),
    ]
)

# Derived outputs (cv-stats.py:97-129, cv-county-stats.py:62-67)
GROWTH = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("count", T.DoubleType(), False),
        T.StructField("series", T.StringType(), False),
    ]
)

GROWTH_RATES = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("rate", T.DoubleType(), True),
    ]
)

TOP_COUNTIES = T.StructType(
    [
        T.StructField("county", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("normalized_count", T.DoubleType(), False),
    ]
)
