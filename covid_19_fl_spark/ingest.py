"""Ingest canonicalization pipelines (SURVEY §3 / §7.1 M2+M5).

Each reference ingest loop (cv-csv.py:41-61, cv-api.py:100-121) becomes
one pure DataFrame→DataFrame function that maps the raw source shape
into the engine's declared schema (schemas.CASES). Everything is
``Column`` expressions from functions.normalize — no UDFs, whole-stage
codegen end to end — and the county-location lookup is an explicit
broadcast left join (SURVEY §2.4 J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import normalize as N


def normalize_cases(raw: DataFrame) -> DataFrame:
    """Raw positional CSV frame (schemas.CASES_RAW_CSV) → canonical
    case-line columns (cv-csv.py:48-60's row loop, declaratively).

    Semantics deltas vs the reference, per SURVEY §1.2: non-numeric age
    ('Unknown') → null int; travel_detail tokens trimmed and title-cased
    only when longer than 2 chars (preserves 'NY'/'FL' state codes).
    """
    return raw.select(
        N.digits_to_int("case_number_raw").cast("long").alias("case_number"),
        F.col("county"),
        N.digits_to_int("age_raw").alias("age"),
        F.col("sex"),
        F.col("travel"),
        F.when(
            F.col("travel_detail_raw").isNotNull() & (F.trim("travel_detail_raw") != ""),
            N.split_title_array("travel_detail_raw"),
        ).alias("travel_detail"),
        F.col("contact_raw").alias("contact_with_confirmed_case"),
        F.col("jurisdiction"),
        N.parse_date("date_added_raw", "M/d/yy").alias("date_added"),
        F.col("deceased"),
    )


def normalize_daily_stats(raw: DataFrame) -> DataFrame:
    """Daily-stats CSV → (date, tests, new_tests) with W4's running
    previous-value delta (cv-csv.py:86-94's loop-carried ``prev_tests``,
    as a lag window over the tiny post-parse series)."""
    from pyspark.sql import Window

    parsed = raw.select(
        N.parse_date("date_raw", "M/d/yy").alias("date"),
        N.digits_to_int("tests_raw").cast("long").alias("tests"),
        N.digits_to_int("hospitalized_raw").cast("long").alias("hospitalized"),
    )
    w = Window.orderBy("date")
    return parsed.withColumn(
        "new_tests", F.col("tests") - F.lag("tests", 1, 0).over(w)
    )


def split_valid(df: DataFrame, *required_cols: str) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: rows where every ``required_col`` parsed
    non-null vs. the quarantine remainder. The tolerant parse functions
    (normalize.parse_date, digits_to_int) turn malformed input into
    nulls; this routes those rows to a reject sink instead of silently
    keeping (or fatally raising on) them."""
    import functools
    import operator

    ok = functools.reduce(
        operator.and_, [F.col(c).isNotNull() for c in required_cols]
    )
    return df.filter(ok), df.filter(~ok)


def attach_location(cases: DataFrame, counties: DataFrame) -> DataFrame:
    """J1 — broadcast left-outer lookup join: county → GeoJSON location
    (the reference's ``locations.get(county, None)`` probe, cv-api.py:117;
    cv-csv.py:59). Null on miss, exactly the dict.get(None) semantics."""
    dim = F.broadcast(counties.select("county", "location"))
    return cases.join(dim, on="county", how="left")


def attach_population(per_county: DataFrame, counties: DataFrame) -> DataFrame:
    """J2 — broadcast inner lookup join: county → population
    (cv-county-stats.py:57-60; KeyError-on-miss ⇒ inner)."""
    dim = F.broadcast(counties.select("county", "population"))
    return per_county.join(dim, on="county", how="inner")
