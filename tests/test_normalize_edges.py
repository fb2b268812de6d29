"""Edge-case contracts for the canonicalization layer: malformed input
nulls-and-quarantines instead of aborting the job (or silently passing
garbage) — the behavior that matters when one bad row hides in 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import ingest
from covid_19_fl_spark.functions import normalize as N


def test_parse_date_tolerant_by_default(spark):
    df = spark.createDataFrame(
        [("3/13/20",), ("13/45/99",), ("not a date",), ("",), (None,)], "s string"
    )
    out = [r.d for r in df.select(N.parse_date("s").alias("d")).collect()]
    assert str(out[0]) == "2020-03-13"
    assert out[1:] == [None, None, None, None]


def test_parse_date_strict_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkUpgradeException

    df = spark.createDataFrame([("13/45/99",)], "s string")
    with pytest.raises(Exception):
        df.select(N.parse_date("s", strict=True).alias("d")).collect()


def test_digits_to_int_edges(spark):
    df = spark.createDataFrame(
        [("Case 42",), ("abc",), ("",), (None,), ("a1b2c3",), ("Unknown",)], "s string"
    )
    out = [r[0] for r in df.select(N.digits_to_int("s")).collect()]
    assert out == [42, None, None, None, 123, None]


def test_na_sentinels(spark):
    df = spark.createDataFrame([("NA",), ("Yes",), (None,)], "s string")
    assert [r[0] for r in df.select(N.na_to_null("s")).collect()] == [None, "Yes", None]
    assert [r[0] for r in df.select(N.na_to_default("s", "No")).collect()] == [
        "No", "Yes", "No",
    ]


def test_split_title_array_edges(spark):
    df = spark.createDataFrame([("",), (";",), ("ny; canada",)], "s string")
    out = [r[0] for r in df.select(N.split_title_array("s")).collect()]
    assert out[0] == [""]            # empty string → single empty token
    assert out[1] == ["", ""]        # bare separator
    assert out[2] == ["ny", "Canada"]  # 2-char token preserved verbatim


def test_guarded_ratio_zero_division(spark):
    df = spark.createDataFrame([(10.0, 2.0), (10.0, 0.0), (10.0, -1.0)], "a double, b double")
    out = [r[0] for r in df.select(N.guarded_ratio(F.col("a"), F.col("b"))).collect()]
    assert out == [5.0, 0.0, 0.0]  # cv-api.py:161 semantics: den <= 0 → 0


def test_split_valid_quarantine(spark):
    raw = spark.createDataFrame(
        [("1", "3/13/20"), ("2", "99/99/99"), ("x", "3/14/20")],
        "case_raw string, date_raw string",
    )
    parsed = raw.select(
        N.digits_to_int("case_raw").alias("case_number"),
        N.parse_date("date_raw").alias("date_added"),
        "case_raw",
        "date_raw",
    )
    good, rejected = ingest.split_valid(parsed, "case_number", "date_added")
    assert [r.case_number for r in good.collect()] == [1]
    rej = rejected.collect()
    assert len(rej) == 2  # bad date and non-numeric id both quarantined
    assert {r.case_raw for r in rej} == {"2", "x"}
