"""HTML-table source tests (SURVEY §2.1 S1) — recorded-fixture replay
of the reference's table shape (2 header rows, 5 data columns,
cv.py:50-69)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_19_fl_spark import ingest
from covid_19_fl_spark.sources.html import parse_html_tables, read_html_table

FIXTURE = """
<html><body>
<div><table>
  <tr><th colspan="5">Florida COVID-19 Cases</th></tr>
  <tr><th>Case</th><th>County</th><th>Age</th><th>Sex</th><th>Travel</th></tr>
  <tr><td>Case 1</td><td>Alachua</td><td>24</td><td>Male</td><td>Yes</td></tr>
  <tr><td>Case 2</td><td>Broward</td><td>Unknown</td><td>Female</td><td>No</td></tr>
  <tr><td>Case 3</td><td>Dade</td><td>57</td><td>Male</td><td>Under Investigation</td></tr>
</table></div>
<table><tr><td>other table</td></tr></table>
</body></html>
"""

SCHEMA = "case_raw string, county string, age_raw string, sex string, travel string"


def test_parse_all_tables():
    tables = parse_html_tables(FIXTURE)
    assert len(tables) == 2
    assert len(tables[0]) == 5  # 2 header + 3 data rows
    assert tables[1] == [["other table"]]


def test_read_html_table_skips_headers(spark):
    df = read_html_table(spark, FIXTURE, SCHEMA, table_index=0, skip_rows=2)
    assert df.count() == 3
    rows = df.orderBy("case_raw").collect()
    assert rows[0].county == "Alachua" and rows[0].travel == "Yes"


def test_html_rows_canonicalize_like_reference(spark):
    """The P1 digit-strip cast turns 'Case 1' → 1 and 'Unknown' age →
    null — the same normalize functions as the CSV path (cv.py:61-63)."""
    from covid_19_fl_spark.functions import normalize as N

    df = read_html_table(spark, FIXTURE, SCHEMA)
    out = df.select(
        N.digits_to_int("case_raw").alias("case_number"),
        N.digits_to_int("age_raw").alias("age"),
        "county",
    )
    got = {r.case_number: r.age for r in out.collect()}
    assert got == {1: 24, 2: None, 3: 57}
