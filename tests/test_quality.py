"""quality.py checks must count violations exactly on dirty data."""

from __future__ import annotations

from covid_19_fl_spark import quality as dq


def _report(checks):
    return {r["check"]: r["violations"] for r in dq.audit(checks).collect()}


def test_checks_catch_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "OK"),
            (1, "b", -5.0, "OK"),     # dup id, out-of-range
            (2, None, 200.0, "BAD"),  # null name, out-of-range, bad status
            (3, "d", 50.0, None),     # null status -> domain violation
        ],
        "id int, name string, amount double, status string",
    )
    parent = spark.createDataFrame([(1,), (3,)], "id int")
    rep = _report(
        [
            dq.unique_key(df, ["id"]),
            dq.not_null(df, "name"),
            dq.in_range(df, "amount", 0, 100),
            dq.accepted_values(df, "status", ["OK"]),
            dq.referential(df, "id", parent, "id"),
        ]
    )
    assert rep == {
        "id_unique": 1,
        "name_not_null": 1,
        "amount_in_range": 2,
        "status_accepted_values": 2,
        "id_referential": 1,
    }


def test_clean_data_reports_zero(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    rep = _report([dq.unique_key(df, ["id"]), dq.not_null(df, "name")])
    assert rep == {"id_unique": 0, "name_not_null": 0}
