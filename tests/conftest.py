from __future__ import annotations

import pytest

from covid_19_fl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("covid_19_fl_spark-tests", cpus="8")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def suite_run_report(spark):
    """ONE pass over every registered query at SF_SMOKE: build the
    frame, capture the executed-plan string (batch queries only —
    streaming queries execute on construction), run the count. Both
    whole-suite lints (every-query-runs, no-cartesian-products)
    consume this report instead of each paying their own full pass —
    the two passes cost 197 s + 215 s of the round-10 pytest wall
    (VERDICT r10 ask #4: the suite must fit the driver's verify
    window)."""
    from covid_19_fl_spark import suite as _suite

    report = {}
    for name, fn in _suite.QUERIES.items():
        rec = {"error": None, "plan": "", "count": None}
        try:
            df = fn(spark, SF_SMOKE)
            if not name.startswith("st_"):
                rec["plan"] = (
                    df._jdf.queryExecution().executedPlan().toString()
                )
            rec["count"] = df.count()
        except Exception as exc:  # noqa: BLE001 — surfaced by the lints
            rec["error"] = f"{type(exc).__name__}: {exc}"
        report[name] = rec
    return report
