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
