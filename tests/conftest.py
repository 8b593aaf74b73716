from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_aws_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)


#: Modules whose tests form the per-round drift-axis SWEEP tier (each is
#: a full-registry strict cross-engine sweep over a perturbed fixture —
#: hundreds of cases per axis, the bulk of suite wall-clock). Everything
#: else is the CORE tier that runs every session (< 15 min). See
#: pytest.ini for the two invocations (VERDICT r10 directive #7).
SWEEP_MODULES = {"test_const_drift", "test_null_drift", "test_session_axes"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SWEEP_MODULES:
            item.add_marker(pytest.mark.sweep)
