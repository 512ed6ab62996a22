from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from jp_qcew_spark.session import get_spark

    s = get_spark(app_name="jp_qcew_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    # JP_TEST_SF_DIR=/root/testdata/sf0.01 mirrors the driver's correctness
    # scale; default stays sf0.001 for fast local iteration.
    return os.environ.get("JP_TEST_SF_DIR", SF_SMOKE)
