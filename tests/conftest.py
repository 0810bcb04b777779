from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pos_data_insertion_etl_spark.compat import ensure_protobuf  # noqa: E402
from pos_data_insertion_etl_spark.session import get_session  # noqa: E402

# Must run before the session-scoped SparkSession exists: Python workers
# inherit the env captured at JVM launch, so the protobuf shim's
# PYTHONPATH export (needed by the stateful-v2 StateMessage protocol)
# has to be in place first. No-op when a real protobuf is installed.
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("pos-etl-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECT


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
