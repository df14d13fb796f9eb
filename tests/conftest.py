from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timing_explorer_spark.compat import ensure_protobuf  # noqa: E402
from timing_explorer_spark.session import get_spark  # noqa: E402

# Must run BEFORE any SparkSession exists: Python workers inherit PYTHONPATH
# from the JVM's launch environment, so the vendored google.protobuf shim
# (used by the transformWithStateInPandas state protocol when the real
# runtime is absent) has to be on PYTHONPATH by then.
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="timing-explorer-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
