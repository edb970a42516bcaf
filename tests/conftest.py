from __future__ import annotations

import os
import sys

import pytest

try:
    from nfl_data_engineering_spark.session import get_spark
except ImportError:
    # not pip-installed (pip install -e .) and pytest invoked without the
    # repo root on sys.path (the bare `pytest` binary does not add cwd)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nfl_data_engineering_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
