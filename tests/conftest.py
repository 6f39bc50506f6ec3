from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audios_to_dataset_spark.session import get_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_session("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
