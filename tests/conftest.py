from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SBP_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SBP_SF_ORACLE", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from samplebatchprocessing_spark.session import get_spark
    s = get_spark("sbp-tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "8g",
    })
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
