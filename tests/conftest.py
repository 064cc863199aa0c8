from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_aws_lakeformation_governed_datalake_demo_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", extra_conf={"spark.driver.memory": "8g"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def lake(tmp_path_factory):
    return str(tmp_path_factory.mktemp("lake"))


@pytest.fixture(scope="session")
def sf001_dir(sf_dir):
    """The sf0.01 fixture the similarity/PQ recall gates were calibrated
    on, derived as a sibling of the (env-overridable) test sf_dir rather
    than hardcoded (round-5 ADVICE): recall measurements are
    corpus-size-dependent, so the gates only hold at that scale."""
    cand = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.exists(os.path.join(cand, "embeddings.parquet")):
        pytest.skip(f"sf0.01 calibration fixture not found at {cand}")
    return cand
