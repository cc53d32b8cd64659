from __future__ import annotations

import os

import pytest

# Keep local test runs snappy; override with TEST_SF_DIR / TEST_CPUS.
DEFAULT_SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from protarrow_spark.session import get_spark

    cpus = int(os.environ.get("TEST_CPUS", "8"))
    spark = get_spark("protarrow-spark-tests", cpus=cpus)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return DEFAULT_SF_DIR
