from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from syncflux_spark.session import get_spark

    s = get_spark("syncflux-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from syncflux_spark.sources.parquet import load_table

    return load_table(spark, sf_dir, "events")
