"""Shared pytest fixtures.

One SparkSession per test run (JVM start is the dominant cost), tuned via
prajna_spark.session.get_spark — AQE on, shuffle.partitions=32, UTC, as the
instructions require for local[*] testing.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from prajna_spark.session import get_spark, tune

    s = get_spark("prajna-spark-tests")
    tune(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
