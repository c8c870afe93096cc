"""Shared pytest fixtures: one session-scoped local SparkSession
(small shuffle count + memory, mirroring the reference's test sizing at
/root/reference/tests/conftest.py:21-30)."""

from __future__ import annotations

import pytest

from lakehouse_architecture_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "lakehouse-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "2g",
            "spark.ui.enabled": "false",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
