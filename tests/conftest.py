"""Shared pytest fixtures: one session-scoped local SparkSession
(small shuffle count + memory, mirroring the reference's test sizing at
/root/reference/tests/conftest.py:21-30)."""

from __future__ import annotations

import os

import pytest

from lakehouse_architecture_spark.session import get_spark

# CI (or any machine without the driver-generated tables) points this
# at tools/gen_testdata.py output; the schemas and value domains match.
SF_SMALL = os.environ.get("LAKEHOUSE_TESTDATA_DIR", "/root/testdata/sf0.001")


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
