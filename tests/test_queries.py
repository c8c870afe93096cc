"""Query-registry sanity at sf0.001: every registered query runs and
returns a well-formed DataFrame; every oracle key has a query; the entry
point produces the flagship result."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from lakehouse_architecture_spark.queries import ORACLES, QUERIES


def test_registry_shape():
    assert len(QUERIES) >= 40
    assert set(ORACLES) <= set(QUERIES)
    # the vast majority must be oracle-checked, not rows-only
    assert len(ORACLES) >= 0.8 * len(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_entry(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
