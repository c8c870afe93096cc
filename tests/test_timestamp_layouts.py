"""Regression guard for events.parquet timestamp-type drift.

The driver has shipped events.parquet with three different ``ts``
encodings across rounds: ns-precision INT64, µs TIMESTAMP_NTZ, and
tz-aware TIMESTAMP. Round 2 ended with every unix_millis() call site
throwing DATATYPE_MISMATCH when the layout flipped to NTZ — this module
pins all three layouts so any future drift fails here first, not in the
driver's correctness gate.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from lakehouse_architecture_spark.queries.advanced import asof_join_purchase_click
from lakehouse_architecture_spark.queries.events import (
    events_hourly_by_type,
    events_sessionization,
)
from lakehouse_architecture_spark.sources.tables import load_table

# Two users; user 1 has a >30 min gap (new session), user 2 one session.
# Clicks precede purchases so the as-of join finds a prior click.
_BASE = dt.datetime(2025, 5, 1, 12, 0, 0)
_ROWS = [
    (1, _BASE, 1, "click", 1.0, "{}"),
    (2, _BASE + dt.timedelta(minutes=5), 1, "purchase", 9.9, "{}"),
    (3, _BASE + dt.timedelta(minutes=50), 1, "click", 1.0, "{}"),
    (4, _BASE + dt.timedelta(minutes=55), 1, "purchase", 5.0, "{}"),
    (5, _BASE, 2, "click", 1.0, "{}"),
    (6, _BASE + dt.timedelta(minutes=10), 2, "purchase", 3.0, "{}"),
]

_LAYOUTS = {
    # what the driver ships today
    "ntz_us": pa.timestamp("us"),
    # what it shipped in rounds 1-2 (Spark reads via nanosAsLong)
    "ns": pa.timestamp("ns"),
    # the plain tz-aware layout Spark maps straight to TIMESTAMP
    "tz_us": pa.timestamp("us", tz="UTC"),
}


def _write_events(tmp_path, ts_type) -> str:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS]).cast(ts_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize("layout", sorted(_LAYOUTS))
def test_load_events_normalizes_ts_to_timestamp(spark, tmp_path, layout):
    sf_dir = _write_events(tmp_path, _LAYOUTS[layout])
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"{layout}: ts must normalize to TIMESTAMP, got {ev.schema['ts'].dataType}"
    )
    # values identical across layouts (UTC session tz makes casts lossless)
    millis = sorted(
        r[0]
        for r in ev.selectExpr("unix_millis(ts)").collect()
    )
    expected = sorted(int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1000) for r in _ROWS)
    assert millis == expected


@pytest.mark.parametrize("layout", sorted(_LAYOUTS))
def test_events_queries_run_on_every_layout(spark, tmp_path, layout):
    sf_dir = _write_events(tmp_path, _LAYOUTS[layout])

    sessions = events_sessionization(spark, sf_dir).collect()
    # user 1 has two sessions (50-min gap), user 2 one
    per_user = {r["user_id"]: r["n_sessions"] for r in sessions}
    assert per_user == {1: 2, 2: 1}

    asof = asof_join_purchase_click(spark, sf_dir)
    assert asof.count() == 3  # every purchase has a prior click

    hourly = events_hourly_by_type(spark, sf_dir)
    assert hourly.count() > 0


def test_loader_pins_utc_on_non_utc_session(spark, tmp_path):
    """The driver's harness uses a plain SparkSession; if the host tz
    weren't UTC the NTZ cast would shift values. The loader must pin the
    session tz itself."""
    sf_dir = _write_events(tmp_path, _LAYOUTS["ntz_us"])
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        millis = sorted(r[0] for r in ev.selectExpr("unix_millis(ts)").collect())
        expected = sorted(
            int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
            for r in _ROWS
        )
        assert millis == expected
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
