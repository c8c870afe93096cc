"""Regression tests for the measuring instrument itself.

The r7 judge proved the local oracle gate's float normalization
(`%.9g`) could not see a real cross-engine divergence the driver's
exact hash caught (orders_trend_by_segment: intercepts differing at
7e-4 compared equal). The gate now compares at full precision; these
tests pin that contract, plus the r8 cross-engine decimal conversion
doctrine the fixes rely on (the "2^53 rule"), so neither can silently
regress. No SparkSession needed — pure Python + DuckDB.
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from check_oracle import _norm_cell, _row_set  # noqa: E402


def test_norm_cell_distinguishes_last_ulp():
    a = -2768799.774066
    b = -2768799.773396  # the r7 driver-red intercept pair
    assert _norm_cell(a) != _norm_cell(b)
    x = 0.23626384400008613
    y = math.nextafter(x, 0.0)  # exactly one ulp apart
    assert _norm_cell(x) != _norm_cell(y)


def test_norm_cell_roundtrips_and_specials():
    for v in [0.1, 1e300, -1e-300, 12345.678901234567]:
        assert float(_norm_cell(v)) == v
    assert _norm_cell(float("nan")) == "NaN"
    # -0.0 and +0.0 hash differently at the driver; the gate must be
    # at least as strict (queries normalize with ROUND(x,6)+0.0)
    assert _norm_cell(-0.0) != _norm_cell(0.0)
    assert _norm_cell(None) == "NULL"
    assert _norm_cell(True) == "1"
    assert _norm_cell(3) == "3"


def test_row_set_is_column_order_insensitive():
    rows_a = [(1, 2.5), (3, 4.5)]
    rows_b = [(2.5, 1), (4.5, 3)]
    assert _row_set(rows_a, ["k", "v"]) == _row_set(rows_b, ["v", "k"])


def test_duckdb_decimal_to_double_exact_below_2_53():
    """The r8 doctrine: DuckDB's decimal->double cast matches the
    correctly-rounded (JVM-equivalent) conversion whenever the
    UNSCALED value fits in 2^53 — which is why every compared surface
    now rounds wide decimal sums to a safe scale before the one cast.
    Pin it with values whose unscaled forms sit just inside the bound."""
    con = duckdb.connect()
    for s in [
        "8888777666555.444",      # scale 3, unscaled ~8.9e15 < 2^53
        "123456789.012345",        # scale 6, unscaled ~1.2e14
        "-999999999.999999",       # scale 6 boundary-ish
        "0.000001",
        "42.000000",
    ]:
        py = float(decimal.Decimal(s))
        db = con.execute(
            f"SELECT CAST(CAST('{s}' AS DECIMAL(30,6)) AS DOUBLE)"
            if len(s.split(".")[1]) <= 6
            else f"SELECT CAST(CAST('{s}' AS DECIMAL(30,3)) AS DOUBLE)"
        ).fetchone()[0]
        assert py == db, (s, py, db)


def test_duckdb_decimal_round_matches_half_away_from_zero():
    """Decimal ROUND (used before every wide-sum double cast) must be
    exact digit arithmetic with away-from-zero ties on both engines;
    Spark's HALF_UP is away-from-zero, so DuckDB must agree."""
    con = duckdb.connect()
    cases = [
        ("1.0000005", 6, decimal.Decimal("1.000001")),
        ("-1.0000005", 6, decimal.Decimal("-1.000001")),
        ("2.9999994999", 6, decimal.Decimal("2.999999")),
        ("123.4567891", 6, decimal.Decimal("123.456789")),
    ]
    for s, k, want in cases:
        got = con.execute(
            f"SELECT ROUND(CAST('{s}' AS DECIMAL(30,10)), {k})"
        ).fetchone()[0]
        assert decimal.Decimal(got) == want, (s, got, want)

# --- the r8 judge's HUGEINT rule -------------------------------------
# DuckDB types SUM(BIGINT/INTEGER) as HUGEINT (int128; Arrow
# decimal128(38,0)); the driver's order-insensitive hash is
# TYPE-sensitive, so a hugeint oracle column hashes differently from
# Spark's LONG even when every value is equal. The four r8 red rows
# were EXACTLY the four oracles (of 198) with a HUGEINT output column.
# Two guards: a registry-wide DESCRIBE lint (no oracle may emit a type
# outside the Spark-emittable set), and a regression test that the
# typed gate itself reds the class.

_SPARK_EMITTABLE = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
}


def _described_oracles():
    sys.path.insert(0, "/root/repo")
    import os

    import __spark_entry__ as entry_mod
    from lakehouse_architecture_spark.sources.tables import TESTDATA_TABLES

    # same resolution as conftest.SF_SMALL: CI points this at its
    # generated ci-testdata tables (DESCRIBE only binds, any SF works)
    sf = os.environ.get("LAKEHOUSE_TESTDATA_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        yield name, con.execute(f"DESCRIBE {sql}").fetchall()


def test_registry_wide_oracle_output_types_are_spark_emittable():
    """Every oracle's DESCRIBE output type must be one Spark can emit
    (plus DECIMAL(p,s)/TIMESTAMP, allowed only when the Spark side
    matches — currently unused on compared surfaces). Registering a
    bare SUM(int) oracle fails here before it fails at the driver."""
    bad = []
    for name, described in _described_oracles():
        for col, typ, *_ in described:
            u = typ.upper()
            if u in _SPARK_EMITTABLE or u.startswith("DECIMAL"):
                continue
            bad.append((name, col, typ))
    assert not bad, (
        "oracle columns with non-Spark-emittable DuckDB types "
        f"(HUGEINT => CAST the SUM to BIGINT): {bad}"
    )


def test_typed_gate_reds_the_hugeint_class():
    """Pre-r9 regression: the gate's typed compare must red a bare
    integer SUM (the exact shape of the four r8 driver-red oracles)
    even though fetchall() values compare equal."""
    from pyspark.sql.types import LongType, StructField, StructType

    from check_oracle import typed_schema_problems

    con = duckdb.connect()
    described = con.execute(
        "DESCRIBE SELECT SUM(x) AS n_rows FROM "
        "(SELECT CAST(1 AS BIGINT) AS x)"
    ).fetchall()
    schema = StructType([StructField("n_rows", LongType())])
    problems = typed_schema_problems(schema, described)
    assert problems and "HUGEINT" in problems[0], problems
    # and the fixed shape passes
    described_ok = con.execute(
        "DESCRIBE SELECT CAST(SUM(x) AS BIGINT) AS n_rows FROM "
        "(SELECT CAST(1 AS BIGINT) AS x)"
    ).fetchall()
    assert typed_schema_problems(schema, described_ok) == []


def test_typed_gate_collapses_integer_widths_but_not_floats():
    """INTEGER/TINYINT oracle columns have been driver-green for
    rounds against Spark LONG — width must collapse; an int-vs-double
    class mix must not."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from check_oracle import typed_schema_problems

    con = duckdb.connect()
    described = con.execute(
        "DESCRIBE SELECT CAST(1 AS TINYINT) AS a, CAST(2 AS INTEGER) AS b"
    ).fetchall()
    schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    assert typed_schema_problems(schema, described) == []
    schema_f = StructType(
        [StructField("a", DoubleType()), StructField("b", LongType())]
    )
    problems = typed_schema_problems(schema_f, described)
    assert len(problems) == 1 and "'a'" in problems[0], problems


def test_driver_window_composition():
    """Structural invariants of the driver's 50-query check window
    (dict-insertion order of __spark_entry__.queries()): the sentinels
    lead, every name resolves to a registered query exactly once, and
    every query the current round touched sits INSIDE the window — a
    changed query outside it keeps a stale green row, the near-miss
    the r8 window-arithmetic bug would have caused."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    assert len(names) == len(set(names))
    assert set(names) == set(oracles), "every query needs an oracle"
    assert names[0] == "q1_pricing_summary"
    window = set(names[:50])
    listed = entry_mod._SENTINELS + entry_mod._PRIORITY
    assert len(listed) == len(set(listed)), "duplicate in priority list"
    assert set(listed) <= set(names)
    # the priority list must FILL the window exactly — the r9 ADVICE
    # off-by-one (49 intended names, slot 50 silently falling to the
    # family-order filler) passed unnoticed without this
    assert len(listed) == 50, len(listed)
    assert window == set(listed)
    # r16 new/touched surfaces must have a fresh driver row: the three
    # new rows (split-leakage audit, two-phase per-source sample,
    # winsorized robust stats) plus the three whose plans this round's
    # changes touched (both exact-quantile anchors restated through the
    # bucketed interpolated-quantile operator, and the weighted-
    # pagerank guard extended to NaN weights)
    touched_r16 = {
        "docs_split_leakage_audit",  # new: first row
        "docs_sample_topk_per_source",  # new: first row
        "lineitem_winsorized_price_stats",  # new: first row
        "approx_distinct_and_quantile",  # anchor restatement
        "quantiles_exact",  # anchor restatement
        "parts_coorder_weighted_pagerank",  # NaN weight guard
    }
    assert touched_r16 <= window, sorted(touched_r16 - window)
    # the rotation the r15 verdict ordered: ALL 42 remaining r11-stale
    # rows get fresh driver rows this round — after this window no
    # standing row is older than r12 (list computed from
    # CORRECTNESS_r01..r15)
    stale_r11 = {
        "agg_cube_flags",
        "agg_grouping_sets",
        "agg_rollup_status_priority",
        "agg_stats_by_status",
        "case_when_conditional_agg",
        "correlated_min_per_group_join",
        "dedup_latest_order_per_customer",
        "distinct_segments",
        "docs_bpe_merge_qa",
        "docs_learned_filter_apply",
        "docs_rare_token_ratio",
        "emb_pq_quantization_qa",
        "events_daily_new_vs_returning",
        "events_signup_to_purchase_1h",
        "events_trailing_24h_volume",
        "events_value_quantile_rollup",
        "join_cross_region_pairs",
        "join_full_outer_nation_presence",
        "join_inner_orders_customer",
        "join_left_anti_inactive_customers",
        "join_left_outer_order_counts",
        "join_left_semi_active_customers",
        "join_right_outer_part_lineitems",
        "orders_incremental_rollup_state",
        "pivot_status_by_priority",
        "q22_dormant_customers",
        "scalar_date_funcs",
        "scalar_string_funcs",
        "scalar_subquery_above_avg",
        "setop_except_all_dup_aware",
        "setop_except_no_order_customers",
        "setop_intersect_keys",
        "setop_union_all_parties",
        "sql_bucketed_colocated_join",
        "sql_probe_orders",
        "sql_revenue_by_nation",
        "topk_orders",
        "window_lag_order_gaps",
        "window_lead_ntile",
        "window_moving_avg_frame",
        "window_rank_orders",
        "window_running_spend",
    }
    assert len(stale_r11) == 42
    assert stale_r11 <= window, sorted(stale_r11 - window)


def test_readme_query_count_matches_registry():
    """The r10 verdict's count drift (README said 199 while the
    registry held 200), made impossible to repeat: the README's two
    literal query counts must equal len(QUERIES)."""
    import re

    sys.path.insert(0, "/root/repo")
    from lakehouse_architecture_spark.queries import QUERIES

    text = open("/root/repo/README.md").read()
    counts = re.findall(
        r"Any of the (\d+) registered analytics queries"
        r"|exposes (\d+) named queries",
        text,
    )
    flat = [int(a or b) for a, b in counts]
    assert len(flat) == 2, counts  # both phrases must still exist
    assert flat == [len(QUERIES)] * 2, (flat, len(QUERIES))


def test_no_unreleased_cache_in_lazy_query_modules():
    """The r8-r10 leak class, pinned shut: LAZY query functions must not
    call plain .cache()/.persist() (the consuming action is the
    caller's, so the pin outlives the query and accumulates across a
    multi-query session — the root of the r9 198-query plain-sweep OOM
    flake). Every within-query persist routes through
    operators/caching.one_slot_persist, which bounds session cache to
    one relation per static call site. Eager modules (streaming jobs,
    sinks, plans) release in a finally and are exempt here; dedup_sim's
    _CORPUS_INDEXES memo has an explicit release function and is
    allowed via its marker comment."""
    import pathlib
    import re

    import lakehouse_architecture_spark.queries as qpkg

    qdir = pathlib.Path(qpkg.__file__).parent
    files = sorted(qdir.glob("*.py"))
    assert files, qdir  # a wrong path must fail loudly, not vacuously
    offenders = []
    for path in files:
        for i, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if re.search(r"\.cache\(\)|\.persist\(\)", code):
                if "build_minhash_corpus_index" in code:
                    continue  # _CORPUS_INDEXES: explicitly released memo
                if "released in finally" in line:
                    continue  # eager helper: consumes AND releases inline
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert offenders == [], offenders
