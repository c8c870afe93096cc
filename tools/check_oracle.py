"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB at a given SF, compare
row-count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Set ``ORACLE_CHECK_PLAIN=1`` to run against a PLAIN SparkSession (no
engine conf) exactly like the driver does — queries must not depend on
get_spark's session conf (that failure class is invisible under the
default mode and was behind the r4 float-normalization scare).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from lakehouse_architecture_spark.session import get_spark
from lakehouse_architecture_spark.sources.tables import TESTDATA_TABLES


def _norm_cell(v):
    # FULL precision for floats: repr() is the shortest round-trip
    # representation, so two doubles compare equal here iff they are
    # bit-identical (modulo -0.0/+0.0, which repr also distinguishes —
    # matching the driver, which hashes exact values). The r7 judge
    # proved the old "%.9g" normalization hid a real cross-engine
    # divergence: any value >= 1000 rounded to 6 decimals carries
    # 10-13 significant digits, and the last digits were invisible.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    if os.environ.get("ORACLE_CHECK_PLAIN"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(
            "oracle-check",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_weak = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(srows)} (no oracle)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sset = _row_set(srows, scols)
            dset = _row_set(drows, dcols)
            if sset != dset:
                diff = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
