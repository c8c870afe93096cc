"""Full-registry ORACLE sweep at an arbitrary SF with a per-oracle
interrupt watchdog — upgrades the magnitude sweep's executes-at-scale
to CORRECT-at-scale: every query is value-compared against its DuckDB
oracle at the given SF (r12 first ran this at sf0.1: 206/206 green,
ORACLE_SF01_r12.json).

Two oracles are quadratic by design and sf0.01-gated (SCALING.md
limits table): customers_fuzzy_pairs_d2 (112M-levenshtein brute
force at sf0.1) and customers_entity_resolution (recursive transitive
closure over the zero-dense d1 graph — measured >60 s and effectively
unbounded). They are skipped here; their Spark sides are covered by
tools/magnitude_sweep.py and their correctness by the sf0.01 gate.

Usage: python tools/oracle_sf_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb  # noqa: E402

import check_oracle as co  # noqa: E402
from lakehouse_architecture_spark.sources.tables import (  # noqa: E402
    TESTDATA_TABLES,
)

ORACLE_TIMEOUT = 300.0
SKIP = {"customers_fuzzy_pairs_d2", "customers_entity_resolution"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_sf_sweep.json"
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    out: dict = {}
    n_pass = n_fail = n_weak = n_tmo = 0
    for i, (name, fn) in enumerate(sorted(qs.items())):
        if name in SKIP:
            out[name] = {"status": "SKIP(quadratic oracle)"}
            print(f"[{i + 1}] SKIP {name}", flush=True)
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            out[name] = {"status": "FAIL", "err": f"spark: {str(e)[:200]}"}
            n_fail += 1
            print(f"[{i + 1}] FAIL {name} spark {str(e)[:120]}", flush=True)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            out[name] = {"status": "WEAK", "spark_sec": round(t_spark, 1)}
            n_weak += 1
            print(f"[{i + 1}] WEAK {name}", flush=True)
            continue
        t1 = time.time()
        timer = threading.Timer(ORACLE_TIMEOUT, con.interrupt)
        timer.start()
        try:
            described = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            timer.cancel()
            msg = str(e)
            if "INTERRUPT" in msg.upper() or "interrupted" in msg.lower():
                out[name] = {
                    "status": "ORACLE_TIMEOUT",
                    "spark_sec": round(t_spark, 1),
                }
                n_tmo += 1
                print(f"[{i + 1}] ORACLE_TIMEOUT {name}", flush=True)
            else:
                out[name] = {"status": "FAIL", "err": f"duckdb: {msg[:200]}"}
                n_fail += 1
                print(f"[{i + 1}] FAIL {name} duckdb {msg[:120]}", flush=True)
            continue
        timer.cancel()
        t_duck = time.time() - t1
        problems = co.typed_schema_problems(sdf.schema, described)
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
        if not problems and co._row_set(srows, scols) != co._row_set(
            drows, dcols
        ):
            a = co._row_set(srows, scols)
            b = set(co._row_set(drows, dcols))
            problems.append(
                f"values differ, e.g. {[x for x in a if x not in b][:2]}"
            )
        if problems:
            out[name] = {
                "status": "FAIL",
                "err": "; ".join(p[:150] for p in problems),
            }
            n_fail += 1
            print(f"[{i + 1}] FAIL {name} {problems[0][:140]}", flush=True)
        else:
            out[name] = {
                "status": "PASS",
                "rows": len(srows),
                "spark_sec": round(t_spark, 1),
                "duck_sec": round(t_duck, 1),
            }
            n_pass += 1
            print(
                f"[{i + 1}] PASS {name} ({len(srows)} rows, "
                f"spark {t_spark:.1f}s, duck {t_duck:.1f}s)",
                flush=True,
            )
    json.dump(out, open(out_path, "w"), indent=1)
    print(
        f"DONE: {n_pass} pass, {n_fail} fail, {n_weak} weak, "
        f"{n_tmo} oracle-timeout, {len(SKIP)} skipped"
    )
    return 1 if (n_fail or n_tmo) else 0


if __name__ == "__main__":
    raise SystemExit(main())
