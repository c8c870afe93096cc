"""Full-registry MAGNITUDE sweep: run every registered query at a
given SF (default sf0.1 — 10x the correctness gate) in one session and
record per-query wall + row count + error. This is the sweep that
catches what sf0.01 cannot: AQE broadcasting lineage-truncated loop
relations (the r12 core-numbers OOM), iteration budgets sized on the
smaller corpus's correction depth, heap-pressure task deaths.

Usage: python tools/magnitude_sweep.py [sf_dir] [out_json]
Writes one JSON object {query: {"sec": s, "rows": n} | {"sec": s,
"error": msg}} and prints per-query progress unbuffered.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from lakehouse_architecture_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/magnitude_sweep.json"
    from lakehouse_architecture_spark.queries import QUERIES

    spark = get_spark("magnitude-sweep")
    out: dict = {}
    names = sorted(QUERIES)
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            n = len(QUERIES[name](spark, sf_dir).collect())
            out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
        except Exception as e:  # noqa: BLE001
            out[name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }
        print(f"[{i + 1}/{len(names)}] {name} {out[name]}", flush=True)
    json.dump(out, open(out_path, "w"), indent=1)
    errs = {k: v for k, v in out.items() if "error" in v}
    print(f"DONE {len(out)} queries, {len(errs)} errors")
    for k, v in errs.items():
        print("ERR", k, v["error"][:160])
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
