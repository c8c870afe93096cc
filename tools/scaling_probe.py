"""Measured scaling curve: run representative queries at a ladder of
scale factors and fit the per-query log-log slope (wall ~ SF^slope).

The plan-shape audits (EXPLAIN.md, tests/test_plans.py) argue the
designs scale; this tool MEASURES it — a query whose slope is ~1 scales
linearly with data volume, a slope near 0 is fixed-cost dominated at
these SFs (iteration/job overhead), and a slope >> 1 is a red flag the
magnitude sweep's single-SF view cannot see. Single-node caveat: above
the box's memory/core budget the curve bends for machine reasons, so
this is evidence about PLAN scaling, not a cluster forecast.

Usage:
  python tools/scaling_probe.py OUT.json SF_DIR:SF [SF_DIR:SF ...] \
      [--queries q1,q2,...]

Each query gets one untimed warmup at the SMALLEST SF (plan compile,
codegen), then per (query, SF): median of ``REPS`` timed noop-sink
materializations in ascending-SF order. One-slot caches are released
between queries so every row pays its own build. Slopes are the OLS
fit of ln(median wall) on ln(SF).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.session import get_spark  # noqa: E402

REPS = 3

# Representative heavy rows, one per family: the exact-dedup groupBy,
# the LSH pipeline, the exact posting join + its prefix-filtered twin,
# the capped wedge enumeration, a TPC-H agg/join, the sweep-line
# family, the distributed global rank, and the embedding brute-force
# anchor's scale twin.
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "docs_exact_dup_groups",
    "minhash_lsh_near_dups",
    "docs_ngram_jaccard_pairs",
    "docs_prefix_filter_jaccard_join",
    "parts_coorder_triangles",
    "parts_coorder_link_prediction",
    "events_concurrent_sessions",
    "docs_length_decile_profile",
    "emb_near_dup_lsh_strict",
    "docs_token_stats",
]


def _slope(points: list[tuple[float, float]]) -> float:
    """OLS slope of ln(y) on ln(x)."""
    xs = [math.log(x) for x, _ in points]
    ys = [math.log(y) for _, y in points]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (sxy - sx * sy / k) / (sxx - sx * sx / k)


def main() -> int:
    out_path = sys.argv[1]
    ladder: list[tuple[str, float]] = []
    names = list(DEFAULT_QUERIES)
    args = sys.argv[2:]
    if "--queries" in args:
        i = args.index("--queries")
        names = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    for a in args:
        d, sf = a.rsplit(":", 1)
        ladder.append((d, float(sf)))
    ladder.sort(key=lambda t: t[1])
    assert len(ladder) >= 2, "need at least two SFs for a slope"

    from lakehouse_architecture_spark.operators.caching import release_slots
    from lakehouse_architecture_spark.queries import QUERIES

    spark = get_spark(
        "scaling-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mat(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    out: dict = {"ladder": [{"dir": d, "sf": s} for d, s in ladder], "queries": {}}
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        release_slots()  # every query pays its own cache builds
        mat(name, ladder[0][0])  # warmup at the smallest SF
        pts: list[tuple[float, float]] = []
        walls: dict[str, float] = {}
        for d, sf in ladder:
            med = statistics.median(mat(name, d) for _ in range(REPS))
            pts.append((sf, med))
            walls[str(sf)] = round(med, 3)
        sl = round(_slope(pts), 3)
        out["queries"][name] = {"walls": walls, "slope": sl}
        print(f"{name}: {walls} slope={sl}", flush=True)
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
