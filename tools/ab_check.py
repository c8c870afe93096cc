"""Interleaved re-measurement of suspect bench deltas (the r4-r5
methodology: NEVER compare timings from different sessions — alternate
the measurements in ONE session and compare medians, so JVM/OS state
drifts hit every query equally).

Usage: python tools/ab_check.py [sf_dir] [query ...]
Defaults to the three r5 nominal regressions. Writes /tmp/ab_check.json
(picked up by bench.py into BENCH_DETAIL.json's "ab_check") and prints
one line per query with the interleaved median vs the r4/r5 recorded
medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "agg_stats_by_status",
    "validate_lineitem_fk_invalid",
    "emb_near_dup_pairs",
]
REPS = 7


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from lakehouse_architecture_spark.queries import QUERIES

    spark = get_spark(
        "lakehouse-ab-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mat(name: str) -> float:
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - start

    for name in names:  # one untimed warmup each
        mat(name)

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):  # interleaved: a full round per rep
        for name in names:
            times[name].append(mat(name))

    prior: dict[str, dict[str, float]] = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for tag in ("r04", "r05"):
        try:
            with open(os.path.join(here, f"BENCH_{tag}.json")) as fh:
                prior[tag] = (json.load(fh).get("parsed") or {}).get(
                    "queries", {}
                )
        except Exception:
            prior[tag] = {}

    out = {
        "sf_dir": sf_dir,
        "reps": REPS,
        "stat": "median (interleaved, one session)",
        "queries": {},
    }
    for name in names:
        med = round(statistics.median(times[name]), 3)
        spread = round(max(times[name]) - min(times[name]), 3)
        out["queries"][name] = {
            "median": med,
            "min": round(min(times[name]), 3),
            "spread": spread,
            "r04_median": prior["r04"].get(name),
            "r05_median": prior["r05"].get(name),
        }
        print(
            f"{name}: interleaved median {med}s (spread {spread}s) "
            f"vs r4 {prior['r04'].get(name)} / r5 {prior['r05'].get(name)}"
        )

    with open("/tmp/ab_check.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
