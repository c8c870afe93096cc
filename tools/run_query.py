"""Run one registered query by name and show rows + the physical plan.

Usage:
    python tools/run_query.py <query_name> [sf_dir] [--plan] [--rows N]

Examples:
    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py minhash_recall_curve /root/testdata/sf0.1 --plan
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lakehouse_architecture_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if not args:
        from lakehouse_architecture_spark.queries import QUERIES

        print(__doc__)
        print("registered queries:")
        for n in sorted(QUERIES):
            print(" ", n)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    n_rows = 20
    for f in flags:
        if f.startswith("--rows"):
            n_rows = int(f.split("=", 1)[1]) if "=" in f else 20

    from lakehouse_architecture_spark.queries import QUERIES

    if name not in QUERIES:
        close = [q for q in QUERIES if name in q]
        print(f"unknown query {name!r}" + (f"; did you mean {close}?" if close else ""))
        return 2
    spark = get_spark(
        "run-query", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    df.show(n_rows, truncate=False)
    print(f"({df.count()} rows total)")
    if "--plan" in flags:
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
