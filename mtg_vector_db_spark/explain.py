"""Plan inspection tool: print the optimized/executed physical plan of any
registered query.

    python -m mtg_vector_db_spark.explain v01_knn_topk
    python -m mtg_vector_db_spark.explain p11_bq_rerank_search --executed
    python -m mtg_vector_db_spark.explain r01_pricing_summary --run
    python -m mtg_vector_db_spark.explain --list

The per-operator plan contracts asserted in tests/test_plans.py were
developed by iterating on exactly this output; PLANS.md snapshots the
flagship plans with commentary.
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mtg-vector-db-spark-explain")
    p.add_argument("query", nargs="?", help="registered query name")
    p.add_argument("--list", action="store_true", help="list query names")
    p.add_argument(
        "--executed",
        action="store_true",
        help="run the query and show the final (AQE-resolved) plan",
    )
    p.add_argument(
        "--run",
        action="store_true",
        help="execute the query and print result rows as JSON lines",
    )
    p.add_argument(
        "--limit", type=int, default=50, help="max rows printed with --run"
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    p.add_argument("--master", default="local[4]")
    return p


def _tidy(plan: str) -> str:
    """Strip expression ids and fold long vector literals for readability."""
    plan = re.sub(r"#\d+", "#x", plan)
    return re.sub(
        r"\[(-?\d+\.\d+(E-?\d+)?,\s*){4,}[^\]]*\]", "[<vector literal>]", plan
    )


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    if args.list or not args.query:
        for name in sorted(registry.QUERIES):
            oracle = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}  [{oracle}]")
        return 0
    if args.query not in registry.QUERIES:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2

    owns_session = spark is None
    if owns_session:
        from mtg_vector_db_spark.session import get_spark

        spark = get_spark("mtg-explain", master=args.master)
        spark.sparkContext.setLogLevel("ERROR")
    try:
        df = registry.QUERIES[args.query](spark, args.sf_dir)
        if args.run:
            for line in df.limit(args.limit).toJSON().collect():
                print(line)
            return 0
        if args.executed:
            df.collect()
        print(_tidy(df._jdf.queryExecution().executedPlan().toString()))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
