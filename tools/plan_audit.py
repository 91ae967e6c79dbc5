#!/usr/bin/env python
"""Regenerate PLAN_AUDIT.md: physical-plan shape of every registered query.

Run from the repo root:  python tools/plan_audit.py
(~2-4 min: builds the AQE initial executedPlan for each registered query
at sf0.001 — plans only, nothing executes.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_vector_db_spark.plans import registry  # noqa: E402
from mtg_vector_db_spark.session import get_spark  # noqa: E402

HEADER = """# PLAN AUDIT — physical-plan shape of every registered query

Generated mechanically (`python tools/plan_audit.py`; executedPlan at
sf0.001, AQE initial plan) —
one row per registered query. The global invariant this table witnesses
(and `tests/test_plans.py::test_no_cartesian_in_any_registered_query`
pins): **no `CartesianProduct` anywhere in the inventory**.
`BroadcastNestedLoopJoin` rows are the 1-row scalar-fold / broadcast
query-table patterns (both sides bounded by construction — r33/r70's
folded scalars, knn_join's broadcast query set, d02's intentionally
bounded exact baseline). `SortMergeJoin` rows are mid-size equi-joins
where AQE declined broadcast — the correct choice at scale.

Counts are TEXTUAL occurrences over the fully unrolled plan tree. The
iterative queries that persist() their round artifacts inside the query
body (p40/p41's graph rounds, v17's spectral rounds, c28's component
chain) therefore show inflated numbers: every report branch re-prints
the whole upstream lineage, but at runtime those subtrees are computed
once into the cache and reused (InMemoryTableScan) — the execution
exchange count is a small fraction of the printed one.

| query | exchanges | bhj | smj | cartesian | bnlj | codegen spans |
|---|---|---|---|---|---|---|
"""


def main() -> None:
    sf = "/root/testdata/sf0.001"
    registry.load_all()
    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(registry.QUERIES):
        plan = (
            registry.QUERIES[name](spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        rows.append(
            f"| {name} | {plan.count('Exchange')} "
            f"| {plan.count('BroadcastHashJoin')} "
            f"| {plan.count('SortMergeJoin')} "
            f"| {plan.count('CartesianProduct')} "
            f"| {plan.count('BroadcastNestedLoopJoin')} "
            f"| {plan.count('WholeStageCodegen')} |"
        )
        print(rows[-1], flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
