#!/usr/bin/env python
"""Round-8 optimization harness: capture plans and phase timings per query.

Usage:
  python tools/profile_r09.py plans [names...]   # dump explain("formatted")
                                                 # to plans/r09/<name>_<tag>.txt
  python tools/profile_r09.py time [names...]    # timed runs, split into
                                                 # build (fn call, incl. eager
                                                 # pins) vs write (noop save)

Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROFILE_TAG (default "before"),
PROFILE_RUNS (default 2 timed runs after 1 warmup).

The timing methodology matches bench.py protocol v2 (per-query untimed
warmup, noop sink, median of runs) so numbers here are comparable to
BENCH_local_r09.json medians.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_vector_db_spark.plans import registry  # noqa: E402
from mtg_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PROFILE_TAG", "before")
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))
    registry.load_all()
    spark = get_spark(
        "profile-r09", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r09")
    os.makedirs(outdir, exist_ok=True)

    if not names:
        names = list(registry.QUERIES)

    if mode == "plans":
        for name in names:
            fn = registry.QUERIES[name]
            spark.sparkContext.setJobDescription(f"plan:{name}")
            try:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as ex:  # pragma: no cover - diagnostic tool
                print(f"{name}: ERROR {ex}", flush=True)
                continue
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            print(f"{name}: plan written", flush=True)
    elif mode == "time":
        print(f"# sf_dir={sf_dir} runs={n_runs} (1 untimed warmup)")
        for name in names:
            fn = registry.QUERIES[name]
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            builds, writes = [], []
            for i in range(n_runs):
                spark.sparkContext.setJobDescription(f"time:{name}:{i}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                builds.append(t1 - t0)
                writes.append(t2 - t1)
            b = sorted(builds)[len(builds) // 2]
            w = sorted(writes)[len(writes) // 2]
            print(
                f"{name}: total={b + w:7.3f}  build={b:7.3f}  write={w:7.3f}",
                flush=True,
            )
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
