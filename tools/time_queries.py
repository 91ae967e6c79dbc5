#!/usr/bin/env python
"""Per-query timing harness for optimization A/B runs (round 9).

Same protocol as bench.py (JVM+worker warmup, per-query untimed warmup,
noop sink, median of N timed runs) but scoped to an explicit query list,
so isolated before/after measurements use the exact bench methodology
without paying for the whole headline set.

Usage: SPARK_GRAFT_SF_DIR=... python tools/time_queries.py q1 q2 ...
Env: SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_BENCH_WARMUP (1).
Prints one JSON line: {"queries": {...medians...}, "runs": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_vector_db_spark.plans import registry  # noqa: E402
from mtg_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")), 1)
    n_warm = max(int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")), 0)

    registry.load_all()
    spark = get_spark(
        "time_queries", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    warm = (
        spark.range(200_000)
        .select(
            (F.col("id") % 7).alias("k"),
            (F.col("id") % 100).cast("double").alias("v"),
            F.array_repeat(F.col("id").cast("double"), 8).alias("a"),
        )
        .withColumn("s", F.aggregate("a", F.lit(0.0), lambda x, y: x + y))
        .withColumn("r", F.row_number().over(Window.partitionBy("k").orderBy("v")))
        .groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("d"), F.max("r"), F.avg("s"))
    )
    warm.write.format("noop").mode("overwrite").save()

    def _noop_batches(it):
        import numpy  # noqa: F401

        yield from it

    (
        spark.range(32)
        .repartition(32)
        .mapInPandas(_noop_batches, schema="id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings, raw = {}, {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        for _ in range(n_warm):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = round(_median(runs), 3)
        raw[name] = runs
    spark.stop()
    print(json.dumps({"queries": timings, "runs": raw}))


if __name__ == "__main__":
    main()
