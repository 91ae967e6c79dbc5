"""Scale-safe point-in-interval (range) join.

Spark plans a bare ``p.ts BETWEEN i.start AND i.end`` join as a broadcast
nested loop (or worse, a cartesian product) — O(|points|·|intervals|).
The bucketed rewrite is the standard fix: explode each interval to the
fixed-width buckets it covers, map each point to its bucket, equi-join on
the bucket key (a plain shuffle/broadcast hash join), then re-check the
exact range predicate. Cost: O(|points| + |intervals|·avg_buckets) with
hash-join parallelism — the shape that survives 100 TB of events.

Bucket width trades replication vs selectivity: pick it near the median
interval length so intervals explode to O(1) buckets each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_buckets(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """One row per (interval, covering bucket): buckets are epoch-second
    multiples of ``bucket_seconds``; the half-open interval [start, end)
    covers floor(start/w)..floor((end - 1µs)/w)."""
    w = F.lit(bucket_seconds).cast("long")
    first = F.floor(F.unix_timestamp(F.col(start_col)) / w).cast("long")
    last = F.floor(
        (F.unix_micros(F.col(end_col)) - F.lit(1)) / F.lit(bucket_seconds * 1_000_000).cast("long")
    ).cast("long")
    return intervals.withColumn(
        "_bucket", F.explode(F.sequence(first, F.greatest(last, first)))
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval containing it
    (``start <= ts < end``), via the bucketed equi-join rewrite."""
    bucketed = interval_buckets(intervals, start_col, end_col, bucket_seconds)
    pts = points.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast("long"),
    )
    joined = pts.join(bucketed, "_bucket", how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bucket")
