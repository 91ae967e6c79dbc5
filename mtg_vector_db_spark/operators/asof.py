"""As-of (point-in-time) join — a training-data-pipeline staple Spark
lacks as a built-in.

Semantics: for each left row, attach the payload of the LATEST right row
with the same key and ``right.ts <= left.ts`` (DuckDB ``ASOF LEFT JOIN``,
kdb ``aj``). The naive formulation is a range join (quadratic per key);
this implementation is the scalable union trick:

1. tag right rows side=0 carrying their payload, left rows side=1 with a
   null payload;
2. one shuffle: window over (key) ordered by (ts, side, tie-break);
3. ``last(payload, ignorenulls)`` over the unbounded-preceding frame — each
   left row picks up the most recent right payload;
4. keep side=1 rows.

Cost: ONE shuffle on the key, a sort within partitions, no join blow-up —
the shape that survives 100 TB of events. Ties: a right row at exactly
left.ts matches (side 0 sorts first); equal-ts right rows resolve by the
largest ``tie_col``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] = ("value",),
    tie_col: str | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``payload_prefix``-prefixed columns of the as-of match
    (null when no right row precedes). ``tie_col`` breaks equal-ts right
    rows deterministically (defaults to the first payload column)."""
    tie = tie_col or payload_cols[0]
    left_cols = left.columns
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    left_struct = F.struct(*[F.col(c).alias(c) for c in left_cols])
    payload_type = right.select(payload.alias("_p")).schema["_p"].dataType
    left_type = left.select(left_struct.alias("_l")).schema["_l"].dataType

    r = right.select(
        F.lit(None).cast(left_type).alias("_l"),
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie).cast("double").alias("_tie"),
        payload.alias("_p"),
    )
    l = left.select(  # noqa: E741
        left_struct.alias("_l"),
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_tie"),
        F.lit(None).cast(payload_type).alias("_p"),
    )
    both = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn("_match", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left_cols],
        *[F.col("_match")[c].alias(f"{payload_prefix}{c}") for c in payload_cols],
    )
    return out
