"""State-history operators: CDC latest-state compaction and SCD2
gaps-and-islands interval building.

These are the warehouse-maintenance primitives behind queries r47/r48 —
factored out so pipelines can apply them to any keyed, ordered log, and
so the island logic is property-testable against a pure-Python model.

Scale notes: :func:`latest_state` is ONE hash aggregate (map-side
partial max(struct) — no window, no sort of the log).
:func:`scd2_history` windows lag + running-sum + lead and aggregates
islands, ALL clustered on the key — one exchange of the log serves the
whole history build (plan-asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_state(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """One current row per key: the payload of the max (order_cols) row.

    ``order_cols`` must be a unique key per ``key_col`` group (e.g.
    (ts, event_id)) so the struct max is deterministic.
    """
    s = F.max(F.struct(*order_cols, *payload_cols)).alias("s")
    out = df.groupBy(key_col).agg(s)
    return out.select(
        key_col, *[F.col(f"s.{c}").alias(c) for c in (*order_cols, *payload_cols)]
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """Collapse consecutive same-state runs per key into
    [valid_from, valid_to) intervals; the current run has NULL valid_to.

    Output: (key, state, valid_from, valid_to, n_events), where
    ``valid_from`` is the first order column's value at the run start.
    """
    first_order = order_cols[0]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        df.select(key_col, *order_cols, state_col)
        .withColumn(
            "changed",
            F.coalesce(
                F.lag(state_col).over(w) != F.col(state_col), F.lit(True)
            ).cast("int"),
        )
        .withColumn("island", F.sum("changed").over(wrun))
    )
    wi = Window.partitionBy(key_col).orderBy("island")
    return (
        islands.groupBy(key_col, "island", state_col)
        .agg(
            F.min(first_order).alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(wi))
        .select(key_col, state_col, "valid_from", "valid_to", "n_events")
    )
