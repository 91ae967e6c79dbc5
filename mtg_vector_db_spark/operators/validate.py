"""Declarative row validation → (valid, quarantined-with-reason).

The reference enforces data quality with Postgres constraints — CHECK
enums (/root/reference/db/init.sql:86), NOT NULL + UNIQUE business keys
(init.sql:18,84,126) — and logs failed rows to side files
(db/ingest_cards.py:249-275). Spark has no constraints, so the engine
makes validation an explicit operator: one pass tags every row with its
first failed rule, then splits. Never throws per-row (D3): bad rows are
data, not exceptions.

At scale this is a single map over the input (rule predicates are plain
column expressions) plus, only when a ``unique_key`` rule is present, one
window keyed on the business key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window, functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Column  # True ⇒ row passes


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNotNull())


def non_empty(col: str) -> Rule:
    return Rule(
        f"{col}_non_empty", F.col(col).isNotNull() & (F.length(col) > 0)
    )


def enum_in(col: str, allowed: list[str]) -> Rule:
    """CHECK (col IN (...)) — e.g. rule_type ∈ {main_rule, subrule}."""
    return Rule(f"{col}_enum", F.col(col).isin(allowed))


def in_range(col: str, lo: float, hi: float) -> Rule:
    return Rule(f"{col}_range", F.col(col).between(lo, hi))


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"{col}_pattern", F.col(col).rlike(pattern))


def check(name: str, predicate: Column) -> Rule:
    """Escape hatch for arbitrary expressions."""
    return Rule(name, predicate)


def validate(
    df: DataFrame,
    rules: list[Rule],
    unique_key: str | None = None,
    reason_col: str = "reject_reason",
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined). Quarantined rows carry the name of
    the FIRST failed rule in ``reason_col``; valid rows carry none of the
    bookkeeping columns. UNIQUE is enforced as keep-first-by-key (window
    row_number — the only shuffle in the operator)."""
    reason = F.lit(None).cast("string")
    for r in reversed(rules):
        reason = F.when(~F.coalesce(r.predicate, F.lit(False)), F.lit(r.name)).otherwise(
            reason
        )
    tagged = df.withColumn(reason_col, reason)

    if unique_key is not None:
        w = Window.partitionBy(unique_key).orderBy(*df.columns)
        tagged = tagged.withColumn("_rn", F.row_number().over(w)).withColumn(
            reason_col,
            F.when(
                F.col(reason_col).isNull() & (F.col("_rn") > 1),
                F.lit(f"{unique_key}_not_unique"),
            ).otherwise(F.col(reason_col)),
        ).drop("_rn")

    valid = tagged.filter(F.col(reason_col).isNull()).drop(reason_col)
    quarantined = tagged.filter(F.col(reason_col).isNotNull())
    return valid, quarantined
