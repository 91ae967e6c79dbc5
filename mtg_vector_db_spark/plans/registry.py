"""Registration plumbing for the driver contract.

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are views over
these dicts. Each query module registers callables with :func:`query` and
(when SQL-expressible) a DuckDB oracle with :func:`oracle`.

Conventions enforced here by discipline (checked in tests):
* every float column is ``round(x, 6)`` on BOTH sides (Spark computes in
  float64 with sequential accumulation; DuckDB matches to ≤1 ulp, so 6-digit
  rounding hash-matches — validated empirically in tests/test_oracle_parity);
* every computed column is aliased identically in Spark and SQL;
* deterministic ORDER tie-breaks on id columns wherever top-k boundaries
  could be ambiguous.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str) -> Callable:
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        return fn

    return deco


def oracle(name: str, sql: str) -> None:
    """Register the DuckDB-equivalent SQL for a query name."""
    ORACLES[name] = sql


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load parquet tables (lazy scans; pruning/pushdown per query).

    Pins the session timezone to UTC (runtime conf — works on any session
    the driver hands us): parquet timestamps are naive, DuckDB renders
    them naively, and Spark renders them in the SESSION zone — a non-UTC
    session would shift every formatted/CAST-to-string timestamp.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return [
        events_df(spark, sf_dir) if n == "events" else
        spark.read.parquet(f"{sf_dir}/{n}.parquet")
        for n in names
    ]


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with timestamp-encoding normalization.

    Driver snapshots have shipped ``events.ts`` as either ``timestamp[us]``
    (reads natively) or ``timestamp[ns]``, which Spark's parquet reader
    rejects by default (PARQUET_TYPE_ILLEGAL). We enable nanos-as-long
    (runtime SQL conf — works on any session the driver hands us) and, when
    the scan surfaces a long column, convert to microsecond timestamps —
    matching DuckDB's own ns→µs truncation so event-time results hash-match
    the oracle either way.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") in ("bigint", "long"):
        # Integer DIV, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
        # integer range, so float division is off by ±1 µs on some rows.
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # timestamp[us] parquet reads as TIMESTAMP_NTZ; with the session zone
    # pinned UTC the cast is instant-preserving and keeps every downstream
    # schema (and the driver's schema compare) on plain TimestampType.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def load_all() -> None:
    """Import every query module (idempotent) so registration runs."""
    from mtg_vector_db_spark.plans import (  # noqa: F401
        corpus_queries,
        dedup_queries,
        pipeline_queries,
        relational_queries,
        text_queries,
        vector_queries,
    )
