"""Mini reimplementation of the driver's DuckDB-oracle comparison.

Registers the sf tables as DuckDB views, runs the oracle SQL, and compares
to the Spark result: row count, column-name set, and an order-insensitive
value comparison (sorted rows, columns sorted by name, values stringified).
Used by tests to catch parity breaks before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(round(v, 9)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    actual = spark_df.toPandas()
    expected = run_oracle(sql, sf_dir)
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: {len(actual)} vs {len(expected)}"
    )
    ca, ce = _canon(actual), _canon(expected)
    mismatches = [(a, e) for a, e in zip(ca, ce) if a != e]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
