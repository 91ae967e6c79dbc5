"""Deterministic, mergeable cardinality / frequency sketches.

The reference's analytics stop at exact SQL aggregates (`db/init.sql`
count/group-by surfaces); at 100 TB the first casualties are exact
COUNT(DISTINCT) (a full shuffle of every distinct value) and exact
per-token frequency tables (a shuffle the size of the token stream).
The standard engine answer is sketches — HyperLogLog registers and
count-min cells — which are tiny, mergeable, and map-side combinable.

Two disciplines make them fit this repo:

- **Determinism / oracle-replayability**: every hash is md5-derived
  (`functions.text.hash_fraction` family), never `rand()` or JVM
  hashCode, so a DuckDB oracle replays the exact registers, cells, and
  estimates, and re-runs never drift. (Spark's own
  `approx_count_distinct` is also HLL-based but its internal hashing is
  not SQL-replayable, which is why it can't be the oracle-compared
  form.)
- **Exact-integer register math**: the HLL harmonic sum Σ 2^(−M_j) is a
  sum of dyadic rationals whose double rounding would depend on
  summation ORDER (non-deterministic across partitions and engines).
  Scaling by 2^61 turns every term into an exact BIGINT and the sum
  into an exact DECIMAL — order-free, engine-free — and only the final
  alpha·m²·2^61 / S division happens in floating point.

Merge stories (the 100 TB path):
- HLL registers merge by per-bucket MAX — shard-local sketches reduce
  with one ≤(groups × m)-row shuffle, never re-reading data.
- CMS cells merge by per-cell SUM — same shape.
Both are therefore streaming-maintainable with the bloom/IVF manifest
pattern in ``streaming/pipelines.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 12-bit bucket index (m = 4096 registers) read from the first 3 hex
# chars of md5; the next 15 hex chars (60 bits) feed the leading-zero
# count, so rho ∈ [1, 61].
HLL_B = 12
HLL_M = 1 << HLL_B
# Standard HLL bias constant for m ≥ 128 (Flajolet et al. 2007).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_W = 60  # suffix bits


def hll_bucket(c: Column) -> Column:
    """Register index ∈ [0, 4096) — first 3 md5 hex chars."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 3), 16, 10).cast(
        "int"
    )


def hll_rho(c: Column) -> Column:
    """Leading-zero rank of the 60-bit md5 suffix: ``61 − bitlength(v)``
    (v = 0 → 61). ``bin()`` strips leading zeros identically in Spark
    and DuckDB, so the replay is exact."""
    v = F.conv(F.substring(F.md5(c.cast("string")), 4, 15), 16, 10).cast(
        "long"
    )
    return F.when(v == 0, F.lit(_W + 1)).otherwise(
        F.lit(_W + 1) - F.length(F.bin(v))
    )


def hll_registers(
    df: DataFrame, value: Column, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL register table ``(group…, bucket, m_j)``.

    One hash-aggregate with map-side combine: the shuffle carries at
    most ``groups × m`` rows no matter the input size — this is the
    whole point vs exact COUNT(DISTINCT), whose shuffle carries every
    distinct value.
    """
    return (
        df.select(*group_cols, hll_bucket(value).alias("bucket"),
                  hll_rho(value).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Exact-integer harmonic sum: present buckets contribute
    ``2^(61 − m_j)`` (BIGINT, exact), absent buckets contribute
    ``2^61`` each via the zero-register count — summed as DECIMAL, so
    the only float op is the final division. Small-range (linear
    counting) correction applied under the standard ``raw ≤ 2.5·m`` and
    ``V > 0`` condition.
    """
    two61 = 1 << (_W + 1)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {_W + 1} - m_j)"
                " AS DECIMAL(20,0))"
            )
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_present")).cast("decimal(10,0)")
        * F.lit(two61).cast("decimal(20,0)")
    )
    v_zero = F.lit(HLL_M) - F.col("n_present")
    raw = (
        F.lit(float(HLL_ALPHA * HLL_M * HLL_M) * float(two61))
        / s_total.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 3).alias("n_hll"))


def hll_oracle_sql(value_expr: str, table: str, group_col: str) -> str:
    """DuckDB replay of registers + estimate for one group column.

    Mirrors :func:`hll_registers`/:func:`hll_estimate` term for term —
    same md5 substrings, same exact-integer harmonic sum, same literal
    constants — so the comparison pins the sketch, not just its shape.
    """
    two61 = 1 << (_W + 1)
    alpha_lit = repr(float(HLL_ALPHA * HLL_M * HLL_M) * float(two61))
    return f"""
    WITH h AS (
      SELECT {group_col},
             CAST(concat('0x', substring(md5({value_expr}), 1, 3)) AS INT)
               AS bucket,
             CAST(concat('0x', substring(md5({value_expr}), 4, 15))
                  AS BIGINT) AS v
      FROM {table}
    ),
    r AS (
      SELECT {group_col}, bucket,
             max(CASE WHEN v = 0 THEN {_W + 1}
                      ELSE {_W + 1} - length(bin(v)) END) AS m_j
      FROM h GROUP BY 1, 2
    ),
    a AS (
      SELECT {group_col},
             sum(CAST((1::BIGINT << ({_W + 1} - m_j)) AS DECIMAL(20,0)))
               AS s_present,
             count(*) AS n_present
      FROM r GROUP BY 1
    )
    SELECT {group_col},
           round(CASE WHEN ({alpha_lit}
                       / CAST(s_present
                              + CAST({HLL_M} - n_present AS DECIMAL(10,0))
                                * CAST({two61} AS DECIMAL(20,0))
                              AS DOUBLE)) <= {2.5 * HLL_M}
                       AND ({HLL_M} - n_present) > 0
                 THEN {float(HLL_M)} * ln({float(HLL_M)}
                                          / ({HLL_M} - n_present))
                 ELSE {alpha_lit}
                      / CAST(s_present
                             + CAST({HLL_M} - n_present AS DECIMAL(10,0))
                               * CAST({two61} AS DECIMAL(20,0))
                             AS DOUBLE)
                 END, 3) AS n_hll
    FROM a
    """


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_cell(
    token: Column, row: Column | int, width: int = CMS_WIDTH
) -> Column:
    """Row-``row`` cell index for a token: md5 over a ``row:token``
    salted key, first 8 hex chars mod width — independent-enough hash
    rows, one md5 each, replayable anywhere md5 exists."""
    row_col = F.lit(row) if isinstance(row, int) else row
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(row_col.cast("string"), F.lit(":"), token)
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    token_counts: DataFrame,
    token_col: str = "token",
    count_col: str = "cnt",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch ``(row, cell, total)`` from an exact per-token
    count relation.

    Built from the (token, count) relation rather than the raw token
    stream so the stream is shuffled ONCE (the exact-count groupBy the
    caller already needs); the depth×width sketch itself reduces ≤
    depth·distinct rows to ≤ depth·width — broadcastable state
    (depth·width cells, 32 KiB at the defaults) that merges across
    shards by per-cell SUM.
    """
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    return (
        token_counts.select(F.col(token_col), F.col(count_col), rows)
        .select(
            "row",
            cms_cell(F.col(token_col), F.col("row"), width).alias("cell"),
            F.col(count_col),
        )
        .groupBy("row", "cell")
        .agg(F.sum(count_col).alias("total"))
    )


def cms_estimate(
    token_counts: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimate per token: min over rows of the row's cell total.

    The sketch side is broadcast (≤ depth·width rows), so estimating any
    number of tokens is map-side — the production shape for "how big is
    this token / n-gram / url" probes against a corpus-wide sketch.
    """
    probes = token_counts.select(
        F.col(token_col),
        *[
            cms_cell(F.col(token_col), i, width).alias(f"c{i}")
            for i in range(depth)
        ],
    )
    est = None
    joined = probes
    for i in range(depth):
        s_i = sketch.filter(F.col("row") == i).select(
            F.col("cell").alias(f"c{i}"), F.col("total").alias(f"t{i}")
        )
        joined = joined.join(F.broadcast(s_i), f"c{i}", "left")
        term = F.coalesce(F.col(f"t{i}"), F.lit(0))
        est = term if est is None else F.least(est, term)
    return joined.select(F.col(token_col), est.alias("cms_est"))
