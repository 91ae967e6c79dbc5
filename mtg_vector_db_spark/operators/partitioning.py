"""Partitioning strategies for skew and co-location at cluster scale.

The reference never needs these (one Postgres node, ~33k rows); they are
what makes the same logical plans hold at 100 TB:

* **Salted join** — a shuffle join on a skewed key sends every row of the
  hot key to one reducer. Salting splits each key into ``salt`` sub-keys on
  the large side and replicates the small side per sub-key, so a hot key
  spreads over ``salt`` reducers. (AQE's skew-join split handles moderate
  skew automatically; explicit salting is for the pathological key that
  AQE can't split because it's a single shuffle block.)
* **Two-phase aggregation** — partial agg on (key, salt), final agg on key:
  the classic combiner cascade for high-cardinality-hot-key counts. Only
  algebraic aggregates (sum/count/min/max) decompose this way.
* **Bucketed co-located join** — writing both sides bucketed by the join
  key lets Spark plan a SortMergeJoin with NO Exchange on either side; for
  a fact table joined repeatedly on the same key, the shuffle is paid once
  at write time and never again.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted(df: DataFrame, key: str, salt: int, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, salt) derived from the whole row's
    non-key columns (xxhash64 — no RNG, so retries/replays are stable)."""
    other = [c for c in df.columns if c != key] or [key]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*other), F.lit(salt)))


def replicate(df: DataFrame, salt: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (the small/dim side)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: semantically identical to
    ``large.join(small, key, how)`` for one-to-many joins (``small`` unique
    on ``key``), but the hot key's rows spread over ``salt`` reducers."""
    lg = salted(large, key, salt)
    sm = replicate(small, salt)
    return lg.join(sm, [key, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe groupBy for algebraic aggregates.

    ``aggs`` is (fn, col, alias) with fn ∈ {sum, count, min, max}: phase 1
    aggregates (key, salt) partitions, phase 2 merges per key (count merges
    by sum). Equivalent to ``df.groupBy(key).agg(...)`` — verified in
    tests/test_partitioning.py.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _, _ in aggs:
        if fn not in merge_fn:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    p1 = (
        salted(df, key, salt)
        .groupBy(key, "_salt")
        .agg(*[phase1_fn[fn](c).alias(a) for fn, c, a in aggs])
    )
    return p1.groupBy(key).agg(
        *[merge_fn[fn](a).alias(a) for fn, _, a in aggs]
    )


def hot_keys(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Skew diagnosis: the ``top`` heaviest keys with their row share —
    what you run before deciding between AQE, salting, or broadcast."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist bucketed+sorted by the join key: downstream equi-joins and
    aggregations on ``key`` between same-bucketed tables plan with NO
    Exchange (the shuffle is prepaid at write time)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def partition_by_cell(df: DataFrame, path: str, cell_col: str = "label") -> None:
    """IVF layout write: hive-partition the corpus by coarse cell so an
    nprobe search is a partition-pruned scan (operators/ann.py)."""
    df.write.partitionBy(cell_col).mode("overwrite").parquet(path)


def z_value(a: Column, b: Column, bits: int = 12) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns'
    low ``bits`` bits — plain bit arithmetic, fully codegen'd."""
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("long"), k).bitwiseAND(F.lit(1)), 2 * k)
            + F.shiftleft(
                F.shiftright(b.cast("long"), k).bitwiseAND(F.lit(1)), 2 * k + 1
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 12,
    num_files: int = 8,
) -> None:
    """Z-order layout write: range-partition + sort by the Morton value of
    two filter columns so parquet row-group min/max stats become tight in
    BOTH dimensions — point/range filters on either column then prune
    row groups at scan time. (Single-column pruning: plain sortBy; this
    is for the two-dimensional filter workload.) Columns must be
    non-negative ints that fit ``bits`` bits (pre-bucket/scale upstream)."""
    z = z_value(F.col(cols[0]), F.col(cols[1]), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(spark, path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (streaming appends accumulate tiny files; scan
    cost and driver memory scale with file COUNT, not bytes). Writes to a
    sibling temp dir then swaps, so a crash never leaves the data half
    gone. Returns the resulting file count."""
    import os
    import shutil

    tmp = path.rstrip("/") + "._compact_tmp"
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    swap = path.rstrip("/") + "._compact_old"
    os.rename(path, swap)
    os.rename(tmp, path)
    shutil.rmtree(swap)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])
