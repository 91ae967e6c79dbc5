"""Output sinks (SURVEY.md §2.1 S6-S11).

The reference's INSERT/DELETE/log-file sinks as DataFrame writes. Spark
writes are partitioned and atomic-per-job; the reference's batch-commit
knobs (every 100 rows, db/ingest_cards.py:117) have no equivalent cost
here and are dropped rather than imitated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def append(df: DataFrame, path: str) -> None:
    """S6/S7: batched append (ids must be pre-generated — see stable_id)."""
    df.write.mode("append").parquet(path)


def overwrite(df: DataFrame, path: str) -> None:
    """S8: truncate-then-load (db/ingest_rules.py:85-89)."""
    df.write.mode("overwrite").parquet(path)


def write_if_empty(spark: SparkSession, df: DataFrame, path: str) -> bool:
    """S9: idempotent load — skip when the target already has rows
    (db/ingest_cards.py:166-178). Returns True if written."""
    try:
        if spark.read.parquet(path).limit(1).count() > 0:
            return False
    except Exception:
        pass  # target absent → write
    overwrite(df, path)
    return True


def quarantine(rejected: DataFrame, path: str, reason: str) -> None:
    """S10/D3: side-channel sink for rejected rows, tagged with the reason
    (the reference appends to duplicates.log / failed_inserts.log,
    db/ingest_cards.py:249-275)."""
    rejected.withColumn("reject_reason", F.lit(reason)).write.mode(
        "append"
    ).parquet(path)


def write_json(df: DataFrame, path: str) -> None:
    """S11: JSON file sink (glossary_parser.py:69-74)."""
    df.write.mode("overwrite").json(path)


def stable_id(df: DataFrame, order_cols: list[str], id_col: str = "id") -> DataFrame:
    """SERIAL-PK replacement: deterministic dense ids from a stable sort
    (SURVEY.md §1.2). zipWithIndex-free: a window row_number over the
    declared business ordering — at scale prefer a keyed hash id instead."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return df.withColumn(id_col, F.row_number().over(w).cast("long"))


def cascade_delete(
    docs: DataFrame, emb: DataFrame, delete_ids: DataFrame,
    doc_id: str = "doc_id", emb_fk: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """J6: FK ON DELETE CASCADE as anti-joins (db/init.sql:43,61,104,139):
    returns (docs', embeddings') with the ids and their dependents removed."""
    key = delete_ids.columns[0]
    docs2 = docs.join(
        F.broadcast(delete_ids), docs[doc_id] == delete_ids[key], "left_anti"
    )
    emb2 = emb.join(
        F.broadcast(delete_ids), emb[emb_fk] == delete_ids[key], "left_anti"
    )
    return docs2, emb2


def overwrite_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Backfill-safe partitioned write: replace ONLY the partitions
    present in ``df``, leaving every other partition untouched (dynamic
    partition overwrite — the idempotent daily-rerun pattern; a plain
    ``overwrite`` would truncate the whole table). Per-write option, so
    no session-level config leaks to other writers.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
) -> None:
    """Deterministic trainer-facing shard layout (the webdataset/
    Megatron-style output stage): every row goes to shard
    ``md5(key ⊕ salt) % n_shards``, rows within a shard are ordered by a
    second independent md5 — so the full layout (shard membership AND
    intra-shard order) is a pure function of the data, reproducible
    across reruns, clusters, and engines, with no rand()/monotonic-id
    nondeterminism.

    Scale shape: ONE shuffle — ``repartition(n_shards, shard)`` keyed on
    the shard id — then a partition-local sort; ``partitionBy`` emits one
    ``shard=K`` directory per shard with one file each (each shard lands
    wholly in one task). Shard balance follows from the uniform hash;
    pick ``n_shards`` so a shard fits a trainer worker's read budget.
    A skewed *key distribution* cannot skew shards (the hash is over the
    unique key), only duplicate keys can — dedup first.
    """
    shard = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col(key_col), F.lit(salt))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).alias("shard")
    order = F.md5(F.concat_ws("|", F.col(key_col), F.lit(salt), F.lit("order")))
    (
        df.select("*", shard)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(order)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
