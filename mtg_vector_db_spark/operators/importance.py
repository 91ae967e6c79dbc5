"""DSIR-style importance-weighted data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores raw-pool documents by how target-like their hashed n-gram
distribution is: weight each hash bucket by the log-ratio of its
probability under the target vs the raw pool, then score a document by
the mean bucket weight of its token occurrences. The reference has no
selection step at all (everything ingested is kept,
``/root/reference/db/ingest_cards.py``); at 100 TB, selecting toward a
target domain is a core pipeline stage.

Engine-portable determinism: the bucket hash is the same md5-based
integer used by the split/sampling family (``functions/text.py:
hash_fraction``), and per-document weight sums are accumulated as
DECIMAL(28,12) over 12-decimal-rounded weights, so summation is exact
and associative — the same DuckDB-replayable trick as t21's Zipf fit.

Scale posture: two shuffles over the token stream (bucket-grain count,
doc-grain score), both map-side combinable; the 64-row weight table and
the 1-row totals are broadcast. No windows, no driver-side loops — the
one ``crossJoin`` combines a single-row aggregate, the accepted scalar
pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.text import tokens
from mtg_vector_db_spark.session import widen

N_BUCKETS = 64


def token_bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic hash bucket for a token: first 8 md5 hex chars as an
    integer, mod ``n_buckets`` (exact in both engines: values < 2^32)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def dsir_scores(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance score.

    ``is_target`` marks the documents defining the target distribution;
    every document (target or not) is scored. Returns
    ``(id_col, n_tokens, score)`` with ``score`` the mean over token
    occurrences of ``ln(p_target(bucket) / p_raw(bucket))`` under
    add-one smoothing.
    """
    # widen(): the md5 bucket hash is CPU-bound per token; fan a
    # single-split small scan across the cluster (no-op at real scale).
    tb = widen(docs.select(id_col, text_col, is_target.alias("is_t"))).select(
        F.col(id_col),
        F.col("is_t"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets))

    counts = tb.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("r_cnt"),
    )
    totals = counts.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    b = F.lit(float(n_buckets))
    llr = F.log(
        ((F.col("t_cnt") + 1.0) / (F.col("t_tot") + b))
        / ((F.col("r_cnt") + 1.0) / (F.col("r_tot") + b))
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(llr, 12).cast("decimal(28,12)").alias("w"),
    )

    return (
        tb.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("sw"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("sw").cast("double") / F.col("n_tokens")).alias("score"),
        )
    )
