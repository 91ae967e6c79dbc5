"""Trigram set-similarity JOIN — entity resolution at scale.

The reference's fuzzy tier scores ONE query string against the name column
(pg_trgm ``similarity(card_name, q)``, /root/reference/db/
search_strategies.py:97-106). The many-to-many version — "which names in
table A fuzzily match which names in table B" — is the entity-resolution
join a data pipeline needs, and a naive cross join is O(n·m) string
comparisons.

This is the standard posting-list set-similarity join instead: explode
each side's pg_trgm trigram set to (id, trigram) postings, join on the
trigram (the only wide shuffle, keyed on trigrams), and count shared
trigrams per candidate pair. Because pg_trgm similarity is Jaccard over
trigram SETS, the exact similarity falls out of the counts alone:

    sim = inter / (|A| + |B| - inter)

so no candidate pair ever re-materializes or re-intersects the arrays —
one aggregation computes exact pg_trgm similarity for every pair sharing
at least one trigram (pairs sharing none have sim 0 < any threshold, so
the blocking is lossless).

Skew: ultra-common trigrams fan out quadratically. ``max_tri_df`` drops
trigrams whose document frequency exceeds the cap from the POSTING side
(both sides symmetrically); with a cap the similarity is computed over the
surviving trigrams only — a documented recall/cost dial, ``None`` =
oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mtg_vector_db_spark.session import widen
from mtg_vector_db_spark.functions.trigram import trigram_set


def _postings(
    df: DataFrame, id_col: str, text_col: str, side: str
) -> DataFrame:
    # widen(): the trigram fold is CPU-bound per row; a single-split
    # parquet scan would serialize it onto one core (no-op at real scale).
    tris = widen(df).select(
        F.col(id_col).alias(f"id_{side}"), trigram_set(text_col).alias("tris")
    )
    return tris.select(
        f"id_{side}",
        F.size("tris").alias(f"n_{side}"),
        F.explode("tris").alias("tri"),
    )


def trigram_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    threshold: float = 0.5,
    max_tri_df: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """All (id_l, id_r, sim) pairs with pg_trgm similarity ≥ threshold."""
    lp = _postings(left, left_id, left_col, "l")
    rp = _postings(right, right_id, right_col, "r")
    if max_tri_df is not None:
        df_counts = (
            lp.select("tri").unionByName(rp.select("tri"))
            .groupBy("tri")
            .agg(F.count(F.lit(1)).alias("tri_df"))
            .filter(F.col("tri_df") <= max_tri_df)
            .select("tri")
        )
        lp = lp.join(F.broadcast(df_counts), "tri")
        rp = rp.join(F.broadcast(df_counts), "tri")
    pairs = (
        lp.join(rp, "tri")
        .groupBy("id_l", "id_r", "n_l", "n_r")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sim = F.col("inter") / (F.col("n_l") + F.col("n_r") - F.col("inter"))
    return (
        pairs.withColumn("sim", F.round(sim, round_digits))
        .filter(F.col("sim") >= threshold)
        .select("id_l", "id_r", "sim")
    )
