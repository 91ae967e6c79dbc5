"""The cards-ingestion pipeline as one Spark DAG (SURVEY.md §3.3).

Reference flow (/root/reference/db/ingest_cards.py:112-361): JSON load →
flatten → idempotency check → per-100 batch loop of {field extraction,
embedding-text construction, per-row dup probe, INSERT, per-row HTTP
embedding call}. Serial, 30-60 min for 30k cards.

Here the whole thing is a single lineage: read → explode → extract columns
→ dedup (anti-join + in-batch dropDuplicates) → embed (Arrow-batched UDF)
→ write docs + embeddings + quarantined rejects. Embedding work
parallelizes across executors; at 100 TB the only shuffles are the dedup
exchange on the business key and the write partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from mtg_vector_db_spark.functions import text as T
from mtg_vector_db_spark.functions.embedding import embed_text


def extract_card_fields(cards: DataFrame, name_col: str = "name") -> DataFrame:
    """Field extraction + embedding-text construction
    (ingest_cards.py:13-109: T5 brace strip, T6 dash normalization,
    T7 double-face split, T8 name coalesce, T9 P/T formatting)."""
    card = F.col("card")
    name = T.coalesce_name(card["asciiName"], card["faceName"], F.col(name_col))
    mana = T.strip_braces(card["manaCost"])
    ctype = T.normalize_dashes(card["type"])
    pt = T.power_toughness(card["power"], card["toughness"])
    embedding_text = F.concat_ws(
        " ",
        name,
        mana,
        ctype,
        pt,
        card["text"],
    )
    return cards.select(
        name.alias("card_name"),
        card["type"].alias("card_type"),
        card["manaValue"].cast("double").alias("mana_value"),
        card["text"].alias("text_content"),
        T.back_face_name(F.col(name_col)).alias("related_faces"),
        embedding_text.alias("embedding_text"),
        F.current_timestamp().alias("created_at"),
    )


def dedup_against(
    batch: DataFrame, existing: DataFrame | None, key: str = "card_name"
) -> tuple[DataFrame, DataFrame]:
    """D1: returns (new_rows, rejected_duplicates). In-batch dups keep the
    first by key order; rows whose key already exists go to quarantine
    (the reference's per-row probe J2, done as one anti-join)."""
    in_batch = batch.dropDuplicates([key])
    in_batch_dups = batch.exceptAll(in_batch)
    if existing is not None:
        ex_keys = existing.select(key).distinct()
        new_rows = in_batch.join(F.broadcast(ex_keys), key, "left_anti")
        dup_vs_existing = in_batch.join(F.broadcast(ex_keys), key, "left_semi")
        rejected = in_batch_dups.unionByName(dup_vs_existing)
    else:
        new_rows, rejected = in_batch, in_batch_dups
    return new_rows, rejected


def ingest_cards(
    raw: DataFrame,
    existing_docs: DataFrame | None = None,
    embedder: Callable | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full pipeline: (documents, embeddings, rejected).

    ``raw`` is the (name, card struct) frame from
    sources.readers.read_name_keyed_json. Embeddings row-align to documents
    via the business key (no SERIAL round-trip; SURVEY §1.2).
    """
    extracted = extract_card_fields(raw)
    valid = extracted.filter(
        F.col("card_name").isNotNull() & (F.length("card_name") > 0)
    )
    invalid = extracted.exceptAll(valid)
    new_rows, dups = dedup_against(valid, existing_docs)
    rejected = dups.unionByName(invalid)

    embed = embedder or embed_text
    docs = new_rows.drop("embedding_text")
    embs = new_rows.filter(
        F.col("text_content").isNotNull() & (F.length("text_content") > 0)
    ).select(
        "card_name",
        embed(F.col("embedding_text")).alias("embedding"),
        F.lit("hash-embed-v1").alias("embedding_model"),
    )
    return docs, embs, rejected


def observed_quality(df: DataFrame, name: str = "ingest_quality"):
    """Attach free data-quality metrics to an ingest pass: row count,
    null-name count, and empty-embedding-text count accumulate DURING
    whatever action materializes ``df`` — ``Observation`` metrics ride
    the existing scan, so the counters cost zero extra passes (the
    reference re-queries the table to report them,
    /root/reference/db/ingest_cards.py progress prints).

    Returns ``(observed_df, observation)``; read ``observation.get``
    after an action on ``observed_df``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("card_name").isNull().cast("long")).alias(
            "n_null_name"
        ),
        F.sum(
            (F.length(F.trim(F.col("embedding_text"))) == 0).cast("long")
        ).alias("n_empty_embed_text"),
    )
    return observed, obs
