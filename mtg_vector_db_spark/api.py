"""The reference's public search surface, name-for-name, on DataFrames.

A user of aayu3/mtg-vector-db calls plpgsql table functions and three
Python search entry points; this module re-provides each with the SAME
name and the SAME defaults, so migrating is a mechanical swap of the
connection handle for (SparkSession, DataFrames):

| reference                                   | here |
|---------------------------------------------|------|
| search_similar_cards/rules/glossary(vec, threshold=0.7, count=10) (db/init.sql:159-237) | :func:`search_similar_documents` |
| SearchStrategies.search_by_card_name(q, top_k=10, similarity_threshold=0.3) (db/search_strategies.py:25) | :func:`search_by_name` |
| SearchStrategies.search_by_card_description(q, initial_k=30, final_k=10) (db/search_strategies.py:118) | :func:`search_by_description` |
| search_*_with_reranking(q, emb, reranker, initial_k=30, final_k=10) (db/search_with_reranker.py:15,94,173) | :func:`search_with_reranking` |
| search_all_sources(q, cards_k=10, rules_k=10, glossary_k=5) (db/search_with_reranker.py:249) | :func:`search_all_sources` |

Text queries embed through the pluggable embedder (the reference's
OllamaEmbedder → here a deterministic hash embedder by default; pass
``embed=`` to plug a real model, db/db_utils.py:100-136).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, functions as F

from mtg_vector_db_spark.operators.fanout import fanout_search
from mtg_vector_db_spark.operators.knn import knn_with_documents
from mtg_vector_db_spark.operators.rerank import stub_rerank
from mtg_vector_db_spark.operators.tiered import tiered_name_search


def _embed_query(spark, query: str, dim: int = 64) -> list[float]:
    """Embed one query string with the deterministic hash embedder (the
    stand-in for the reference's per-query Ollama call)."""
    from mtg_vector_db_spark.functions.embedding import embed_text

    row = (
        spark.createDataFrame([(query,)], "q string")
        .select(embed_text(F.col("q")).alias("e"))
        .first()
    )
    return [float(x) for x in row["e"]]


def search_similar_documents(
    docs: DataFrame,
    emb: DataFrame,
    query_embedding: Sequence[float],
    match_threshold: float = 0.7,
    match_count: int = 10,
    doc_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """db/init.sql:159-181 ``search_similar_cards`` (and its rules/glossary
    twins): threshold-filtered cosine KNN joined to document columns."""
    return knn_with_documents(
        docs, emb, query_embedding, k=match_count,
        threshold=match_threshold, doc_cols=doc_cols,
    )


def search_by_name(
    names: DataFrame,
    query: str,
    top_k: int = 10,
    similarity_threshold: float = 0.3,
    name_col: str = "name",
) -> DataFrame:
    """search_strategies.py:25-116 3-tier name resolution (exact →
    prefix-gated → trigram fuzzy), ``match_type`` column included."""
    return tiered_name_search(
        names, query, name_col=name_col, k=top_k,
        fuzzy_threshold=similarity_threshold,
    )


def search_by_description(
    spark,
    docs: DataFrame,
    emb: DataFrame,
    query: str,
    initial_k: int = 30,
    final_k: int = 10,
    embed: Callable[..., list[float]] | None = None,
    ranker: Callable[[list[str]], list[int]] | None = None,
) -> DataFrame:
    """search_strategies.py:118-215: embed the query, retrieve
    ``initial_k`` by cosine, rerank, keep ``final_k``. Default rerank is
    the deterministic stub; pass ``ranker`` (e.g.
    ``functions.backends.http_rerank_backend``) to run the reference's
    listwise external rerank instead — executor-side via
    :func:`operators.rerank.rerank_with`, so the output then carries
    (doc_id, rank, rerank_score) without the stub's ``sim`` column."""
    qv = (embed or _embed_query)(spark, query)
    candidates = knn_with_documents(docs, emb, qv, k=initial_k)
    if ranker is None:
        return stub_rerank(candidates, final_k=final_k)
    from mtg_vector_db_spark.operators.rerank import rerank_with

    cand = candidates.withColumn("query_id", F.lit(0).cast("long"))
    return rerank_with(cand, ranker, final_k=final_k).drop("query_id")


def search_with_reranking(
    docs: DataFrame,
    emb: DataFrame,
    query_embedding: Sequence[float],
    initial_k: int = 30,
    final_k: int = 10,
) -> DataFrame:
    """search_with_reranker.py:15-91 (and rules/glossary twins): two-stage
    retrieval for a pre-embedded query."""
    candidates = knn_with_documents(docs, emb, query_embedding, k=initial_k)
    return stub_rerank(candidates, final_k=final_k)


def search_all_sources(
    spark,
    docs: DataFrame,
    emb: DataFrame,
    query: str,
    cards_k: int = 10,
    rules_k: int = 10,
    glossary_k: int = 5,
    source_values: Sequence[str] = ("cards", "rules", "glossary"),
    embed: Callable[..., list[float]] | None = None,
) -> DataFrame:
    """search_with_reranker.py:249-327: one query embedding fanned out over
    all corpora (a ``source``-tagged documents table here), per-source k."""
    qv = (embed or _embed_query)(spark, query)
    ks = dict(zip(source_values, (cards_k, rules_k, glossary_k)))
    return fanout_search(docs, emb, qv, source_ks=ks)


def search_ambiguous(
    spark,
    docs: DataFrame,
    emb: DataFrame,
    query: str,
    top_k: int = 10,
    embed: Callable[..., list[float]] | None = None,
) -> DataFrame:
    """search_strategies.py:217-255: pure vector KNN for ambiguous queries
    (no threshold, no rerank), with ``distance`` and the
    ``match_type='vector_ambiguous'`` tag."""
    qv = (embed or _embed_query)(spark, query)
    out = knn_with_documents(docs, emb, qv, k=top_k)
    return out.select(
        "doc_id",
        "text",
        (F.lit(1.0) - F.col("sim")).alias("distance"),
        F.lit("vector_ambiguous").alias("match_type"),
    ).orderBy(F.asc("distance"), F.asc("doc_id"))
