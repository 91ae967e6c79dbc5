"""Exact cosine KNN and threshold similarity search.

Re-provides the reference's query-time retrieval surface:

* ``search_similar_cards/rules/glossary(query_vec, threshold, count)``
  plpgsql table functions (/root/reference/db/init.sql:159-181,184-210,
  213-237): embeddings ⋈ documents, cosine similarity, ``sim > threshold``,
  ``ORDER BY distance LIMIT k``.
* The raw KNN queries in db/search_strategies.py:147-162 and
  db/search_with_reranker.py:38-48 (no threshold, top-``initial_k``).

Physical strategy (the part the reference outsources to pgvector's HNSW):

* Single query vector → the vector is inlined as a literal array; Catalyst
  plans a Parquet scan → codegen'd similarity expression →
  ``TakeOrderedAndProject`` — a distributed top-k that keeps only k rows per
  partition and merges on the driver. No shuffle of the full table, no full
  sort. This is the exact-search correctness baseline and scales linearly
  with executors at 100 TB.
* Document join AFTER the top-k, not before: the k-row result is broadcast
  against the documents table, so the wide document columns never enter the
  scan (column pruning keeps the embedding scan to (id, embedding)).
* Batch of query vectors → :func:`knn_join` broadcasts the (small) query set
  and computes per-query top-k with a partial-aggregate pattern instead of a
  global window sort.
* Approximate path at extreme scale → ``operators/ann.py`` (IVF / LSH).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from mtg_vector_db_spark.functions.vector import cosine_similarity


def similarity_scored(
    emb: DataFrame,
    query_vec: Sequence[float],
    emb_col: str = "embedding",
    score_col: str = "sim",
    round_digits: int | None = None,
) -> DataFrame:
    """Embeddings table + a ``sim`` column against one query vector."""
    sim: Column = cosine_similarity(F.col(emb_col), list(query_vec))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return emb.withColumn(score_col, sim)


def knn(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int,
    threshold: float | None = None,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "sim",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity, optional ``sim > threshold``.

    Equivalent to init.sql:159-181 with ``match_threshold`` /
    ``match_count``; ``threshold=None`` is the bare KNN of
    search_strategies.py:147-162. Plans as TakeOrderedAndProject (verified in
    tests/test_plans.py) — k rows per partition, no global sort.
    """
    scored = similarity_scored(emb, query_vec, emb_col, score_col, round_digits)
    out = scored.select(id_col, score_col)
    if threshold is not None:
        out = out.filter(F.col(score_col) > threshold)
    return out.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)


def knn_with_documents(
    docs: DataFrame,
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int,
    threshold: float | None = None,
    doc_cols: Sequence[str] = ("text",),
    doc_id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
    score_col: str = "sim",
    round_digits: int | None = None,
) -> DataFrame:
    """KNN then join document columns (J1, init.sql:175-176).

    The join runs on the k-row top-k result, broadcast against documents —
    at 100 TB the embedding scan never carries document payload columns.
    """
    top = knn(emb, query_vec, k, threshold, emb_col, emb_id_col, score_col, round_digits)
    joined = F.broadcast(top).join(
        docs, top[emb_id_col] == docs[doc_id_col], "inner"
    )
    return joined.select(doc_id_col, *doc_cols, score_col)


def knn_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    emb_col: str = "embedding",
    emb_id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    score_col: str = "sim",
    round_digits: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Per-query top-k for a *batch* of query vectors.

    Strategy: broadcast the query set (queries ≪ corpus — the realistic
    100 TB shape), compute similarities in a single codegen stage, then take
    per-query top-k via min_by-style aggregation:
    ``groupBy(query_id).agg(slice(array_sort(collect_list(...)), k))`` would
    materialize per-query arrays; instead we use a window ``row_number`` over
    (query_id) AFTER a partial per-partition prune — Catalyst's
    ``rank``+filter plans a shuffle keyed on query_id only for rows that
    survive the per-partition top-k (AQE coalesces the small shuffle).
    """
    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity_prenorm,
        l2_norm,
    )

    # Norms hoisted to once-per-row / once-per-query (round 8): the
    # cross-joined pair expression is dot/(ne*nq) — bit-identical to
    # cosine_similarity(emb, qv) (same ops, same order) at 1/3 the
    # interpreted HOF folds per (row × query) pair. Round-8 VERDICT #5
    # suspected the hoist of regressing the small consumers (v03/p27)
    # and asked for a gate; the round-9 quiet-host A/B (5-run medians,
    # control-normalized) read prenorm 0.723 s vs plain 0.704 s on v03
    # and 2.418 s vs 2.490 s on p27 — cost-neutral within noise at small
    # pair counts, 2.1× on pair-expanded kernels, so it stays
    # unconditional (no gate; OPTIMIZATION_r09.md).
    emb_n = emb.withColumn("_ne", l2_norm(F.col(emb_col)))
    queries_n = queries.withColumn("_nq", l2_norm(F.col(q_vec_col)))
    sim = cosine_similarity_prenorm(
        F.col(emb_col), F.col("_ne"), F.col(q_vec_col), F.col("_nq")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    pairs = (
        emb_n.join(F.broadcast(queries_n))
        .withColumn(score_col, sim)
        .drop("_ne", "_nq")
    )
    if exclude_self:
        pairs = pairs.filter(F.col(emb_id_col) != F.col(q_id_col))
    w = (
        F.row_number()
        .over(
            Window.partitionBy(q_id_col).orderBy(
                F.desc(score_col), F.asc(emb_id_col)
            )
        )
        .alias("rank")
    )
    return (
        pairs.select(q_id_col, emb_id_col, score_col, w)
        .filter(F.col("rank") <= k)
    )
