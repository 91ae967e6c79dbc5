"""Multi-source fan-out search (SURVEY.md §2.7 V11, §2.6 U1).

The reference embeds the query once and runs three retrieve(-then-rerank)
pipelines over cards/rules/glossary, then displays results grouped by
source (/root/reference/db/search_with_reranker.py:249-327). Here the
"corpora" are any partitioning of a documents table; the per-source top-k
plans share the broadcast query vector and Spark runs their stages
concurrently — the parallelism the reference's docstring promises but its
sequential loop doesn't deliver (search_with_reranker.py:5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from mtg_vector_db_spark.functions.vector import cosine_similarity


def fanout_search(
    docs: DataFrame,
    emb: DataFrame,
    query_vec: Sequence[float],
    source_ks: dict[str, int],
    source_col: str = "source",
    doc_id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Per-source top-k cosine search, unioned with the source tag kept.

    ``source_ks`` maps source value → k (the reference's 10/10/5 defaults,
    search_with_reranker.py:284-290).
    """
    sim = cosine_similarity(F.col(emb_col), list(query_vec))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        emb.join(docs, emb[emb_id_col] == docs[doc_id_col])
        .select(doc_id_col, source_col, sim.alias("sim"))
    )
    if threshold is not None:
        scored = scored.filter(F.col("sim") > threshold)
    parts = []
    for src, k in source_ks.items():
        parts.append(
            scored.filter(F.col(source_col) == src)
            .orderBy(F.desc("sim"), F.asc(doc_id_col))
            .limit(k)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
