"""BM25 keyword scoring and reciprocal-rank fusion for hybrid search.

The reference's search surface has two arms — trigram keyword matching
(db/search_strategies.py:97-106) and vector KNN (db/init.sql:159-181) —
but never combines them. These operators add the standard combination: a
BM25-scored keyword arm (Robertson/Okapi, the lexical baseline every
hybrid-search system ships) and RRF fusion (Cormack et al.) of per-arm
rank lists, which needs no score calibration between arms.

Scale shape: the term explode is map-side and immediately filtered to the
query's terms, so every downstream shuffle (tf, df, per-doc sum) carries
only matching postings — corpus-size-independent state per query term.
Corpus statistics (N, avgdl) are a one-row aggregate broadcast via cross
join. Fusion ranks are assigned AFTER each arm's top-k (TakeOrdered), so
the rank window runs over ≤k rows — never a global single-partition sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from mtg_vector_db_spark.functions.text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Per-document BM25 score against ``query_terms`` → ``(doc_id,
    bm25)`` for documents matching at least one term.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (Robertson, non-negative)
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·doclen/avgdl))

    ``tok`` (round 9, guide §2.4): an optional pre-tokenized
    ``(doc_id, toks)`` relation standing in for the default
    ``tokens(lower(text))`` projection — callers that score the same
    corpus several times in one DAG (p39's RM3 loop) pass a pinned
    tokenization so the corpus is tokenized once instead of once per
    scoring pass. Must be EXACTLY the default projection's rows for the
    scores to be unchanged (the callers pass the same expression,
    pinned).
    """
    if tok is None:
        tok = docs.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.lower(F.col(text_col))).alias("toks"),
        )
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    postings = tok.select(
        "doc_id", F.size("toks").alias("doclen"), F.explode("toks").alias("term")
    ).filter(F.col("term").isin([str(t) for t in query_terms]))
    tf = postings.groupBy("doc_id", "doclen", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    part = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("doclen") / F.col("avgdl"))
        )
    )
    return (
        scored.withColumn("part", part)
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), round_digits).alias("bm25"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 (rounded-score ordering, doc_id tie-break — plans as
    TakeOrderedAndProject over the per-doc sums)."""
    return (
        bm25_scores(docs, query_terms, **kwargs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def ranked(arm: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """Attach 1-based fusion ranks to an ALREADY top-k'd arm (ties broken
    by id). The global window is safe here precisely because the input is
    a k-row retrieval result, not a corpus."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return arm.select(id_col, F.row_number().over(w).alias("rank"))


def rrf_fuse(
    arms: Sequence[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = Σ_arms 1/(k + rank_arm(d)).

    Arms are ``(id, rank)`` DataFrames from :func:`ranked`. Union + one
    hash aggregation — no joins, missing-from-an-arm docs contribute 0.
    """
    contribs = [
        a.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("contrib"),
        )
        for a in arms
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return u.groupBy(id_col).agg(
        F.round(F.sum("contrib"), round_digits).alias("rrf")
    )


def bm25_from_postings(
    post: DataFrame,
    stats: DataFrame,
    query_terms: Sequence[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k BM25 from a PRECOMPUTED posting table ``(term, doc_id, tf,
    doclen)`` + 1-row stats ``(n_docs, avgdl)`` — the serve half of the
    build-once split (t41 stored artifact; streaming bm25_probe). The
    scoring DAG from the tf table down is operation-identical to
    :func:`bm25_scores`, so serving a frozen index returns bit-for-bit
    the full-scan answer: df(term) needs no separate table because the
    fetched posting rows for a term ARE the docs containing it."""
    sel = post.filter(
        F.col("term").isin([str(t) for t in query_terms])
    )
    dfreq = sel.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = sel.join(F.broadcast(dfreq), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    part = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("doclen") / F.col("avgdl"))
        )
    )
    return (
        scored.withColumn("part", part)
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), round_digits).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_weighted_scores(
    docs: DataFrame,
    term_weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
    tok: DataFrame | None = None,
) -> DataFrame:
    """BM25 with per-term weights from a (term, tw) DataFrame — the
    rescoring stage of pseudo-relevance feedback (RM3), where the
    expanded query carries data-derived weights instead of a literal
    term list. ``tok`` as in :func:`bm25_scores` — a pre-tokenized
    ``(doc_id, toks)`` stand-in for the default projection.

    score(d) = Σ_t tw(t) · idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))

    Scale shape mirrors :func:`bm25_scores`, with one difference: the
    postings filter is a broadcast hash semi-join against the (tiny,
    data-derived) weight table instead of a literal IN — still applied
    map-side before any shuffle, so postings state stays proportional to
    query-term matches, not the corpus. Per-doc summation rides
    DECIMAL(28,12) over round-12 components: with ~a dozen weighted
    terms per doc the float sum order could differ between engines, and
    decimal addition is associative so the oracle replay is exact.
    """
    if tok is None:
        tok = docs.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.lower(F.col(text_col))).alias("toks"),
        )
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    postings = (
        tok.select(
            "doc_id",
            F.size("toks").alias("doclen"),
            F.explode("toks").alias("term"),
        )
        .join(F.broadcast(term_weights), "term")
    )
    tf = postings.groupBy("doc_id", "doclen", "term", "tw").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    part = (
        F.col("tw")
        * idf
        * F.col("tf")
        * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("doclen") / F.col("avgdl"))
        )
    )
    return (
        scored.withColumn(
            "part", F.round(part, 12).cast("decimal(28,12)")
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("part").cast("double"), round_digits).alias(
                "score_prf"
            )
        )
    )
