"""BM25 + RRF hybrid search: model parity on a constructed corpus, fusion
arithmetic, and plan shape (oracle parity runs via the t/p family suites)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mtg_vector_db_spark.operators.text_search import (
    bm25_scores,
    bm25_topk,
    ranked,
    rrf_fuse,
)

CORPUS = [
    (0, "spark join spark"),
    (1, "join vector table"),
    (2, "the quick fox"),
    (3, "spark spark spark spark vector"),
    (4, ""),
]
TERMS = ["spark", "vector"]


def _bm25_model(corpus, terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    out = {}
    for i, toks in docs.items():
        score = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in docs.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if score > 0:
            out[i] = round(score, 6)
    return out


def test_bm25_matches_python_model(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bm25"] for r in bm25_scores(df, TERMS).collect()
    }
    assert got == _bm25_model(CORPUS, TERMS)


def test_bm25_topk_plans_take_ordered(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = (
        bm25_topk(docs, TERMS, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_rrf_fuse_arithmetic(spark):
    a = spark.createDataFrame([(1, 1.0), (2, 0.5)], ["doc_id", "s"])
    b = spark.createDataFrame([(2, 9.9), (3, 0.1)], ["doc_id", "s"])
    fused = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([ranked(a, "s"), ranked(b, "s")]).collect()
    }
    assert fused == {
        1: round(1 / 61, 6),
        2: round(1 / 62 + 1 / 61, 6),
        3: round(1 / 62, 6),
    }


def test_hybrid_includes_both_arms(spark, sf001):
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["p10_hybrid_rrf"](spark, sf001).collect()
    assert len(rows) == 10
    # A doc ranked by BOTH arms outscores one ranked by a single arm at
    # equal single-arm rank; minimally: top fused score exceeds the max
    # possible single-arm contribution iff some doc appears in both lists.
    both = [r for r in rows if r["rrf"] > round(1 / 61, 6)]
    assert both, "expected at least one doc retrieved by both arms"


def test_trigram_join_counts_equal_pairwise_similarity(spark, sf001):
    """The posting-count formula must equal computing pg_trgm similarity
    directly on the joined name pairs."""
    from mtg_vector_db_spark.functions.trigram import trigram_similarity
    from mtg_vector_db_spark.operators.fuzzy_join import trigram_join

    part = spark.read.parquet(f"{sf001}/part.parquet")
    left = part.filter(F.col("p_partkey") < 200)
    right = part.filter(
        (F.col("p_partkey") >= 200) & (F.col("p_partkey") < 400)
    )
    joined = trigram_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name",
        threshold=0.5,
    )
    ln = left.select(F.col("p_partkey").alias("id_l"), F.col("p_name").alias("name_l"))
    rn = right.select(F.col("p_partkey").alias("id_r"), F.col("p_name").alias("name_r"))
    direct = (
        joined.join(ln, "id_l").join(rn, "id_r")
        .withColumn(
            "direct",
            F.round(trigram_similarity(F.col("name_l"), F.col("name_r")), 6),
        )
    )
    assert direct.count() > 0
    assert direct.filter(F.col("sim") != F.col("direct")).count() == 0


def test_trigram_join_df_cap_keeps_identical_names(spark, sf001):
    """With a generous trigram-df cap, exact-duplicate names (sim 1.0)
    must survive blocking."""
    from mtg_vector_db_spark.operators.fuzzy_join import trigram_join

    part = spark.read.parquet(f"{sf001}/part.parquet")
    left = part.filter(F.col("p_partkey") < 500)
    right = part.filter(
        (F.col("p_partkey") >= 500) & (F.col("p_partkey") < 1000)
    )
    exact = trigram_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name",
        threshold=0.999,
    )
    capped = trigram_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name",
        threshold=0.999, max_tri_df=10_000,
    )
    e = {(r["id_l"], r["id_r"]) for r in exact.collect()}
    c = {(r["id_l"], r["id_r"]) for r in capped.collect()}
    assert e and e == c
