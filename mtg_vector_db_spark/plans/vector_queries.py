"""Vector-search queries (SURVEY.md §2.5 K1, §2.7 V1/V2/V9-core, §2.3 J1).

The driver's ``embeddings.parquet`` (vec_id, embedding array<float>, label)
plays the role of the reference's four ``*_embeddings`` tables and
``documents.parquet`` the document side; ``vec_id == doc_id`` is the FK
(J1, /root/reference/db/init.sql:175-176).

The "query embedding" is the stored vector of ``vec_id = 0`` — the Spark
callables look it up with a 1-row driver collect (the analog of the
reference embedding the query string before searching,
db/search_with_reranker.py:273-280) and inline it as a literal; the oracles
use a scalar subquery over the same table, so both sides are self-contained
per scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mtg_vector_db_spark.operators.knn import knn_join, knn_with_documents
from mtg_vector_db_spark.plans.registry import oracle, query, tables

R = 6  # float rounding digits for oracle hash parity


def query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """The probe vector the search queries use (the corpus vector with
    ``vec_id``). Search/build queries derive their probe from the corpus
    by contract — an empty or id-sparse corpus is a caller error, so fail
    with a message naming the contract rather than a downstream
    ``NoneType`` TypeError."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()
    if row is None:
        raise ValueError(
            f"no embedding with vec_id={vec_id} in {sf_dir}/embeddings.parquet"
            " — search queries require a non-empty embeddings corpus"
        )
    return [float(x) for x in row[0]]


_Q_SUB = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
_SIM = f"round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), {_Q_SUB}), {R})"


# ---------------------------------------------------------------------------
# K1: exact KNN top-k + J1 document join — the reference's core retrieval
# (db/search_strategies.py:147-162). Flagship query.
# ---------------------------------------------------------------------------
@query("v01_knn_topk")
def v01_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    return knn_with_documents(
        docs, emb, qv, k=10, doc_cols=("lang", "source"), round_digits=R
    ).orderBy(F.desc("sim"), F.asc("doc_id"))


oracle(
    "v01_knn_topk",
    f"""
    WITH top AS (
      SELECT e.vec_id AS doc_id, {_SIM} AS sim
      FROM embeddings e
      ORDER BY sim DESC, e.vec_id ASC
      LIMIT 10
    )
    SELECT t.doc_id, d.lang, d.source, t.sim
    FROM top t JOIN documents d ON t.doc_id = d.doc_id
    ORDER BY t.sim DESC, t.doc_id ASC
    """,
)


# ---------------------------------------------------------------------------
# P6+K1: threshold-filtered similarity search — the plpgsql table functions
# search_similar_cards/rules/glossary (db/init.sql:159-181,184-210,213-237).
# ---------------------------------------------------------------------------
@query("v02_search_similar_documents")
def v02_search_similar_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    return knn_with_documents(
        docs, emb, qv, k=20, threshold=0.15, doc_cols=("text",), round_digits=R
    ).orderBy(F.desc("sim"), F.asc("doc_id"))


oracle(
    "v02_search_similar_documents",
    f"""
    WITH top AS (
      SELECT e.vec_id AS doc_id, {_SIM} AS sim
      FROM embeddings e
      WHERE {_SIM} > 0.15
      ORDER BY sim DESC, e.vec_id ASC
      LIMIT 20
    )
    SELECT t.doc_id, d.text, t.sim
    FROM top t JOIN documents d ON t.doc_id = d.doc_id
    ORDER BY t.sim DESC, t.doc_id ASC
    """,
)


# ---------------------------------------------------------------------------
# Batch KNN join: per-query top-k for a set of query vectors (the shape the
# reference runs one query at a time, db/search_with_reranker.py:249-290,
# generalized to the batch form a 100 TB pipeline needs).
# ---------------------------------------------------------------------------
@query("v03_knn_batch")
def v03_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_join(emb, queries_df, k=5, round_digits=R)
    return out.select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        "sim",
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


oracle(
    "v03_knn_batch",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), {R}) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, doc_id, sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)


# ---------------------------------------------------------------------------
# Batch KNN via the Arrow/numpy GEMM kernel (operators/ann.py:
# knn_numpy_join) — identical semantics to v03's expression path minus the
# self-exclusion, different physical strategy (broadcast query table →
# mapInPandas partition GEMM → global reduce). Registering both proves the
# kernels agree with the declarative plan; the query table flows through
# the plan, so the registry body contains no driver-side collect.
# ---------------------------------------------------------------------------
@query("v05_knn_numpy_batch")
def v05_knn_numpy_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ann import knn_numpy_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_numpy_join(emb, queries_df, k=5, round_digits=R)
    return out.select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        "sim",
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


oracle(
    "v05_knn_numpy_batch",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), {R}) AS sim
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, doc_id, sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)


# ---------------------------------------------------------------------------
# V2 as a standalone scored projection: similarity + distance columns for a
# band of ids (the SELECT list of init.sql:171-174).
# ---------------------------------------------------------------------------
@query("v04_similarity_projection")
def v04_similarity_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import cosine_similarity

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    sim = F.round(cosine_similarity(F.col("embedding"), qv), R)
    return (
        emb.filter(F.col("vec_id") < 50)
        .select(
            F.col("vec_id").alias("doc_id"),
            sim.alias("sim"),
            F.round(F.lit(1.0) - sim, R).alias("dist"),
        )
        .orderBy("doc_id")
    )


oracle(
    "v04_similarity_projection",
    f"""
    SELECT e.vec_id AS doc_id, {_SIM} AS sim, round(1.0 - {_SIM}, {R}) AS dist
    FROM embeddings e WHERE e.vec_id < 50 ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# Embedding hygiene stats: L2-norm distribution per cluster label — the
# sanity check every vector pipeline runs before indexing (zero vectors,
# un-normalized batches, dimension drift all show up here).
# ---------------------------------------------------------------------------
@query("v06_embedding_norm_stats")
def v06_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", norm.alias("l2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l2"), R).alias("avg_norm"),
            F.round(F.min("l2"), R).alias("min_norm"),
            F.round(F.max("l2"), R).alias("max_norm"),
        )
        .orderBy("label")
    )


oracle(
    "v06_embedding_norm_stats",
    f"""
    WITH n AS (
      SELECT label,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))) AS l2
      FROM embeddings
    )
    SELECT label, count(*) AS n, round(avg(l2), {R}) AS avg_norm,
           round(min(l2), {R}) AS min_norm, round(max(l2), {R}) AS max_norm
    FROM n GROUP BY label ORDER BY label
    """,
)


# ---------------------------------------------------------------------------
# Scalar (int8) quantization error audit (operators/quantize.py:sq_*) — the
# decide-before-you-switch measurement for quantized storage (pgvector's
# halfvec/int8 analog). Train = one posexplode + 64-group agg; apply = one
# nested transform per row; the oracle replays codebook, codes, and
# reconstruction bit-for-bit (explicit floor(x+0.5) half-up, shared
# fixed-order fold).
# ---------------------------------------------------------------------------
@query("v07_sq_reconstruction_error")
def v07_sq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.quantize import (
        sq_reconstruction_error,
        sq_train,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    lo, hi = sq_train(emb)
    err2 = sq_reconstruction_error(emb, lo, hi)
    return (
        emb.select("label", err2.alias("err2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("err2"), 6).alias("mse"),
            F.round(F.max("err2"), 6).alias("max_err2"),
        )
        .orderBy("label")
    )


_SQ_XHAT = (
    "a.los[i] + (CASE WHEN a.his[i] = a.los[i] THEN 0 "
    "ELSE floor((v[i] - a.los[i]) / (a.his[i] - a.los[i]) * 255 + 0.5) END) "
    "/ 255.0 * (a.his[i] - a.los[i])"
)

oracle(
    "v07_sq_reconstruction_error",
    f"""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    mm AS (SELECT i, min(v[i]) AS lo, max(v[i]) AS hi
           FROM e, range(1, 65) t(i) GROUP BY i),
    arrs AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his
             FROM mm),
    r AS (
      SELECT e.label,
             list_sum(list_transform(
               list_transform(range(1, 65), i -> v[i] - ({_SQ_XHAT})),
               d -> d * d)) AS err2
      FROM e CROSS JOIN arrs a
    )
    SELECT label, count(*) AS n_vecs,
           round(avg(err2), 6) AS mse, round(max(err2), 6) AS max_err2
    FROM r GROUP BY label ORDER BY label
    """,
)


# ---------------------------------------------------------------------------
# Metadata-filtered KNN — the "WHERE lang = 'en' ORDER BY embedding <=> q"
# shape (pgvector filtered search; the reference's P7 equality filters
# composed with K1). The filter lands in the scan (PushedFilters) so the
# top-k only scores matching rows — at 100 TB this is the difference
# between scanning a partition and scanning the corpus.
# ---------------------------------------------------------------------------
@query("v08_filtered_knn")
def v08_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.knn import knn

    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    en = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    filtered = emb.join(
        F.broadcast(en), emb["vec_id"] == en["doc_id"]
    ).select("vec_id", "embedding", "lang")
    return (
        knn(filtered, qv, k=10, round_digits=R)
        .join(F.broadcast(en), F.col("vec_id") == en["doc_id"])
        .select(F.col("vec_id").alias("doc_id"), "lang", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
    )


oracle(
    "v08_filtered_knn",
    f"""
    WITH top AS (
      SELECT e.vec_id AS doc_id, d.lang, {_SIM} AS sim
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE d.lang = 'en'
      ORDER BY sim DESC, e.vec_id ASC
      LIMIT 10
    )
    SELECT doc_id, lang, sim FROM top ORDER BY sim DESC, doc_id ASC
    """,
)


# ---------------------------------------------------------------------------
# Pre-normalized KNN (extension): L2-normalize the corpus ONCE (the
# "index build" — at scale this is a stored layout, amortized over every
# query) so each search is a pure dot product: no per-row norm, ~2/3 of
# the KNN arithmetic gone from the hot loop. Same TakeOrderedAndProject
# top-k; the oracle replays normalize-then-dot exactly, so this also
# pins that the stored-normalized layout returns the same ranking as
# the on-the-fly cosine path (v01).
# ---------------------------------------------------------------------------
@query("v09_knn_prenormalized")
def v09_knn_prenormalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import dot, l2_normalize, vec_lit

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    import math

    qn = math.sqrt(sum(x * x for x in qv))
    q_normed = [x / qn for x in qv]
    normalized = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("nvec")
    )
    return (
        normalized.select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot(F.col("nvec"), vec_lit(q_normed)), R).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(10)
    )


oracle(
    "v09_knn_prenormalized",
    f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
    ), qn AS (
      SELECT list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nq
      FROM q
    ), n AS (
      SELECT vec_id AS doc_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                CAST(embedding AS DOUBLE[]))))
               AS nvec
      FROM embeddings
    )
    SELECT doc_id, round(list_inner_product(nvec, nq), {R}) AS sim
    FROM n, qn
    ORDER BY sim DESC, doc_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Embedding drift monitor (extension): split the corpus into two
# deterministic md5 cohorts (stand-ins for yesterday/today snapshots)
# and compare their distributions — row counts, mean L2 norm, and the
# cosine between cohort CENTROIDS. Centroids aggregate in long format
# ((cohort, pos) keys — one narrow shuffle, no wide-row collect), and
# the final cosine folds 64 centroid components. This is the nightly
# data-quality check that catches an embedder regression before it
# poisons retrieval.
# ---------------------------------------------------------------------------
@query("v10_embedding_drift")
def v10_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.functions.vector import l2_norm

    (emb,) = tables(spark, sf_dir, "embeddings")
    cohort = F.when(hash_fraction(F.col("vec_id")) < 0.5, "a").otherwise("b")
    h = emb.select(cohort.alias("cohort"), "embedding")
    stats = (
        h.select("cohort", l2_norm(F.col("embedding")).alias("nrm"))
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 6).alias("mean_norm"),
        )
    )
    cents = (
        h.select("cohort", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cohort", "pos")
        .agg(F.avg("v").alias("c"))
    )
    wide = cents.groupBy("pos").agg(
        F.max(F.when(F.col("cohort") == "a", F.col("c"))).alias("ca"),
        F.max(F.when(F.col("cohort") == "b", F.col("c"))).alias("cb"),
    )
    cos = wide.agg(
        F.round(
            F.sum(F.col("ca") * F.col("cb"))
            / (
                F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
            ),
            6,
        ).alias("centroid_cosine")
    )
    a = stats.filter(F.col("cohort") == "a").select(
        F.col("n").alias("n_a"), F.col("mean_norm").alias("mean_norm_a")
    )
    b = stats.filter(F.col("cohort") == "b").select(
        F.col("n").alias("n_b"), F.col("mean_norm").alias("mean_norm_b")
    )
    return a.crossJoin(b).crossJoin(cos)


_HF_VEC = (
    "list_sum(list_transform(range(1, 9),"
    " i -> (strpos('0123456789abcdef',"
    " substring(md5(CAST(vec_id AS VARCHAR)), i, 1)) - 1)"
    " * power(16, 8 - i))) / 4294967296.0"
)

oracle(
    "v10_embedding_drift",
    f"""
    WITH h AS (
      SELECT CASE WHEN {_HF_VEC} < 0.5 THEN 'a' ELSE 'b' END AS cohort,
             embedding
      FROM embeddings
    ), stats AS (
      SELECT cohort, count(*) AS n,
             round(avg(sqrt(list_inner_product(
               CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 6)
               AS mean_norm
      FROM h GROUP BY 1
    ), cents AS (
      SELECT cohort, i, avg(embedding[i]) AS c
      FROM h, range(1, 65) t(i) GROUP BY 1, 2
    ), wide AS (
      SELECT i, max(CASE WHEN cohort = 'a' THEN c END) AS ca,
             max(CASE WHEN cohort = 'b' THEN c END) AS cb
      FROM cents GROUP BY 1
    ), cos AS (
      SELECT round(sum(ca * cb) / (sqrt(sum(ca * ca)) * sqrt(sum(cb * cb))),
                   6) AS centroid_cosine
      FROM wide
    )
    SELECT a.n AS n_a, a.mean_norm AS mean_norm_a,
           b.n AS n_b, b.mean_norm AS mean_norm_b,
           cos.centroid_cosine
    FROM stats a, stats b, cos
    WHERE a.cohort = 'a' AND b.cohort = 'b'
    """,
)


# ---------------------------------------------------------------------------
# V11: Matryoshka (MRL) prefix-dimension search — coarse top-50 by cosine
# over the first 16 dims, exact full-dimension rescore to top-10
# (Kusupati et al. 2022). At scale the 16-d prefix lives as its own
# column (or its own index), so the coarse scan reads a quarter of the
# vector bytes and the full vectors are fetched for 50 rows only; both
# stages plan TakeOrderedAndProject, never a global sort.
# ---------------------------------------------------------------------------
@query("v11_mrl_prefix_search")
def v11_mrl_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import cosine_similarity

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    prefix_sim = F.round(
        cosine_similarity(F.slice(F.col("embedding"), 1, 16), qv[:16]), R
    )
    cand = (
        emb.select("vec_id", "embedding", prefix_sim.alias("psim"))
        .orderBy(F.desc("psim"), F.asc("vec_id"))
        .limit(50)
    )
    full_sim = F.round(cosine_similarity(F.col("embedding"), qv), R)
    return (
        cand.select(
            F.col("vec_id").alias("doc_id"), "psim", full_sim.alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(10)
    )


_Q16_SUB = (
    "(SELECT CAST(embedding[1:16] AS DOUBLE[]) FROM embeddings"
    " WHERE vec_id = 0)"
)
oracle(
    "v11_mrl_prefix_search",
    f"""
    WITH cand AS (
      SELECT vec_id, embedding,
             round(list_cosine_similarity(
               CAST(embedding[1:16] AS DOUBLE[]), {_Q16_SUB}), {R}) AS psim
      FROM embeddings
      ORDER BY psim DESC, vec_id ASC LIMIT 50
    )
    SELECT vec_id AS doc_id, psim,
           round(list_cosine_similarity(
             CAST(embedding AS DOUBLE[]), {_Q_SUB}), {R}) AS sim
    FROM cand ORDER BY sim DESC, doc_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# V12: label-separability report — per-label centroid scatter: mean
# distance of vectors to their own centroid (intra), distance of the
# label centroid to the global centroid (inter), and their ratio — the
# embedding-quality datasheet row a curator reads before trusting labels
# for blocking/negative mining. Computed entirely in long (vec, pos)
# form — centroids are never materialized as arrays — with the exact-
# DECIMAL sum discipline so every mean is partition-order-independent
# and engine-portable. Shuffles: (label, pos) centroid agg, per-vec
# reduce, label reduce — all map-side combinable; centroid tables are
# label-count × dim rows, broadcast into the distance pass.
# ---------------------------------------------------------------------------
@query("v12_label_separability")
def v12_label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    long = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "label",
        "pos",
        F.col("val").cast("double").alias("val"),
        F.round(F.col("val").cast("double"), 12)
        .cast("decimal(28,12)")
        .alias("v"),
    )
    cent = long.groupBy("label", "pos").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("c"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    glob = long.groupBy("pos").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("g")
    )
    # Per-vector distance to own centroid → per-label intra mean.
    sq = F.round(
        (F.col("val") - F.col("c")) * (F.col("val") - F.col("c")), 12
    ).cast("decimal(28,12)")
    per_vec = (
        long.join(F.broadcast(cent.select("label", "pos", "c")), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum(sq).cast("double")).alias("dist"))
    )
    intra = per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum(F.round(F.col("dist"), 12).cast("decimal(28,12)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("intra"),
    )
    # Label centroid → global centroid distance.
    gsq = F.round(
        (F.col("c") - F.col("g")) * (F.col("c") - F.col("g")), 12
    ).cast("decimal(28,12)")
    inter = (
        cent.join(F.broadcast(glob), "pos")
        .groupBy("label")
        .agg(F.sqrt(F.sum(gsq).cast("double")).alias("cdist"))
    )
    return (
        intra.join(inter, "label")
        .select(
            "label",
            "n_vecs",
            F.round("intra", R).alias("intra_mean"),
            F.round("cdist", R).alias("centroid_dist"),
            F.round(F.col("cdist") / F.col("intra"), R).alias("separability"),
        )
        .orderBy("label")
    )


oracle(
    "v12_label_separability",
    f"""
    WITH long AS (
      SELECT vec_id, label, i AS pos,
             CAST(embedding[i] AS DOUBLE) AS val,
             CAST(round(CAST(embedding[i] AS DOUBLE), 12)
                  AS DECIMAL(28,12)) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (
      SELECT label, pos, CAST(sum(v) AS DOUBLE) / count(*) AS c
      FROM long GROUP BY 1, 2
    ),
    gcent AS (
      SELECT pos, CAST(sum(v) AS DOUBLE) / count(*) AS g
      FROM long GROUP BY 1
    ),
    per_vec AS (
      SELECT vec_id, long.label,
             sqrt(CAST(sum(CAST(round((val - c) * (val - c), 12)
                                AS DECIMAL(28,12))) AS DOUBLE)) AS dist
      FROM long JOIN cent ON long.label = cent.label AND long.pos = cent.pos
      GROUP BY 1, 2
    ),
    intra AS (
      SELECT label, count(*) AS n_vecs,
             CAST(sum(CAST(round(dist, 12) AS DECIMAL(28,12))) AS DOUBLE)
               / count(*) AS intra
      FROM per_vec GROUP BY 1
    ),
    inter AS (
      SELECT label,
             sqrt(CAST(sum(CAST(round((c - g) * (c - g), 12)
                                AS DECIMAL(28,12))) AS DOUBLE)) AS cdist
      FROM cent JOIN gcent USING (pos) GROUP BY 1
    )
    SELECT label, n_vecs, round(intra, {R}) AS intra_mean,
           round(cdist, {R}) AS centroid_dist,
           round(cdist / intra, {R}) AS separability
    FROM intra JOIN inter USING (label)
    ORDER BY label
    """,
)


# ---------------------------------------------------------------------------
# V13 (extension): embedding dispersion — per-label MEAN PAIRWISE
# cosine, computed WITHOUT the O(n²) pair join: for unit vectors,
# Σ_{i≠j} cos(v_i, v_j) = ‖Σ_i v_i‖² − Σ_i ‖v_i‖², so the whole
# statistic reduces to per-dimension sums — one explode + two keyed
# aggregations, O(n·d) at any corpus size. (The collapse-detection
# metric for synthetic/curated data: dispersion → 1 means the corpus
# is folding onto one direction.) Components are rounded then summed
# as DECIMAL(28,12) — partition-order-independent, engine-exact.
# ---------------------------------------------------------------------------
_V13_DIM = 64


@query("v13_embedding_dispersion")
def v13_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import l2_normalize

    (emb,) = tables(spark, sf_dir, "embeddings")
    nx = emb.select(
        "label",
        F.transform(
            l2_normalize(F.col("embedding")), lambda x: F.round(x, 9)
        ).alias("nx"),
    )
    ex = nx.select(
        "label", F.posexplode(F.col("nx")).alias("dim", "val")
    )
    per_dim = ex.groupBy("label", "dim").agg(
        F.sum(F.round(F.col("val"), 12).cast("decimal(28,12)")).alias("sd"),
        F.sum(
            F.round(F.col("val") * F.col("val"), 12).cast("decimal(28,12)")
        ).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    agg = per_dim.groupBy("label").agg(
        F.sum(
            F.round(
                F.col("sd").cast("double") * F.col("sd").cast("double"), 12
            ).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("s2"),
        F.sum("sq").cast("double").alias("ssq"),
        F.max("n").alias("n_vecs"),
    )
    return agg.select(
        "label",
        "n_vecs",
        F.round(F.sqrt(F.col("s2")) / F.col("n_vecs"), 6).alias(
            "centroid_norm"
        ),
        F.round(
            (F.col("s2") - F.col("ssq"))
            / (F.col("n_vecs") * (F.col("n_vecs") - F.lit(1))).cast(
                "double"
            ),
            6,
        ).alias("mean_pairwise_cos"),
    ).orderBy("label")


oracle(
    "v13_embedding_dispersion",
    f"""
    WITH n0 AS (
      SELECT label,
             list_transform(
               list_transform(CAST(embedding AS DOUBLE[]),
                 x -> x / sqrt(list_inner_product(
                   CAST(embedding AS DOUBLE[]),
                   CAST(embedding AS DOUBLE[])))),
               x -> round(x, 9)) AS nx
      FROM embeddings
    ),
    ex AS (
      SELECT label, i - 1 AS dim, nx[i] AS val
      FROM n0, unnest(range(1, {_V13_DIM + 1})) u(i)
    ),
    per_dim AS (
      SELECT label, dim,
             sum(CAST(round(val, 12) AS DECIMAL(28,12))) AS sd,
             sum(CAST(round(val * val, 12) AS DECIMAL(28,12))) AS sq,
             count(*) AS n
      FROM ex GROUP BY label, dim
    ),
    agg AS (
      SELECT label,
             CAST(sum(CAST(round(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE),
                  12) AS DECIMAL(28,12))) AS DOUBLE) AS s2,
             CAST(sum(sq) AS DOUBLE) AS ssq,
             CAST(max(n) AS BIGINT) AS n_vecs
      FROM per_dim GROUP BY label
    )
    SELECT label, n_vecs,
           round(sqrt(s2) / n_vecs, 6) AS centroid_norm,
           round((s2 - ssq) / CAST(n_vecs * (n_vecs - 1) AS DOUBLE), 6)
             AS mean_pairwise_cos
    FROM agg ORDER BY label
    """,
)


# ---------------------------------------------------------------------------
# V14 (extension): scalar-quantization bit-width sweep — reconstruction
# MSE at 2/4/8 bits per dim from ONE corpus scan: the per-dim min/max
# train step is bit-independent, so each bit width is one more
# conditional reconstruction expression over the same row, stacked to
# rows (the knob-sweep discipline on the storage knob). The output is
# the error-vs-compression curve read against a recall budget; 32/bits
# is the compression factor vs float32.
# ---------------------------------------------------------------------------
_V14_BITS = (2, 4, 8)


@query("v14_sq_bits_sweep")
def v14_sq_bits_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.quantize import (
        sq_reconstruction_error,
        sq_train,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    lo, hi = sq_train(emb)
    errs = [
        sq_reconstruction_error(emb, lo, hi, levels=2**b - 1).alias(
            f"e_{b}"
        )
        for b in _V14_BITS
    ]
    one = emb.select(*errs)
    stacked = one.select(
        F.expr(
            f"stack({len(_V14_BITS)}, "
            + ", ".join(f"{b}, e_{b}" for b in _V14_BITS)
            + ") AS (bits, err2)"
        )
    )
    return (
        stacked.groupBy("bits")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("err2"), 6).alias("mse"),
            F.round(F.max("err2"), 6).alias("max_err2"),
        )
        .select(
            F.col("bits").cast("long").alias("bits"),
            (F.lit(32.0) / F.col("bits")).alias("compression_x"),
            "n_vecs",
            "mse",
            "max_err2",
        )
        .orderBy("bits")
    )


def _v14_oracle() -> str:
    def xhat(levels: int) -> str:
        return (
            f"a.los[i] + (CASE WHEN a.his[i] = a.los[i] THEN 0 "
            f"ELSE floor((v[i] - a.los[i]) / (a.his[i] - a.los[i])"
            f" * {levels} + 0.5) END) / {levels}.0 * (a.his[i] - a.los[i])"
        )

    errs = ", ".join(
        f"list_sum(list_transform(list_transform(range(1, 65),"
        f" i -> v[i] - ({xhat(2**b - 1)})), d -> d * d)) AS e_{b}"
        for b in _V14_BITS
    )
    branches = " UNION ALL ".join(
        f"SELECT {b} AS bits, e_{b} AS err2 FROM r" for b in _V14_BITS
    )
    return f"""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    mm AS (SELECT i, min(v[i]) AS lo, max(v[i]) AS hi
           FROM e, range(1, 65) t(i) GROUP BY i),
    arrs AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his
             FROM mm),
    r AS (SELECT {errs} FROM e CROSS JOIN arrs a),
    st AS ({branches})
    SELECT CAST(bits AS BIGINT) AS bits,
           CAST(32.0 / bits AS DOUBLE) AS compression_x,
           count(*) AS n_vecs,
           round(avg(err2), 6) AS mse, round(max(err2), 6) AS max_err2
    FROM st GROUP BY bits ORDER BY bits
    """


oracle("v14_sq_bits_sweep", _v14_oracle())


# ---------------------------------------------------------------------------
# V15 (extension): residual quantization (RQ) reconstruction audit — the
# additive-codebook family behind modern billion-scale indexes: stage 1
# picks the nearest of 16 seed codewords (raw vectors id < 16, the p17
# freeze pattern), stage 2 refines with the nearest of {exact zero} ∪
# {stage-1 residuals of the NEXT 15 vectors, 16 ≤ id < 31 — the seeds
# themselves assign to themselves with zero residual}. The zero
# codeword makes stage 2
# monotone BY CONSTRUCTION (argmin can always keep the residual), so
# mse_stage2 ≤ mse_stage1 per label is an invariant, not a hope — tests
# pin it. One corpus scan; codebooks are literal tables (k-row bounded
# collects, never corpus-sized); round-before-argmin at 9 digits keeps
# the assignment decisions engine-portable, and the SQL replays the full
# assign → residual → assign → error chain.
# ---------------------------------------------------------------------------
_V15_K = 16


@query("v15_rq_error")
def v15_rq_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.quantize import (
        rq_error_report,
        seeded_rq_codebooks,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    cb1, cb2 = seeded_rq_codebooks(emb, k=_V15_K)
    return rq_error_report(emb, cb1, cb2)


def _v15_oracle() -> str:
    k = _V15_K
    res = "list_transform(range(1, 65), i -> p.v[i] - cb.c[i])"
    res2 = "list_transform(range(1, 65), i -> p.r[i] - cb.c[i])"
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    cb1 AS (SELECT CAST(vec_id AS INT) AS j, v AS c,
                   list_inner_product(v, v) AS cc
            FROM e WHERE vec_id < {k}),
    a1 AS (SELECT e.vec_id, e.label, e.v, cb1.j,
                  round(cb1.cc - 2 * list_inner_product(e.v, cb1.c), 9) AS d
           FROM e CROSS JOIN cb1),
    p1 AS (SELECT vec_id, label, v, j AS c1 FROM (
             SELECT vec_id, label, v, j, row_number() OVER (
               PARTITION BY vec_id ORDER BY d, j) AS rn FROM a1)
           WHERE rn = 1),
    r1 AS (SELECT p.vec_id, p.label, {res} AS r
           FROM p1 p JOIN cb1 cb ON cb.j = p.c1),
    cb2 AS (SELECT 0 AS j, list_transform(range(1, 65), i -> 0.0) AS c
            UNION ALL
            SELECT CAST(vec_id - {k} + 1 AS INT) AS j, r AS c
            FROM r1 WHERE vec_id >= {k} AND vec_id < {2 * k - 1}),
    cb2n AS (SELECT j, c, list_inner_product(c, c) AS cc FROM cb2),
    a2 AS (SELECT r1.vec_id, r1.label, r1.r, cb2n.j,
                  round(cb2n.cc - 2 * list_inner_product(r1.r, cb2n.c), 9) AS d
           FROM r1 CROSS JOIN cb2n),
    p2 AS (SELECT vec_id, label, r, j AS c2 FROM (
             SELECT vec_id, label, r, j, row_number() OVER (
               PARTITION BY vec_id ORDER BY d, j) AS rn FROM a2)
           WHERE rn = 1),
    errs AS (
      SELECT p.label,
             list_sum(list_transform(p.r, d -> d * d)) AS err1,
             list_sum(list_transform({res2}, d -> d * d)) AS err2
      FROM p2 p JOIN cb2 cb ON cb.j = p.c2
    )
    SELECT label, count(*) AS n_vecs,
           round(avg(err1), 6) AS mse_stage1,
           round(avg(err2), 6) AS mse_stage2
    FROM errs GROUP BY label ORDER BY label
    """


oracle("v15_rq_error", _v15_oracle())



# ---------------------------------------------------------------------------
# V16 (extension): top principal component by fixed-round power iteration —
# the embedding-diagnostics spectral step (anisotropy / "rogue dimension"
# detection; the train step of PCA-whitening and of OPQ's rotation). The
# d×d covariance is NEVER materialized: C·v collapses to
# Σ_i (x_i − μ)((x_i − μ)·v) / n, so each round is one O(n·d) scan — a
# per-row integer dot against the broadcast direction, then a per-dim
# map-side-combinable sum. Round artifacts (64-dim mean, per-round
# direction) are bounded driver collects, the documented centroid-fetch
# pattern; at 100 TB the rounds re-scan parquet (production would persist
# the fixed-point corpus once — a plan property, not a semantic one).
#
# Engine parity is FIXED-POINT, not round(): products of round-9 ×
# round-6 decimals land exactly ON round-12 tie boundaries, where
# Spark (exact BigDecimal half-up) and DuckDB (scaled-float) disagree
# systematically — measured 68/32k contributions at sf0.001 before this
# design. Instead every checkpoint is `floor(x*scale + 0.5)` — pure IEEE
# multiply/add/floor, bit-identical in any engine — and cross-row sums
# ride exact integers (DECIMAL(38,0) where n×magnitude could outgrow
# int64). The fixed-point is RELATIVE: components are divided by the
# corpus max-abs (one orderless max aggregate — exact in any engine)
# before integerization, so |x_scaled| ≤ 1 bounds every intermediate
# (c ≤ 2e9 nano, per-row dot ≤ 64·2e9·1e6 ≈ 1.3e17, contribution
# ≤ 3.2e16) for ANY input magnitude — unnormalized or σ≫1 embeddings
# overflowed the absolute-unit design's val² at |x| > 3. Loadings and
# explained_ratio are scale-invariant; the eigenvalue is multiplied back
# by gmax². No engine round() anywhere in the chain; the display floats
# at the end are exact small-integer/1e6 quotients. v0 = e_0; the
# eigenvalue estimate is ‖Σ (x−μ)·coef‖ / n = ‖C·v‖ → λ_max, and
# explained_ratio divides by trace(C) from the same stats pass.
# ---------------------------------------------------------------------------
_V16_DIM = 64
_V16_ROUNDS = 3


def _fx(x: F.Column, scale: float) -> F.Column:
    """floor(x*scale + 0.5) as LONG — engine-portable fixed-point."""
    return F.floor(x * F.lit(scale) + F.lit(0.5))


def _int_lit(v: list) -> F.Column:
    return F.array(*[F.lit(int(x)).cast("long") for x in v])


def _v16_eint(col: F.Column, gmax: float) -> F.Column:
    """Embedding components in exact nano-units of the RELATIVE scale
    x/gmax (long array, |value| ≤ 1e9 by construction)."""
    return F.transform(
        col, lambda y: _fx(y.cast("double") / F.lit(gmax), 1e9)
    )


def _v16_gmax(emb: DataFrame) -> float:
    """Corpus max-abs component — an orderless max aggregate, exact in
    any engine; 1-row bounded collect. Guarded to 1.0 for an all-zero
    corpus (mirrors the oracle's CASE)."""
    import math

    g = emb.agg(
        F.max(
            F.array_max(
                F.transform(
                    F.col("embedding"), lambda y: F.abs(y.cast("double"))
                )
            )
        ).alias("m")
    ).first()["m"]
    if g is None or math.isnan(g) or not g > 0:
        return 1.0
    return float(g)


def _v16_round_sums(
    emb: DataFrame, gmax: float, mu_int: list, v_int: list
) -> DataFrame:
    """One power-iteration round: per-dim exact-integer sums of
    c·coef, with c in nano-units and coef in micro-units (so the sum
    carries units of 1e-15). The centered array and its coefficient are
    bound ONCE through singleton-array lambdas (HOFs have no CSE — see
    functions/vector.py:l2_normalize)."""
    centered = F.zip_with(
        _v16_eint(F.col("embedding"), gmax),
        _int_lit(mu_int),
        lambda x, m: x - m,
    )

    def per_row(cc):
        # Exact int64 fold: |c|≤2e9 nano × |v|≤1e6 micro × 64 ≤ 1.3e17.
        raw = F.aggregate(
            F.zip_with(cc, _int_lit(v_int), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        # Rescale 1e-15 → 1e-6 units via the deterministic double path
        # (int64→double cast is IEEE round-to-nearest in both engines).
        coef = _fx(raw.cast("double") * F.lit(1e-9), 1.0)
        return F.get(
            F.transform(
                F.array(coef), lambda f: F.transform(cc, lambda z: z * f)
            ),
            0,
        )

    contribs = F.get(F.transform(F.array(centered), per_row), 0)
    ex = emb.select(F.posexplode(contribs).alias("dim", "p"))
    # DECIMAL(38,0), not long: per-row terms reach ~6e14, so int64 sums
    # overflow past ~15k rows; decimal keeps the sum exact and orderless
    # at any corpus size.
    return ex.groupBy("dim").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )


def _v16_norm(sd: DataFrame) -> DataFrame:
    """‖C·v‖ from the per-dim sums: sd_n = sd·1e-15/n ≈ (C·v)_dim,
    squared into 1e-15-unit integers (orderless 64-row sum), rooted."""
    sd_n = F.col("sd").cast("double") * F.lit(1e-15) / F.col("n")
    return sd.select(
        _fx(sd_n * sd_n, 1e15).alias("sq"), F.col("n")
    ).agg(
        F.sqrt(F.sum("sq").cast("double") * F.lit(1e-15)).alias("nrm"),
        F.max("n").alias("nv"),
    )


def _v16_stats(emb: DataFrame, gmax: float) -> tuple[list, float]:
    """(integer mean vector, scaled trace) — 64-row bounded collect
    (the centroid-fetch pattern): exact longs, so no Python float op can
    drift from the oracle's replay."""
    ex = emb.select(
        F.posexplode(_v16_eint(F.col("embedding"), gmax)).alias("dim", "val")
    )
    st = ex.groupBy("dim").agg(
        F.sum(F.col("val").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("val") * F.col("val")).cast("decimal(38,0)")
        ).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    mu_nano = F.col("s").cast("double") / F.col("n")
    m2 = F.col("sq").cast("double") / F.col("n")
    stat_rows = (
        st.select(
            "dim",
            _fx(mu_nano, 1.0).alias("mu_int"),
            _fx(m2 - mu_nano * mu_nano, 1.0).alias("var_int"),
        )
        .orderBy("dim")
        .collect()
    )
    mu_int = [r["mu_int"] for r in stat_rows]
    trace = sum(r["var_int"] for r in stat_rows) * 1e-18
    return mu_int, trace


@query("v16_power_iteration_pca")
def v16_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")

    gmax = _v16_gmax(emb)
    mu_int, trace = _v16_stats(emb, gmax)

    v_int = [1_000_000] + [0] * (_V16_DIM - 1)
    for _ in range(_V16_ROUNDS - 1):
        sd = _v16_round_sums(emb, gmax, mu_int, v_int)
        sd_n = F.col("sd").cast("double") * F.lit(1e-15) / F.col("n")
        vdf = sd.crossJoin(F.broadcast(_v16_norm(sd))).select(
            "dim", _fx(sd_n / F.col("nrm"), 1e6).alias("vi")
        )
        v_int = [r["vi"] for r in vdf.orderBy("dim").collect()]

    sd = _v16_round_sums(emb, gmax, mu_int, v_int)
    sd_n = F.col("sd").cast("double") * F.lit(1e-15) / F.col("n")
    # Scaled units throughout; the eigenvalue converts back (gmax² — the
    # covariance is quadratic in the input scale). loading and
    # explained_ratio are scale-invariant.
    lam = F.col("nrm") * F.lit(gmax) * F.lit(gmax)
    return (
        sd.crossJoin(F.broadcast(_v16_norm(sd)))
        .select(
            "dim",
            (
                _fx(sd_n / F.col("nrm"), 1e6).cast("double") / F.lit(1e6)
            ).alias("loading"),
            (_fx(lam, 1e6).cast("double") / F.lit(1e6)).alias("eigenvalue"),
            # ratio from SCALED nrm against the scaled trace — the g²
            # factors cancel, so scaling back either side would skew it.
            (
                _fx(F.col("nrm") / F.lit(trace), 1e6).cast("double")
                / F.lit(1e6)
            ).alias("explained_ratio"),
            F.col("nv").alias("n_vecs"),
        )
        .orderBy("dim")
    )


def _v16_chain(emit_last_v: bool = False) -> str:
    """The shared WITH-chain: scaling, stats, centered corpus, and the
    three power rounds. ``emit_last_v`` additionally materializes the
    round-3 direction as list (v3) and per-dim table (v3t) CTEs — the
    deflation seed v17 needs."""
    d = _V16_DIM
    head = f"""
    WITH gm AS (SELECT CASE WHEN m > 0 AND NOT isnan(m)
                            THEN m ELSE 1.0 END AS g
                FROM (SELECT max(list_max(list_transform(
                        CAST(embedding AS DOUBLE[]), y -> abs(y)))) AS m
                      FROM embeddings)),
    x AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                 y -> CAST(floor(y / g * 1e9 + 0.5) AS BIGINT)) AS e
          FROM embeddings CROSS JOIN gm),
    ex AS (SELECT i - 1 AS dim, e[i] AS val
           FROM x, unnest(range(1, {d + 1})) u(i)),
    st AS (SELECT dim,
             CAST(sum(CAST(val AS DECIMAL(38,0))) AS DOUBLE)
               / count(*) AS mu_nano,
             CAST(sum(CAST(val * val AS DECIMAL(38,0))) AS DOUBLE)
               / count(*) AS m2,
             count(*) AS n
           FROM ex GROUP BY dim),
    sti AS (SELECT dim,
              CAST(floor(mu_nano + 0.5) AS BIGINT) AS mu_int,
              CAST(floor(m2 - mu_nano * mu_nano + 0.5) AS BIGINT) AS var_int
            FROM st),
    tr AS (SELECT CAST(sum(var_int) AS DOUBLE) * 1e-18 AS trace FROM sti),
    ml AS (SELECT list(mu_int ORDER BY dim) AS m FROM sti),
    cx AS (SELECT list_transform(range(1, {d + 1}), i -> e[i] - m[i]) AS c
           FROM x CROSS JOIN ml),
    v0 AS (SELECT list_transform(range(1, {d + 1}),
                    i -> CASE WHEN i = 1
                         THEN CAST(1000000 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END) AS v)"""
    rounds = []
    for r in range(1, _V16_ROUNDS + 1):
        rounds.append(f"""
    f{r} AS (SELECT c, CAST(floor(CAST(list_reduce(
                      list_transform(range(1, {d + 1}),
                                     i -> c[i] * v[i]),
                      (a, b) -> a + b) AS DOUBLE) * 1e-9 + 0.5)
                    AS BIGINT) AS f
             FROM cx CROSS JOIN v{r - 1}),
    u{r} AS (SELECT i - 1 AS dim, c[i] * f AS p
             FROM f{r}, unnest(range(1, {d + 1})) u(i)),
    s{r} AS (SELECT dim, sum(CAST(p AS DECIMAL(38,0))) AS sd,
                    count(*) AS n
             FROM u{r} GROUP BY dim),
    sn{r} AS (SELECT dim, CAST(sd AS DOUBLE) * 1e-15 / n AS sd_n, n
              FROM s{r}),
    n{r} AS (SELECT sqrt(CAST(sum(
                      CAST(floor(sd_n * sd_n * 1e15 + 0.5) AS BIGINT))
                    AS DOUBLE) * 1e-15) AS nrm,
                    max(n) AS nv
             FROM sn{r})""")
        if r < _V16_ROUNDS or emit_last_v:
            rounds.append(f"""
    v{r} AS (SELECT list(CAST(floor(sd_n / nrm * 1e6 + 0.5) AS BIGINT)
                         ORDER BY dim) AS v
             FROM sn{r} CROSS JOIN n{r})""")
    if emit_last_v:
        rounds.append(f"""
    v{_V16_ROUNDS}t AS (SELECT dim,
                  CAST(floor(sd_n / nrm * 1e6 + 0.5) AS BIGINT) AS vi
           FROM sn{_V16_ROUNDS} CROSS JOIN n{_V16_ROUNDS})""")
    sql = head + "," + ",".join(rounds)
    # MATERIALIZED, or DuckDB inlines every CTE into its consumers and
    # the chained rounds re-evaluate the whole upstream chain at each
    # depth — exponential: v16's 3 rounds ran in seconds, v17's 6 hung.
    return sql.replace(" AS (", " AS MATERIALIZED (")


def _v16_oracle() -> str:
    last = _V16_ROUNDS
    tail = f"""
    SELECT dim,
           CAST(floor(sd_n / nrm * 1e6 + 0.5) AS BIGINT) / 1e6 AS loading,
           CAST(floor(nrm * g * g * 1e6 + 0.5) AS BIGINT) / 1e6
             AS eigenvalue,
           CAST(floor(nrm / trace * 1e6 + 0.5) AS BIGINT) / 1e6
             AS explained_ratio,
           nv AS n_vecs
    FROM sn{last} CROSS JOIN n{last} CROSS JOIN tr CROSS JOIN gm
    ORDER BY dim"""
    return _v16_chain() + tail


oracle("v16_power_iteration_pca", _v16_oracle())


# ---------------------------------------------------------------------------
# V17 (extension): two-component spectrum by DEFLATED power iteration —
# the "all-but-the-top" diagnostic pair (Mu & Viswanath '18: embedding
# quality improves when the mean and top principal directions are
# removed; deciding WHETHER to apply it needs exactly λ₁, λ₂ and their
# trace shares). Component 1 re-runs v16's rounds; component 2 runs
# three more rounds where each per-dim sum s is deflated to
# s − ((s·v₁)/(v₁·v₁))·v₁ before normalizing — power iteration on the
# orthogonal complement, converging to λ₂. All deflation math happens on
# the 64-dim round artifacts (driver-side for the iterated rounds, as
# Column expressions over the 64-row sums for the final in-plan round) —
# the corpus-scale work stays the same O(n·d) scans as v16. Parity is
# the same fixed-point discipline: driver Python, Spark expressions, and
# the SQL replay all compute bit-identical IEEE chains with
# floor(x·scale+0.5) checkpoints; Python float ops ARE IEEE doubles, so
# the three-way agreement is by construction, not luck. Degenerate
# rank-1 corpora (w ⟂-component ≈ 0) would blow up the normalization —
# real corpora are nowhere near that.
# ---------------------------------------------------------------------------
def _v17_sums_list(
    emb: DataFrame, gmax: float, mu_int: list, v_int: list
) -> tuple[list, int]:
    rows = (
        _v16_round_sums(emb, gmax, mu_int, v_int).orderBy("dim").collect()
    )
    return [int(r["sd"]) for r in rows], int(rows[0]["n"])


@query("v17_top2_spectrum")
def v17_top2_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    (emb,) = tables(spark, sf_dir, "embeddings")
    gmax = _v16_gmax(emb)
    mu_int, trace = _v16_stats(emb, gmax)

    def advance(v_int: list) -> list:
        sdl, n = _v17_sums_list(emb, gmax, mu_int, v_int)
        s_n = [sd * 1e-15 / n for sd in sdl]
        nrm = math.sqrt(
            float(sum(math.floor(x * x * 1e15 + 0.5) for x in s_n)) * 1e-15
        )
        return [math.floor(x / nrm * 1e6 + 0.5) for x in s_n]

    # Component 1: v16's rounds; keep the round-2 direction (the one the
    # in-plan λ₁ branch re-scores, matching v16's reported eigenvalue)
    # and the round-3 direction (the deflation axis).
    dirs = []
    v = [1_000_000] + [0] * (_V16_DIM - 1)
    for _ in range(_V16_ROUNDS):
        v = advance(v)
        dirs.append(v)
    v2_dir, v1_pc = dirs[_V16_ROUNDS - 2], dirs[_V16_ROUNDS - 1]

    vv = [vi / 1e6 for vi in v1_pc]
    vn2 = sum(math.floor(x * x * 1e15 + 0.5) for x in vv)

    # Component 2: deflated rounds 1..2 driver-side (64-dim artifacts).
    w = [0, 1_000_000] + [0] * (_V16_DIM - 2)
    for _ in range(_V16_ROUNDS - 1):
        sdl, n = _v17_sums_list(emb, gmax, mu_int, w)
        s_n = [sd * 1e-15 / n for sd in sdl]
        pj = sum(
            math.floor(s * x * 1e15 + 0.5) for s, x in zip(s_n, vv)
        )
        coef = float(pj) / float(vn2)
        w_val = [s - coef * x for s, x in zip(s_n, vv)]
        wnrm = math.sqrt(
            float(sum(math.floor(x * x * 1e15 + 0.5) for x in w_val))
            * 1e-15
        )
        w = [math.floor(x / wnrm * 1e6 + 0.5) for x in w_val]

    sn_col = F.col("sd").cast("double") * F.lit(1e-15) / F.col("n")
    v1t = F.broadcast(
        spark.createDataFrame(
            list(enumerate(v1_pc)), "dim int, vi bigint"
        )
    )
    vval = F.col("vi") / F.lit(1e6)

    # Component-1 row: round-3 sums (direction v2) scored in-plan.
    sd1 = _v16_round_sums(emb, gmax, mu_int, v2_dir)
    lam1 = F.col("nrm") * F.lit(gmax) * F.lit(gmax)
    row1_base = _v16_norm(sd1)

    # Component-2 row: deflated round-3, entirely in-plan over the
    # 64-row sums (broadcast scalars; BNLJ on 1-row folds).
    sd2 = _v16_round_sums(emb, gmax, mu_int, w).select(
        "dim", sn_col.alias("sn"), "n"
    ).join(v1t, "dim")
    proj = sd2.agg(
        F.sum(_fx(F.col("sn") * vval, 1e15)).alias("pj")
    )
    wdf = sd2.crossJoin(F.broadcast(proj)).select(
        "dim",
        "n",
        (
            F.col("sn")
            - (F.col("pj").cast("double") / F.lit(float(vn2))) * vval
        ).alias("wv"),
    )
    wn = wdf.select(_fx(F.col("wv") * F.col("wv"), 1e15).alias("sq"), "n").agg(
        F.sqrt(F.sum("sq").cast("double") * F.lit(1e-15)).alias("wnrm"),
        F.max("n").alias("nv"),
    )
    w3 = wdf.crossJoin(F.broadcast(wn)).select(
        "dim", _fx(F.col("wv") / F.col("wnrm"), 1e6).alias("wi")
    )
    orth = w3.join(v1t, "dim").agg(
        (F.sum(F.col("wi") * F.col("vi")).cast("double") * F.lit(1e-12)).alias(
            "od"
        )
    )
    lam2 = F.col("wnrm") * F.lit(gmax) * F.lit(gmax)

    def fx6(c: F.Column) -> F.Column:
        return _fx(c, 1e6).cast("double") / F.lit(1e6)

    row1 = (
        row1_base.crossJoin(F.broadcast(orth)).select(
            F.lit(1).alias("component"),
            fx6(lam1).alias("eigenvalue"),
            fx6(F.col("nrm") / F.lit(trace)).alias("explained_ratio"),
            fx6(F.col("od")).alias("ortho_dot"),
            F.col("nv").alias("n_vecs"),
        )
    )
    row2 = (
        wn.crossJoin(F.broadcast(orth)).select(
            F.lit(2).alias("component"),
            fx6(lam2).alias("eigenvalue"),
            fx6(F.col("wnrm") / F.lit(trace)).alias("explained_ratio"),
            fx6(F.col("od")).alias("ortho_dot"),
            F.col("nv").alias("n_vecs"),
        )
    )
    return row1.unionByName(row2).orderBy("component")


def _v17_oracle() -> str:
    d = _V16_DIM
    last = _V16_ROUNDS
    chain = _v16_chain(emit_last_v=True)
    parts = [chain]
    parts.append(f""",
    vv2 AS (SELECT CAST(sum(CAST(floor((vi / 1e6) * (vi / 1e6) * 1e15
                                       + 0.5) AS BIGINT)) AS BIGINT) AS vn2
            FROM v{last}t),
    w0 AS (SELECT list_transform(range(1, {d + 1}),
                    i -> CASE WHEN i = 2
                         THEN CAST(1000000 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END) AS v)""")
    for s in (1, 2, 3):
        parts.append(f""",
    fw{s} AS (SELECT c, CAST(floor(CAST(list_reduce(
                      list_transform(range(1, {d + 1}),
                                     i -> c[i] * v[i]),
                      (a, b) -> a + b) AS DOUBLE) * 1e-9 + 0.5)
                    AS BIGINT) AS f
             FROM cx CROSS JOIN w{s - 1}),
    uw{s} AS (SELECT i - 1 AS dim, c[i] * f AS p
             FROM fw{s}, unnest(range(1, {d + 1})) u(i)),
    sw{s} AS (SELECT dim, sum(CAST(p AS DECIMAL(38,0))) AS sd,
                    count(*) AS n
             FROM uw{s} GROUP BY dim),
    snw{s} AS (SELECT w.dim, CAST(sd AS DOUBLE) * 1e-15 / n AS sn, n, t.vi
              FROM sw{s} w JOIN v{last}t t USING (dim)),
    pj{s} AS (SELECT CAST(sum(CAST(floor(sn * (vi / 1e6) * 1e15 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS pj
              FROM snw{s}),
    wd{s} AS (SELECT dim, n,
                     sn - (CAST(pj AS DOUBLE) / CAST(vn2 AS DOUBLE))
                          * (vi / 1e6) AS wv
              FROM snw{s} CROSS JOIN pj{s} CROSS JOIN vv2),
    wn{s} AS (SELECT sqrt(CAST(sum(
                      CAST(floor(wv * wv * 1e15 + 0.5) AS BIGINT))
                    AS DOUBLE) * 1e-15) AS wnrm,
                    max(n) AS nv
             FROM wd{s})""")
        if s < 3:
            parts.append(f""",
    w{s} AS (SELECT list(CAST(floor(wv / wnrm * 1e6 + 0.5) AS BIGINT)
                         ORDER BY dim) AS v
             FROM wd{s} CROSS JOIN wn{s})""")
    parts.append(f""",
    w3t AS (SELECT dim, CAST(floor(wv / wnrm * 1e6 + 0.5) AS BIGINT) AS wi
            FROM wd3 CROSS JOIN wn3),
    od AS (SELECT CAST(sum(w3t.wi * t.vi) AS DOUBLE) * 1e-12 AS od
           FROM w3t JOIN v{last}t t USING (dim))
    SELECT 1 AS component,
           CAST(floor(nrm * g * g * 1e6 + 0.5) AS BIGINT) / 1e6
             AS eigenvalue,
           CAST(floor(nrm / trace * 1e6 + 0.5) AS BIGINT) / 1e6
             AS explained_ratio,
           CAST(floor(od * 1e6 + 0.5) AS BIGINT) / 1e6 AS ortho_dot,
           nv AS n_vecs
    FROM n{last} CROSS JOIN tr CROSS JOIN gm CROSS JOIN od
    UNION ALL
    SELECT 2 AS component,
           CAST(floor(wnrm * g * g * 1e6 + 0.5) AS BIGINT) / 1e6
             AS eigenvalue,
           CAST(floor(wnrm / trace * 1e6 + 0.5) AS BIGINT) / 1e6
             AS explained_ratio,
           CAST(floor(od * 1e6 + 0.5) AS BIGINT) / 1e6 AS ortho_dot,
           nv AS n_vecs
    FROM wn3 CROSS JOIN tr CROSS JOIN gm CROSS JOIN od
    ORDER BY component""")
    sql = "".join(parts)
    return sql.replace(" AS (", " AS MATERIALIZED (")


oracle("v17_top2_spectrum", _v17_oracle())


# ---------------------------------------------------------------------------
# V18: MRL OPERATING-POINT SWEEP — the measured cost↔recall frontier for
# the Matryoshka prefix arm (round-5 VERDICT #6: v11 was the one
# approximate arm without a p43-style committed frontier; its fixed
# prefix-16/os=5 point measures 0.50 recall at sf0.1). One corpus scan
# (the p36/p43 discipline): both prefix similarities and the full-dim
# similarity are computed in ONE projection over a pinned base, every
# candidate set is a RANK FILTER over the widest top-(k·max os) fetch
# (candidate sets are nested in rank, so "candidates at os" never
# re-scans), and each branch's top-k is a TakeOrdered over ≤200 rows.
# Output: (prefix, oversample) × (recall@10 vs exact full-dim top-10,
# rescore_fraction = k·os/n — the fraction of FULL vectors fetched,
# coarse_bytes_fraction = prefix/64 — the byte fraction the coarse scan
# reads when the prefix is stored as its own column). The committed
# operating point lives in RECALL.md with a pinned floor.
# ---------------------------------------------------------------------------
_V18_PREFIXES = (16, 32)
_V18_OS = (5, 10, 20)
_V18_K = 10
_V18_DIM = 64


def _mrl_frontier_sweep(emb: DataFrame, emb_col: str, qv: list) -> DataFrame:
    """v18's one-scan prefix×oversample sweep over an arbitrary
    (vec_id, vector) table — shared verbatim by v18 (the raw synthetic
    corpus) and v20 (the decayed-spectrum fixture), so the two frontiers
    differ ONLY in the geometry they measure."""
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import (
        dot,
        l2_norm,
        lit_l2_norm,
    )
    from mtg_vector_db_spark.session import pin

    # Query-side norms hoisted to driver-computed literals (round 8):
    # dot/(norm_row * lit_norm_q) is the same float64 tree as
    # cosine_similarity (lit_l2_norm replays the sequential fold), so
    # each of the 5 per-row scores drops one interpreted O(d) fold.
    cols = [
        F.round(
            dot(F.col(emb_col), qv)
            / (l2_norm(F.col(emb_col)) * lit_l2_norm(qv)),
            R,
        ).alias("fsim")
    ]
    for p in _V18_PREFIXES:
        sl = F.slice(F.col(emb_col), 1, p)
        cols.append(
            F.round(
                dot(sl, qv[:p]) / (l2_norm(sl) * lit_l2_norm(qv[:p])),
                R,
            ).alias(f"psim{p}")
        )
    base = pin(emb.select("vec_id", *cols))
    ncnt = base.agg(F.count(F.lit(1)).alias("n_corpus"))
    exact = (
        base.orderBy(F.desc("fsim"), F.asc("vec_id"))
        .limit(_V18_K)
        .select("vec_id")
    )
    max_cand = _V18_K * max(_V18_OS)
    out = None
    for p in _V18_PREFIXES:
        ps = f"psim{p}"
        wide = (
            base.orderBy(F.desc(ps), F.asc("vec_id"))
            .limit(max_cand)
        )
        w = Window.orderBy(F.desc(ps), F.asc("vec_id"))
        ranked = pin(wide.withColumn("prank", F.row_number().over(w)))
        for os_ in _V18_OS:
            top = (
                ranked.filter(F.col("prank") <= _V18_K * os_)
                .orderBy(F.desc("fsim"), F.asc("vec_id"))
                .limit(_V18_K)
            )
            hits = top.join(exact, "vec_id").agg(
                F.count(F.lit(1)).alias("nhit")
            )
            row = (
                hits.crossJoin(F.broadcast(ncnt))
                .select(
                    F.lit(p).alias("prefix"),
                    F.lit(os_).alias("oversample"),
                    F.round(
                        F.col("nhit").cast("double") / float(_V18_K), 6
                    ).alias("recall_at_10"),
                    F.round(
                        F.least(
                            F.lit(_V18_K * os_), F.col("n_corpus")
                        ).cast("double")
                        / F.col("n_corpus").cast("double"),
                        6,
                    ).alias("rescore_fraction"),
                    F.round(
                        F.lit(p) / F.lit(float(_V18_DIM)), 6
                    ).alias("coarse_bytes_fraction"),
                )
            )
            out = row if out is None else out.unionByName(row)
    return out.orderBy("prefix", "oversample")


@query("v18_mrl_operating_points")
def v18_mrl_operating_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    return _mrl_frontier_sweep(emb, "embedding", qv)


def _v18_oracle() -> str:
    k = _V18_K
    max_cand = k * max(_V18_OS)
    sql = f"""
    WITH base AS MATERIALIZED (
      SELECT vec_id,
             round(list_cosine_similarity(
               CAST(embedding AS DOUBLE[]), {_Q_SUB}), {R}) AS fsim"""
    for p in _V18_PREFIXES:
        qp = (
            f"(SELECT CAST(embedding[1:{p}] AS DOUBLE[]) FROM embeddings"
            " WHERE vec_id = 0)"
        )
        sql += f""",
             round(list_cosine_similarity(
               CAST(embedding[1:{p}] AS DOUBLE[]), {qp}), {R}) AS psim{p}"""
    sql += """
      FROM embeddings),
    exct AS MATERIALIZED (
      SELECT vec_id FROM base ORDER BY fsim DESC, vec_id ASC LIMIT %d),
    ncrp AS (SELECT count(*) AS n_corpus FROM base)""" % k
    for p in _V18_PREFIXES:
        sql += f""",
    rk{p} AS MATERIALIZED (
      SELECT vec_id, fsim,
             row_number() OVER (ORDER BY psim{p} DESC, vec_id ASC) AS prank
      FROM base
      ORDER BY psim{p} DESC, vec_id ASC LIMIT {max_cand})"""
    selects = []
    for p in _V18_PREFIXES:
        for os_ in _V18_OS:
            selects.append(f"""
    SELECT {p} AS prefix, {os_} AS oversample,
           round(CAST(h.nhit AS DOUBLE) / {float(k)}, 6) AS recall_at_10,
           round(CAST(least({k * os_}, ncrp.n_corpus) AS DOUBLE)
                 / CAST(ncrp.n_corpus AS DOUBLE), 6) AS rescore_fraction,
           round({p} / {float(_V18_DIM)}, 6) AS coarse_bytes_fraction
    FROM (SELECT count(*) AS nhit FROM (
            SELECT vec_id FROM rk{p} WHERE prank <= {k * os_}
            ORDER BY fsim DESC, vec_id ASC LIMIT {k}) t
          JOIN exct USING (vec_id)) h
    CROSS JOIN ncrp""")
    return (
        sql + "\n" + "\n    UNION ALL\n".join(selects)
        + "\n    ORDER BY prefix, oversample"
    )


oracle("v18_mrl_operating_points", _v18_oracle())


# ---------------------------------------------------------------------------
# V19: MRL SERVING FROM A STORED PREFIX COLUMN — v18's committed
# operating point (prefix=32 / os=20, RECALL.md) turned into an actual
# serving path with the byte claim made physical: the 32-dim prefix is
# a content-addressed artifact holding ONLY (vec_id, prefix), so the
# coarse top-(k·os) scan reads half the vector bytes BY SCHEMA (the
# artifact scan's ReadSchema is the whole assertion — there is nothing
# else in the file), and the full 64-dim vectors are fetched for the
# 200 survivors only, via a broadcast join of the candidate ids into
# the corpus scan. Output = v11's shape (doc_id, psim, sim) at the
# committed point; the oracle replays coarse + rescore in CTEs, and the
# result is pinned equal to running the same two stages over the
# in-line slice (the artifact is a pure projection of the corpus).
# ---------------------------------------------------------------------------
_V19_PREFIX = 32
_V19_OS = 20
_V19_K = 10


def _stored_prefix_path(spark: SparkSession, sf_dir: str) -> str:
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key("mrl_prefix", "v1", _V19_PREFIX, fp)
    path = os.path.join(artifact_root(), "mrl_prefix", key)

    def build(tmp: str) -> None:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        (
            emb.select(
                "vec_id",
                F.transform(
                    F.slice(F.col("embedding"), 1, _V19_PREFIX),
                    lambda x: x.cast("double"),
                ).alias("prefix"),
            )
            .write.parquet(tmp)
        )

    ensure_artifact(path, build)
    return path


@query("v19_mrl_serve_stored")
def v19_mrl_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import cosine_similarity

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    pre = spark.read.parquet(_stored_prefix_path(spark, sf_dir))
    psim = F.round(
        cosine_similarity(F.col("prefix"), qv[:_V19_PREFIX]), R
    )
    cand = (
        pre.select("vec_id", psim.alias("psim"))
        .orderBy(F.desc("psim"), F.asc("vec_id"))
        .limit(_V19_K * _V19_OS)
    )
    full_sim = F.round(cosine_similarity(F.col("embedding"), qv), R)
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .select(
            F.col("vec_id").alias("doc_id"), "psim", full_sim.alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(_V19_K)
    )


_Q32_SUB = (
    f"(SELECT CAST(embedding[1:{_V19_PREFIX}] AS DOUBLE[]) FROM embeddings"
    " WHERE vec_id = 0)"
)
oracle(
    "v19_mrl_serve_stored",
    f"""
    WITH cand AS (
      SELECT vec_id,
             round(list_cosine_similarity(
               CAST(embedding[1:{_V19_PREFIX}] AS DOUBLE[]),
               {_Q32_SUB}), {R}) AS psim
      FROM embeddings
      ORDER BY psim DESC, vec_id ASC LIMIT {_V19_K * _V19_OS}
    )
    SELECT e.vec_id AS doc_id, cand.psim,
           round(list_cosine_similarity(
             CAST(e.embedding AS DOUBLE[]), {_Q_SUB}), {R}) AS sim
    FROM cand JOIN embeddings e USING (vec_id)
    ORDER BY sim DESC, doc_id ASC LIMIT {_V19_K}
    """,
)


# ---------------------------------------------------------------------------
# V20: MRL FRONTIER ON A DECAYED-SPECTRUM FIXTURE (round-6 VERDICT #5).
# v18's frontier shows prefix-16 plateauing at 0.8 because the synthetic
# md5 vectors spread signal UNIFORMLY across dims — the arm's design
# claim (MRL-trained embeddings front-load the prefix, so prefix-16
# reaches 0.9+) was argued in prose, not measured. This query builds a
# deterministic decayed-spectrum variant of the SAME corpus in-plan —
# y[w] = γ^(w-1) · ⟨x, plane_w⟩ with the seeded Gaussian planes the LSH
# arm already uses (rp_planes — a dense random mix, near-orthogonal at
# 64-d) and γ = 0.85, so dim w carries γ^2(w-1) of the expected energy
# and the 16-dim prefix holds 1-γ^32 ≈ 99.5% of it — then runs v18's
# EXACT sweep (shared _mrl_frontier_sweep) over it. Fully SQL-replayable:
# the oracle rebuilds the decayed vectors from the same plane/decay
# literals (the p06 discipline). Both frontiers sit side by side in
# RECALL.md; prefix-16 ≥ 0.9 here is floor-pinned.
# ---------------------------------------------------------------------------
_V20_GAMMA = 0.85
_V20_SEED = 11
_V20_NMIX = 64


def _v20_decays() -> list[float]:
    return [_V20_GAMMA ** i for i in range(_V20_NMIX)]


def _v20_decayed(emb: DataFrame) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import dot
    from mtg_vector_db_spark.operators.ann import rp_planes

    planes = rp_planes(_V18_DIM, _V20_NMIX, _V20_SEED)
    planes_lit = F.array(
        *[F.array(*[F.lit(v) for v in p]) for p in planes]
    )
    decay_lit = F.array(*[F.lit(d) for d in _v20_decays()])
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    dec = F.transform(
        F.sequence(F.lit(1), F.lit(_V20_NMIX)),
        lambda w: F.element_at(decay_lit, w.cast("int"))
        * dot(F.element_at(planes_lit, w.cast("int")), x),
    )
    return emb.select("vec_id", dec.alias("demb"))


@query("v20_mrl_decayed_frontier")
def v20_mrl_decayed_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.session import pin

    (emb,) = tables(spark, sf_dir, "embeddings")
    # Pin the decayed corpus (round 8): the probe fetch below and the
    # sweep's base pass are two consumers of the same 64-mix interpreted
    # transform (whose 64×64 plane literal also bloats every plan that
    # carries it); materializing it once halves the transform work and
    # keeps the literal out of the downstream sweep plans. Semantics-
    # neutral (eager localCheckpoint).
    dec = pin(_v20_decayed(emb))
    # The probe is the decayed corpus vector 0 — computed through the
    # SAME Spark expression as the corpus (one bounded 1-row fetch, the
    # query_vector contract), so query and corpus share bit-identical
    # arithmetic.
    row = dec.filter(F.col("vec_id") == 0).select("demb").first()
    if row is None:
        raise ValueError(
            "no embedding with vec_id=0 — the decayed frontier requires "
            "the standard probe corpus"
        )
    qv = [float(v) for v in row[0]]
    return _mrl_frontier_sweep(dec, "demb", qv)


def _v20_oracle() -> str:
    from mtg_vector_db_spark.operators.ann import rp_planes

    k = _V18_K
    max_cand = k * max(_V18_OS)
    planes = rp_planes(_V18_DIM, _V20_NMIX, _V20_SEED)
    planes_sql = ", ".join(
        f"({w + 1}, CAST([{', '.join(repr(v) for v in p)}] AS DOUBLE[]))"
        for w, p in enumerate(planes)
    )
    decays_sql = ", ".join(
        f"({w + 1}, {repr(d)})" for w, d in enumerate(_v20_decays())
    )
    sql = f"""
    WITH planes(w, p) AS (VALUES {planes_sql}),
    decays(w, g) AS (VALUES {decays_sql}),
    e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dvec AS MATERIALIZED (
      SELECT e.vec_id,
             list(d.g * list_inner_product(pl.p, e.v) ORDER BY pl.w) AS dv
      FROM e CROSS JOIN planes pl JOIN decays d ON d.w = pl.w
      GROUP BY e.vec_id),
    qd AS MATERIALIZED (SELECT dv AS q FROM dvec WHERE vec_id = 0),
    base AS MATERIALIZED (
      SELECT dvec.vec_id,
             round(list_cosine_similarity(dv, (SELECT q FROM qd)),
                   {R}) AS fsim"""
    for p in _V18_PREFIXES:
        sql += f""",
             round(list_cosine_similarity(dv[1:{p}],
               (SELECT q[1:{p}] FROM qd)), {R}) AS psim{p}"""
    sql += """
      FROM dvec),
    exct AS MATERIALIZED (
      SELECT vec_id FROM base ORDER BY fsim DESC, vec_id ASC LIMIT %d),
    ncrp AS (SELECT count(*) AS n_corpus FROM base)""" % k
    for p in _V18_PREFIXES:
        sql += f""",
    rk{p} AS MATERIALIZED (
      SELECT vec_id, fsim,
             row_number() OVER (ORDER BY psim{p} DESC, vec_id ASC) AS prank
      FROM base
      ORDER BY psim{p} DESC, vec_id ASC LIMIT {max_cand})"""
    selects = []
    for p in _V18_PREFIXES:
        for os_ in _V18_OS:
            selects.append(f"""
    SELECT {p} AS prefix, {os_} AS oversample,
           round(CAST(h.nhit AS DOUBLE) / {float(k)}, 6) AS recall_at_10,
           round(CAST(least({k * os_}, ncrp.n_corpus) AS DOUBLE)
                 / CAST(ncrp.n_corpus AS DOUBLE), 6) AS rescore_fraction,
           round({p} / {float(_V18_DIM)}, 6) AS coarse_bytes_fraction
    FROM (SELECT count(*) AS nhit FROM (
            SELECT vec_id FROM rk{p} WHERE prank <= {k * os_}
            ORDER BY fsim DESC, vec_id ASC LIMIT {k}) t
          JOIN exct USING (vec_id)) h
    CROSS JOIN ncrp""")
    return (
        sql + "\n" + "\n    UNION ALL\n".join(selects)
        + "\n    ORDER BY prefix, oversample"
    )


oracle("v20_mrl_decayed_frontier", _v20_oracle())
