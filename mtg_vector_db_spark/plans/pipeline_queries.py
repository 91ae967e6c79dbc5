"""Composite pipeline queries (SURVEY.md §2.7 V6-V11, §4.3): two-stage
retrieve-then-rerank, multi-source fan-out, IVF centroid build + probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mtg_vector_db_spark.operators.ann import (
    centroid_vectors,
    centroids_by,
    ivf_search,
)
from mtg_vector_db_spark.operators.fanout import fanout_search
from mtg_vector_db_spark.operators.knn import knn
from mtg_vector_db_spark.operators.rerank import stub_rerank
from mtg_vector_db_spark.plans.registry import oracle, query, tables
from mtg_vector_db_spark.plans.vector_queries import query_vector

R = 6

_Q_SUB = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
_SIM = f"round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), {_Q_SUB}), {R})"


# ---------------------------------------------------------------------------
# V9: retrieve initial_k=30 by cosine → deterministic stub rerank →
# final_k=10 (db/search_strategies.py:118-215 with the stub standing in for
# the LLM; permutation/score semantics per db_utils.py:329-338).
# ---------------------------------------------------------------------------
@query("p01_retrieve_rerank")
def p01_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    cands = knn(emb, qv, k=30, round_digits=R).withColumnRenamed("vec_id", "doc_id")
    return stub_rerank(cands, final_k=10).orderBy("rank")


oracle(
    "p01_retrieve_rerank",
    f"""
    WITH cands AS (
      SELECT e.vec_id AS doc_id, {_SIM} AS sim
      FROM embeddings e
      ORDER BY sim DESC, e.vec_id ASC LIMIT 30
    ), ranked AS (
      SELECT doc_id, sim,
             row_number() OVER (ORDER BY round(sim, 2) DESC,
                                md5(CAST(doc_id AS VARCHAR)) ASC) AS rank,
             count(*) OVER () AS n
      FROM cands
    )
    SELECT doc_id, sim, rank,
           round(1.0 - (rank - 1) * 1.0 / n, {R}) AS rerank_score
    FROM ranked ORDER BY rank LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# V11/U1: multi-source fan-out with per-source k (10/10/5 defaults,
# db/search_with_reranker.py:284-290), one shared query embedding.
# ---------------------------------------------------------------------------
@query("p02_fanout_multisource")
def p02_fanout_multisource(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    return fanout_search(
        docs, emb, qv,
        source_ks={"src0": 10, "src1": 10, "src2": 5},
        round_digits=R,
    ).orderBy("source", F.desc("sim"), "doc_id")


oracle(
    "p02_fanout_multisource",
    f"""
    WITH scored AS (
      SELECT d.doc_id, d.source, {_SIM} AS sim
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    s0 AS (SELECT * FROM scored WHERE source = 'src0' ORDER BY sim DESC, doc_id LIMIT 10),
    s1 AS (SELECT * FROM scored WHERE source = 'src1' ORDER BY sim DESC, doc_id LIMIT 10),
    s2 AS (SELECT * FROM scored WHERE source = 'src2' ORDER BY sim DESC, doc_id LIMIT 5)
    SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
    ORDER BY source, sim DESC, doc_id
    """,
)


# ---------------------------------------------------------------------------
# IVF index build: element-wise centroid per label cell (long format —
# one narrow shuffle; at 100 TB this plus a cell-partitioned rewrite of the
# corpus IS the index build).
# ---------------------------------------------------------------------------
@query("p03_ivf_centroids")
def p03_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    cents = centroids_by(emb)
    return (
        cents.select(
            "label",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("c"), R).alias("c"),
        )
        .orderBy("label", "pos")
    )


oracle(
    "p03_ivf_centroids",
    f"""
    SELECT label, i - 1 AS pos, round(avg(embedding[i]), {R}) AS c
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i ORDER BY label, pos
    """,
)


# ---------------------------------------------------------------------------
# IVF probe search: exact KNN restricted to the nprobe=2 nearest cells.
# The oracle replays the identical coarse-quantize + probe in SQL.
# ---------------------------------------------------------------------------
@query("p04_ivf_search")
def p04_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    cents = centroid_vectors(centroids_by(emb))
    out = ivf_search(emb, cents, qv, k=10, nprobe=2, round_digits=R)
    return out.select(F.col("vec_id").alias("doc_id"), "sim").orderBy(
        F.desc("sim"), "doc_id"
    )


# ---------------------------------------------------------------------------
# Multimodal binary-column plumbing: documents' UTF-8 bytes stand in for an
# opaque media payload (schema + byte-level ops are what's under test; real
# codecs are stubbed per operators/multimodal.py).
# ---------------------------------------------------------------------------
@query("p05_binary_payload_meta")
def p05_binary_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.hex(F.encode(F.substring(F.col("text"), 1, 8), "UTF-8")).alias(
                "feature_hex"
            ),
        )
        .orderBy("doc_id")
    )


oracle(
    "p05_binary_payload_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           hex(encode(substring(text, 1, 8))) AS feature_hex
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)


oracle(
    "p04_ivf_search",
    f"""
    WITH cent AS (
      SELECT label, list(c ORDER BY i) AS centroid FROM (
        SELECT label, i, avg(embedding[i]) AS c
        FROM embeddings, range(1, 65) t(i) GROUP BY label, i
      ) GROUP BY label
    ),
    probe AS (
      SELECT label FROM cent
      ORDER BY list_cosine_similarity(CAST(centroid AS DOUBLE[]), {_Q_SUB}) DESC,
               label ASC
      LIMIT 2
    )
    SELECT e.vec_id AS doc_id, {_SIM} AS sim
    FROM embeddings e WHERE e.label IN (SELECT label FROM probe)
    ORDER BY sim DESC, e.vec_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# §4.3 north star: LSH ANN index + query (the "batch vector index build"
# analog of the reference's HNSW, db/init.sql:50-53) — the DETERMINISTIC
# random-projection scheme (operators/ann.py:rp_lsh_topk): seeded Gaussian
# planes as literals, bucket = floor(round(<x̂,plane>/L, 9)), any-table
# candidate union, exact-cosine rescore. Fully oracle-able: the SQL replays
# bucketing + union + rescore with the identical plane literals. The MLlib
# BRP-LSH path (lsh_index/lsh_query) remains the fitted-model variant,
# recall-checked in recall_report/tests.
# ---------------------------------------------------------------------------
@query("p06_lsh_ann_topk")
def p06_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ann import rp_lsh_topk

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    return rp_lsh_topk(emb, qv, k=10, round_digits=R).orderBy(
        F.desc("sim"), F.asc("doc_id")
    )


def _p06_oracle() -> str:
    from mtg_vector_db_spark.operators.ann import (
        RP_BUCKET_LENGTH,
        RP_TABLES,
        rp_planes,
    )

    planes = rp_planes(64, RP_TABLES)
    planes_sql = ", ".join(
        f"({w + 1}, CAST([{', '.join(repr(v) for v in p)}] AS DOUBLE[]))"
        for w, p in enumerate(planes)
    )
    bl = RP_BUCKET_LENGTH
    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE vec_id = 0),
    qn AS (SELECT list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
             AS nq FROM q),
    planes(w, p) AS (VALUES {planes_sql}),
    qb AS (SELECT w, CAST(floor(round(list_inner_product(p, nq) / {bl}, 9))
                     AS BIGINT) AS b
           FROM planes, qn),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nx
          FROM e),
    eb AS (SELECT n.vec_id, pl.w,
                  CAST(floor(round(list_inner_product(pl.p, n.nx) / {bl}, 9))
                    AS BIGINT) AS b
           FROM n, planes pl),
    cand AS (SELECT DISTINCT eb.vec_id
             FROM eb JOIN qb ON eb.w = qb.w AND eb.b = qb.b)
    SELECT e.vec_id AS doc_id,
           round(list_cosine_similarity(e.v, (SELECT v FROM q)), {R}) AS sim
    FROM cand JOIN e ON cand.vec_id = e.vec_id
    ORDER BY sim DESC, doc_id ASC LIMIT 10
    """


oracle("p06_lsh_ann_topk", _p06_oracle())


# ---------------------------------------------------------------------------
# Full IVF index build — the DETERMINISTIC Lloyd k-means variant
# (operators/ann.py:lloyd_ivf_build): seed centroids = the 8 lowest-id
# normalized vectors, 2 Lloyd iterations with every comparison-feeding
# float rounded to 9 digits (distances before argmin, means after
# averaging). That freeze discipline makes the whole iterative build
# SQL-replayable: the oracle unrolls both iterations as CTE chains. The
# MLlib KMeans build (kmeans_ivf_build) remains the fitted-model variant
# for recall_report; its invariants are pinned in
# tests/test_pipeline_queries.py.
# ---------------------------------------------------------------------------
_P07_CELLS = 8
_P07_ITER = 2


@query("p07_kmeans_ivf_build")
def p07_kmeans_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ann import lloyd_ivf_build

    (emb,) = tables(spark, sf_dir, "embeddings")
    _, assigned = lloyd_ivf_build(emb, n_cells=_P07_CELLS, n_iter=_P07_ITER)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cell")
    )


def _p07_oracle() -> str:
    k, rd = _P07_CELLS, 9
    sql = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nx
          FROM e),
    c0 AS (SELECT CAST(vec_id AS INT) AS cell, nx AS cent FROM n
           WHERE vec_id < {k})"""
    prev = "c0"
    for i in range(1, _P07_ITER + 1):
        sql += f""",
    a{i - 1} AS (SELECT vec_id, cell FROM (
        SELECT n.vec_id, p.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_inner_product(p.cent, p.cent)
                       - 2 * list_inner_product(p.cent, n.nx), {rd}),
                 p.cell) AS rn
        FROM n CROSS JOIN {prev} p) WHERE rn = 1),
    m{i} AS (SELECT a{i - 1}.cell, i, round(avg(n.nx[i]), {rd}) AS c
             FROM a{i - 1} JOIN n USING (vec_id), range(1, 65) t(i)
             GROUP BY a{i - 1}.cell, i),
    cl{i} AS (SELECT cell, list(c ORDER BY i) AS cent FROM m{i} GROUP BY cell),
    c{i} AS (SELECT p.cell, coalesce(cl{i}.cent, p.cent) AS cent
             FROM {prev} p LEFT JOIN cl{i} ON p.cell = cl{i}.cell)"""
        prev = f"c{i}"
    sql += f""",
    af AS (SELECT vec_id, cell FROM (
        SELECT n.vec_id, p.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_inner_product(p.cent, p.cent)
                       - 2 * list_inner_product(p.cent, n.nx), {rd}),
                 p.cell) AS rn
        FROM n CROSS JOIN {prev} p) WHERE rn = 1)
    SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM af GROUP BY cell ORDER BY cell
    """
    return sql


oracle("p07_kmeans_ivf_build", _p07_oracle())


# ---------------------------------------------------------------------------
# Video frame-sample plan (operators/multimodal.py:frame_sample_plan): the
# sequence+explode that spreads per-frame decode work across executors.
# Media rows are synthesized from documents (duration = 10 ms per byte of
# text) so the oracle can replay the plan with generate_series.
# ---------------------------------------------------------------------------
@query("p08_frame_sample_plan")
def p08_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.multimodal import frame_sample_plan

    (docs,) = tables(spark, sf_dir, "documents")
    media = docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.lit("video").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.octet_length(F.col("text")) * 10).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000).orderBy("doc_id", "frame_ts_ms")


oracle(
    "p08_frame_sample_plan",
    """
    SELECT doc_id, unnest(generate_series(0,
             greatest(octet_length(encode(text)) * 10 - 1, 0), 1000)) AS frame_ts_ms
    FROM documents WHERE doc_id < 50
    ORDER BY doc_id, frame_ts_ms
    """,
)


# ---------------------------------------------------------------------------
# The cards-ingestion dataflow (operators/ingest.py — the reference's
# ingest_cards.py:112-361 as ONE DAG) made driver-checkable: a literal
# MTGJSON-shaped batch goes through extract (T5-T9) → validate → dedup
# (D1), and the oracle replays the identical transformation over a VALUES
# table in SQL. File-format readers (S1/S4/S5) are exercised in
# tests/test_ingest_sources.py, which feeds this same pipeline.
# ---------------------------------------------------------------------------
_CARD_ROWS = [
    # (name, asciiName, faceName, manaCost, type, power, toughness, text, manaValue)
    ("Abyss Dragon", None, None, "{4}{B}{B}", "Creature — Dragon", "6", "6",
     "Flying, deathtouch", 6.0),
    ("Abyss Dragon", None, None, "{4}{B}{B}", "Creature — Dragon", "6", "6",
     "duplicate row", 6.0),
    ("Fire // Ice", None, "Fire", "{1}{R}", "Instant", None, None,
     "Fire deals 2 damage.", 2.0),
    ("Ætherize", "AEtherize", None, "{3}{U}", "Instant", None, None,
     "Return all attacking creatures.", 4.0),
    ("Blank Card", None, None, None, "Artifact", None, None, None, 1.0),
]


@query("p09_ingest_cards_dataflow")
def p09_ingest_cards_dataflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ingest import ingest_cards

    raw = spark.createDataFrame(
        [(r[0], r) for r in _CARD_ROWS],
        "name string, card struct<name string, asciiName string, "
        "faceName string, manaCost string, type string, power string, "
        "toughness string, text string, manaValue double>",
    ).select("name", F.col("card").dropFields("name").alias("card"))
    docs, embs, rejected = ingest_cards(raw)
    emb_flags = embs.select("card_name", F.lit(1).alias("has_embedding"))
    return (
        docs.join(emb_flags, "card_name", "left")
        .select(
            "card_name",
            "card_type",
            "mana_value",
            "related_faces",
            F.coalesce("has_embedding", F.lit(0)).alias("has_embedding"),
        )
        .orderBy("card_name")
    )


_VALUES = ", ".join(
    "(" + ", ".join("NULL" if v is None else (repr(v) if isinstance(v, str) else str(v))
                    for v in r) + ")"
    for r in _CARD_ROWS
)
oracle(
    "p09_ingest_cards_dataflow",
    f"""
    WITH raw(name, asciiName, faceName, manaCost, type, power, toughness,
             text, manaValue) AS (VALUES {_VALUES}),
    extracted AS (
      SELECT coalesce(asciiName, faceName, name) AS card_name,
             type AS card_type,
             manaValue AS mana_value,
             text AS text_content,
             CASE WHEN contains(name, '//')
                  THEN trim(string_split(name, '//')[2]) END AS related_faces,
             row_number() OVER (PARTITION BY coalesce(asciiName, faceName, name)
                                ORDER BY (SELECT NULL)) AS rn
      FROM raw
      WHERE coalesce(asciiName, faceName, name) IS NOT NULL
        AND len(coalesce(asciiName, faceName, name)) > 0
    )
    SELECT card_name, card_type, mana_value, related_faces,
           CASE WHEN text_content IS NOT NULL AND len(text_content) > 0
                THEN 1 ELSE 0 END AS has_embedding
    FROM extracted WHERE rn = 1
    ORDER BY card_name
    """,
)


# ---------------------------------------------------------------------------
# Hybrid search: BM25 keyword arm + cosine-KNN vector arm fused by
# reciprocal ranks (operators/text_search.py:rrf_fuse). The combination the
# reference's separate trigram tier + vector search never makes; ranks are
# assigned after each arm's top-30 so no global window exists in the plan.
# ---------------------------------------------------------------------------
@query("p10_hybrid_rrf")
def p10_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.knn import knn
    from mtg_vector_db_spark.operators.text_search import (
        bm25_topk,
        ranked,
        rrf_fuse,
    )
    from mtg_vector_db_spark.plans.text_queries import BM25_TERMS
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    b_arm = ranked(bm25_topk(docs, BM25_TERMS, k=30, round_digits=R), "bm25")
    v_arm = ranked(
        knn(emb, qv, 30, round_digits=R), "sim", id_col="vec_id"
    ).withColumnRenamed("vec_id", "doc_id")
    return (
        rrf_fuse([b_arm, v_arm], k=60, round_digits=R)
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


def _p10_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import bm25_sql_ctes

    return f"""
    WITH {bm25_sql_ctes()},
    bt AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 30),
    br AS (SELECT doc_id,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
           FROM bt),
    vt AS (SELECT e.vec_id AS doc_id, {_SIM} AS sim FROM embeddings e
           ORDER BY sim DESC, e.vec_id LIMIT 30),
    vr AS (SELECT doc_id,
                  row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
           FROM vt),
    u AS (SELECT doc_id, 1.0e0 / (60 + rank) AS contrib FROM br
          UNION ALL SELECT doc_id, 1.0e0 / (60 + rank) FROM vr)
    SELECT doc_id, round(sum(contrib), {R}) AS rrf
    FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10
    """


oracle("p10_hybrid_rrf", _p10_oracle())


# ---------------------------------------------------------------------------
# Binary-quantized two-stage search (operators/quantize.py): Hamming
# candidates over packed sign-bit signatures, exact-cosine rescore — the
# pgvector-style quantized scale path for the reference's HNSW role
# (db/init.sql:50-53). The oracle replays Hamming straight off the float
# signs (proven equal to the packed popcount path in tests).
# ---------------------------------------------------------------------------
@query("p11_bq_rerank_search")
def p11_bq_rerank_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.quantize import bq_search
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    return bq_search(emb, qv, k=10, oversample=4, round_digits=R)


oracle(
    "p11_bq_rerank_search",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    h AS (
      SELECT e.vec_id AS doc_id, e.embedding,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0)
                    THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      FROM embeddings e CROSS JOIN q
    ),
    cand AS (SELECT * FROM h ORDER BY hamming ASC, doc_id ASC LIMIT 40)
    SELECT doc_id, hamming,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                 {_Q_SUB}), {R}) AS sim
    FROM cand ORDER BY sim DESC, doc_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Passage retrieval with max-passage aggregation: chunk long documents
# (operators/corpus.py:chunk_documents), BM25-score each chunk as its own
# "passage" (operators/text_search.py), keep each document's best passage
# (the MaxP rule), return top documents. The composition a corpus of
# context-length-exceeding documents needs — retrieval happens at passage
# granularity, ranking at document granularity. Chunk explosion is a
# map-side transform; per-chunk postings are filtered to query terms before
# any shuffle; the per-doc max is one hash aggregation.
# ---------------------------------------------------------------------------
@query("p12_passage_maxp")
def p12_passage_maxp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.corpus import chunk_documents
    from mtg_vector_db_spark.operators.text_search import bm25_scores
    from mtg_vector_db_spark.plans.text_queries import BM25_TERMS

    (docs,) = tables(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, size=8, stride=4).select(
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_id")).alias("pid"),
        F.col("doc_id").alias("parent"),
        F.col("chunk_text"),
    )
    scored = bm25_scores(
        chunks, BM25_TERMS, id_col="pid", text_col="chunk_text", round_digits=R
    )
    best = (
        scored.join(
            chunks.select("pid", "parent"), scored["doc_id"] == chunks["pid"]
        )
        .groupBy("parent")
        .agg(F.max("bm25").alias("best_bm25"))
        .select(F.col("parent").alias("doc_id"), "best_bm25")
    )
    return best.orderBy(F.desc("best_bm25"), F.asc("doc_id")).limit(10)


def _p12_oracle() -> str:
    # Chunk replay (c05 semantics) + BM25 replay over the chunk table with
    # chunk stats (N = n_chunks, avgdl over chunk token counts).
    toks = "list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)"
    ctoks = (
        "list_filter(string_split_regex(trim(chunk_text), '\\s+'), "
        "t -> len(t) > 0)"
    )
    from mtg_vector_db_spark.plans.text_queries import BM25_TERMS

    in_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH tk AS (SELECT doc_id, {toks} AS toks FROM documents),
    n AS (SELECT doc_id, toks,
                 CAST(CASE WHEN len(toks) <= 8 THEN 1
                      ELSE ceil((len(toks) - 8) / 4.0) + 1 END AS BIGINT)
                 AS n_chunks
          FROM tk WHERE len(toks) > 0),
    ch AS (
      SELECT doc_id AS parent,
             unnest(list_transform(range(0, n_chunks), k -> {{
               'pid': CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR),
               'chunk_text': array_to_string(
                  list_slice(toks, k*4 + 1, k*4 + 8), ' ')
             }}), recursive := true)
      FROM n
    ),
    tok AS (SELECT pid, parent, lower(chunk_text) AS chunk_text FROM ch),
    lt AS (SELECT pid, parent, {ctoks} AS toks FROM tok),
    st AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM lt),
    tf AS (SELECT pid, doclen, term, count(*) AS tf
           FROM (SELECT pid, len(toks) AS doclen, unnest(toks) AS term
                 FROM lt)
           WHERE term IN ({in_list})
           GROUP BY pid, doclen, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (SELECT t.pid,
                  round(sum(ln((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0) + 1)
                        * t.tf * 2.2e0
                        / (t.tf + 1.2e0 * (0.25e0
                           + 0.75e0 * t.doclen / s.avgdl))), {R}) AS bm25
           FROM tf t JOIN dfq d USING (term) CROSS JOIN st s
           GROUP BY t.pid),
    best AS (SELECT l.parent AS doc_id, max(b.bm25) AS best_bm25
             FROM bm b JOIN lt l ON b.pid = l.pid
             GROUP BY l.parent)
    SELECT doc_id, best_bm25 FROM best
    ORDER BY best_bm25 DESC, doc_id ASC LIMIT 10
    """


oracle("p12_passage_maxp", _p12_oracle())


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (operators/diversify.py): batch KNN candidates,
# then per-query greedy maximal-marginal-relevance in one Arrow batch per
# query (applyInPandas). Oracle-exact: every float feeding a greedy
# comparison is rounded (candidate sims and pairwise penalties to 6
# digits), the objective 0.7·sim − (1−0.7)·max_pen is then identical
# doubles on both engines, and the oracle unrolls the k=5 greedy steps as
# a CTE chain with the kernel's exact tie-break (objective desc, sim desc,
# doc_id asc). A pure-Python model parity test additionally pins the
# kernel (tests/test_quantize.py).
# ---------------------------------------------------------------------------
@query("p13_mmr_diversify")
def p13_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.diversify import mmr_rerank
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cand = knn_join(emb, queries_df, k=20, round_digits=R).select(
        "query_id", F.col("vec_id").alias("doc_id"), "sim"
    )
    cand = cand.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    return mmr_rerank(cand, k=5, lam=0.7).orderBy("query_id", "mmr_rank")


def _p13_oracle() -> str:
    # The objective literal matters: Python computes (1.0 - 0.7) in
    # float64 (= 0.30000000000000004), so the SQL writes (1.0 - 0.7)
    # rather than 0.3 to land on the identical double.
    obj = "0.7 * sim - (1.0 - 0.7) * pen"
    sql = f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
                   {R}) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ), cand AS (
      SELECT query_id, doc_id, sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, doc_id ASC) AS rnk
        FROM scored) WHERE rnk <= 20
    ), pair AS (
      SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
             round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                          CAST(eb.embedding AS DOUBLE[])),
                   {R}) AS ps
      FROM cand a JOIN cand b ON a.query_id = b.query_id
      JOIN embeddings ea ON ea.vec_id = a.doc_id
      JOIN embeddings eb ON eb.vec_id = b.doc_id
    ), sel1 AS (
      SELECT query_id, doc_id, sim, 1 AS mmr_rank, 0.7 * sim AS v FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY 0.7 * sim DESC, sim DESC,
                                              doc_id ASC) AS rn
        FROM cand) WHERE rn = 1
    )"""
    for i in range(2, 6):
        p = i - 1
        sql += f""", rem{i} AS (
      SELECT c.query_id, c.doc_id, c.sim
      FROM cand c LEFT JOIN sel{p} s
        ON c.query_id = s.query_id AND c.doc_id = s.doc_id
      WHERE s.doc_id IS NULL
    ), pen{i} AS (
      SELECT r.query_id, r.doc_id, r.sim, max(p.ps) AS pen
      FROM rem{i} r JOIN sel{p} s ON r.query_id = s.query_id
      JOIN pair p ON p.query_id = r.query_id AND p.da = r.doc_id
                 AND p.db = s.doc_id
      GROUP BY r.query_id, r.doc_id, r.sim
    ), sel{i} AS (
      SELECT query_id, doc_id, sim, mmr_rank, v FROM sel{p}
      UNION ALL
      SELECT query_id, doc_id, sim, {i} AS mmr_rank, {obj} AS v FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY {obj} DESC, sim DESC,
                                              doc_id ASC) AS rn
        FROM pen{i}) WHERE rn = 1
    )"""
    # mmr_score stays UNROUNDED (see diversify.mmr_rerank): the raw
    # doubles are bit-identical across engines; rounding a 7th-decimal
    # half here would re-open the round-convention divergence.
    sql += """
    SELECT query_id, doc_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
           v AS mmr_score
    FROM sel5 ORDER BY query_id, mmr_rank
    """
    return sql


oracle("p13_mmr_diversify", _p13_oracle())


# ---------------------------------------------------------------------------
# Product-quantized ANN (operators/quantize.py pq_*): per-subspace
# codebooks, encode the corpus to m codes, search by ADC table lookups,
# exact-cosine rescore of k·4 survivors — the IVF-PQ scan kernel
# re-expressed on DataFrames. Registered with the DETERMINISTIC seeded
# codebooks (seeded_pq_codebooks: codeword j of subspace s = normalized
# vector j sliced to s), so the oracle replays the whole encode → ADC →
# rescore chain: per-(vec, sub) argmin with distances rounded to 9 before
# comparison, distance-table lookups summed and rounded to 6, candidate
# top-40 by (adc, id), exact rescore top-10. The k-means-trained path
# (pq_train) keeps its recall floors in tests/test_quantize.py.
# ---------------------------------------------------------------------------
_PQ_M = 8
_PQ_CODES = 16
_PQ_DSUB = 64 // _PQ_M


@query("p14_pq_adc_search")
def p14_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.quantize import (
        pq_search,
        seeded_pq_codebooks,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    return pq_search(emb, cbs, qv, k=10, oversample=4, round_digits=R).orderBy(
        F.desc("sim"), F.asc("doc_id")
    )


# Shared CTE block: normalized corpus, seeded codewords, per-(vec, sub)
# encoding, query distance table, per-vector ADC — parameterized on the
# relation of vec_ids to encode (`{src}`) so p16 reuses it cell-pruned.
def _pq_ctes(src: str) -> str:
    d, m, nc = _PQ_DSUB, _PQ_M, _PQ_CODES
    return f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v,
                 list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nx
          FROM e),
    cw AS (SELECT t.s, n.vec_id AS code,
                  n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS w
           FROM n, range(0, {m}) t(s) WHERE n.vec_id < {nc}),
    sub AS (SELECT n.vec_id, t.s,
                   n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS sv
            FROM n, range(0, {m}) t(s)
            WHERE n.vec_id IN ({src})),
    enc AS (SELECT vec_id, s, code FROM (
              SELECT sub.vec_id, sub.s, cw.code,
                     row_number() OVER (PARTITION BY sub.vec_id, sub.s
                       ORDER BY round(list_inner_product(sub.sv, sub.sv)
                                      - 2 * list_inner_product(sub.sv, cw.w)
                                      + list_inner_product(cw.w, cw.w), 9),
                                cw.code) AS rn
              FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE vec_id = 0),
    qn AS (SELECT list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
             AS nq FROM q),
    dt AS (SELECT s, code, list_inner_product(diff, diff) AS dv FROM (
             SELECT cw.s, cw.code,
                    list_transform(range(1, {d + 1}),
                                   i -> cw.w[i] - qn.nq[cw.s * {d} + i]) AS diff
             FROM cw, qn)),
    adc AS (SELECT enc.vec_id, round(sum(dt.dv), {R}) AS adc_dist
            FROM enc JOIN dt ON enc.s = dt.s AND enc.code = dt.code
            GROUP BY enc.vec_id)"""


oracle(
    "p14_pq_adc_search",
    f"""
    WITH {_pq_ctes("SELECT vec_id FROM embeddings")},
    cand AS (SELECT vec_id, adc_dist FROM adc
             ORDER BY adc_dist ASC, vec_id ASC LIMIT 40)
    SELECT cand.vec_id AS doc_id, cand.adc_dist,
           round(list_cosine_similarity(e.v, (SELECT v FROM q)), {R}) AS sim
    FROM cand JOIN e USING (vec_id)
    ORDER BY sim DESC, doc_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Pointwise rerank scoring (V8, db_utils.py:455-495): retrieve top-20 by
# cosine, synthesize each candidate's "LLM relevance reply" in one of the
# five reply formats the reference's parser handles (%, /10, /100, bare
# float, no-number fallback), parse with the column-expression parser, and
# blend with retrieval similarity. Every step is JVM expressions, so the
# whole path — including the regex branch order and clamping — is replayed
# by the DuckDB oracle.
# ---------------------------------------------------------------------------
@query("p15_pointwise_rerank")
def p15_pointwise_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.rerank import parse_score_col

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    cand = knn(emb, qv, k=20, round_digits=R).withColumnRenamed("vec_id", "doc_id")
    d = F.col("doc_id")
    reply = (
        F.when(d % 5 == 0, F.concat((d * 37 % 101).cast("string"), F.lit("%")))
        .when(
            d % 5 == 1,
            F.concat(F.lit("Score: "), (d * 7 % 11).cast("string"), F.lit("/10")),
        )
        .when(d % 5 == 2, F.concat((d * 13 % 101).cast("string"), F.lit("/100")))
        .when(
            d % 5 == 3,
            F.concat(
                F.lit("relevance "),
                (d * 3 % 10).cast("string"),
                F.lit("."),
                (d % 10).cast("string"),
            ),
        )
        .otherwise(F.lit("no judgment"))
    )
    scored = cand.select(
        "doc_id",
        "sim",
        reply.alias("reply"),
        F.round(parse_score_col(reply), R).alias("llm_score"),
    )
    return (
        scored.withColumn(
            "blended",
            # UNROUNDED: both engines blend identical 6-digit-rounded
            # inputs with identical IEEE ops, so the doubles are
            # bit-equal; rounding here would land on the exact
            # 7th-decimal halves where round() conventions diverge.
            0.5 * F.col("sim") + 0.5 * F.col("llm_score"),
        )
        .orderBy(F.desc("blended"), F.asc("doc_id"))
        .limit(10)
    )


oracle(
    "p15_pointwise_rerank",
    f"""
    WITH cand AS (
      SELECT e.vec_id AS doc_id, {_SIM} AS sim
      FROM embeddings e ORDER BY sim DESC, doc_id ASC LIMIT 20
    ), reply AS (
      SELECT doc_id, sim,
        CASE doc_id % 5
          WHEN 0 THEN CAST(doc_id*37 % 101 AS VARCHAR) || '%'
          WHEN 1 THEN 'Score: ' || CAST(doc_id*7 % 11 AS VARCHAR) || '/10'
          WHEN 2 THEN CAST(doc_id*13 % 101 AS VARCHAR) || '/100'
          WHEN 3 THEN 'relevance ' || CAST(doc_id*3 % 10 AS VARCHAR)
                      || '.' || CAST(doc_id % 10 AS VARCHAR)
          ELSE 'no judgment'
        END AS reply
      FROM cand
    ), parsed AS (
      SELECT doc_id, sim, reply,
        round(least(1.0, greatest(0.0,
          CASE
            WHEN regexp_matches(trim(reply), '(\\d+(?:\\.\\d+)?)\\s*%')
              THEN CAST(regexp_extract(trim(reply), '(\\d+(?:\\.\\d+)?)\\s*%', 1) AS DOUBLE) / 100.0
            WHEN regexp_matches(trim(reply), '(\\d+(?:\\.\\d+)?)\\s*/\\s*(10|100)\\b')
              THEN CAST(regexp_extract(trim(reply), '(\\d+(?:\\.\\d+)?)\\s*/\\s*(10|100)\\b', 1) AS DOUBLE)
                   / CAST(regexp_extract(trim(reply), '(\\d+(?:\\.\\d+)?)\\s*/\\s*(10|100)\\b', 2) AS DOUBLE)
            WHEN regexp_matches(trim(reply), '\\d+(?:\\.\\d+)?')
              THEN CASE
                WHEN CAST(regexp_extract(trim(reply), '\\d+(?:\\.\\d+)?', 0) AS DOUBLE) > 10.0
                  THEN CAST(regexp_extract(trim(reply), '\\d+(?:\\.\\d+)?', 0) AS DOUBLE) / 100.0
                WHEN CAST(regexp_extract(trim(reply), '\\d+(?:\\.\\d+)?', 0) AS DOUBLE) > 1.0
                  THEN CAST(regexp_extract(trim(reply), '\\d+(?:\\.\\d+)?', 0) AS DOUBLE) / 10.0
                ELSE CAST(regexp_extract(trim(reply), '\\d+(?:\\.\\d+)?', 0) AS DOUBLE)
              END
            ELSE 0.5
          END)), {R}) AS llm_score
      FROM reply
    )
    SELECT doc_id, sim, reply, llm_score,
           0.5 * sim + 0.5 * llm_score AS blended
    FROM parsed
    ORDER BY blended DESC, doc_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# IVF-PQ composition (operators/quantize.py:ivfpq_search): coarse cells,
# probe the 2 nearest, PQ-ADC inside them, exact rescore — both prunings
# of the billion-scale ANN stack in one plan. Registered with frozen seed
# cells (p17's ivf_assign over the 8 lowest-id vectors) and the seeded PQ
# codebooks, so the oracle replays probe → assignment-prune → encode →
# ADC → rescore end to end. The k-means-trained composition keeps its
# recall floor in test_quantize.py.
#
# NOTE on the fixed nlist across this index family (p16/p17/p26/p27):
# for a SERVED index, nlist is a build-time constant (FAISS semantics —
# resizing means rebuilding), so frozen-8 is the honest registered form
# at the fixture scale; size it per corpus at build time (the
# ann.dynamic_seed_cells rule, k ≈ n/target_per_cell, is the sizing
# d06/c21 apply automatically for their self-join blocking, where a
# fixed count is a measured quadratic — SCALE.md "sf1 step").
# ---------------------------------------------------------------------------
@query("p16_ivfpq_search")
def p16_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ann import ivf_assign
    from mtg_vector_db_spark.operators.quantize import (
        ivfpq_search,
        seeded_pq_codebooks,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    assigned = ivf_assign(emb, seeds)
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    return ivfpq_search(
        assigned,
        seeds,
        cbs,
        qv,
        k=10,
        nprobe=2,
        oversample=4,
        cluster_col="cell",
        round_digits=R,
    ).orderBy(F.desc("sim"), F.asc("doc_id"))


oracle(
    "p16_ivfpq_search",
    f"""
    WITH c AS (
      SELECT CAST(vec_id AS INT) AS cell, CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < 8
    ),
    probe AS (SELECT cell FROM (
        SELECT c.cell,
               row_number() OVER (ORDER BY
                 list_cosine_similarity(c.cvec,
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                    WHERE vec_id = 0)) DESC, c.cell ASC) AS rn
        FROM c) WHERE rn <= 2),
    en AS (SELECT vec_id,
                  list_transform(CAST(embedding AS DOUBLE[]),
                    x -> x / sqrt(list_inner_product(
                           CAST(embedding AS DOUBLE[]),
                           CAST(embedding AS DOUBLE[])))) AS anx
           FROM embeddings),
    dists AS (SELECT en.vec_id, c.cell,
                     c.n2 - 2 * list_inner_product(c.cvec, en.anx) AS dist
              FROM en CROSS JOIN c),
    assign AS (SELECT vec_id, cell FROM (
                 SELECT vec_id, cell,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY dist, cell) AS rn
                 FROM dists) WHERE rn = 1),
    pruned AS (SELECT vec_id FROM assign
               WHERE cell IN (SELECT cell FROM probe)),
    {_pq_ctes("SELECT vec_id FROM pruned")},
    cand AS (SELECT vec_id, adc_dist FROM adc
             ORDER BY adc_dist ASC, vec_id ASC LIMIT 40)
    SELECT cand.vec_id AS doc_id, cand.adc_dist,
           round(list_cosine_similarity(e.v, (SELECT v FROM q)), {R}) AS sim
    FROM cand JOIN e USING (vec_id)
    ORDER BY sim DESC, doc_id ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Incremental IVF maintenance (operators/ann.py:ivf_assign): assign every
# vector to FROZEN cells — the map-side argmin a streaming index append
# runs per micro-batch (streaming/pipelines.py:streaming_ivf_ingest). Seed
# centroids are deterministic (the first 8 vectors), so unlike the k-means
# builds this assignment is fully oracle-exact: DuckDB replays the same
# ‖c‖² − 2·x̂·c argmin with the same sequential float64 folds.
# ---------------------------------------------------------------------------
@query("p17_ivf_assign_cells")
def p17_ivf_assign_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ann import ivf_assign

    (emb,) = tables(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    assigned = ivf_assign(emb, seeds)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cell")
    )


oracle(
    "p17_ivf_assign_cells",
    """
    WITH c AS (
      SELECT CAST(vec_id AS INT) AS cell,
             CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < 8
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nx
          FROM e),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    a AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cell) AS rn
            FROM d) WHERE rn = 1)
    SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM a GROUP BY cell ORDER BY cell
    """,
)


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation (extension): MRR and NDCG@10 of the exact
# KNN arm against label ground truth, per query — the metric computation
# a retrieval engine runs after every index/model change. Everything is
# one batch-KNN (queries broadcast) plus per-query aggregates; the ideal
# DCG is a closed-form fold over sequence(1, min(R,10)) — no lookup
# table, no driver loop, so the evaluation scales with the query set.
# ---------------------------------------------------------------------------
@query("p18_retrieval_metrics")
def p18_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    top = knn_join(
        emb, queries_df.select("query_id", "query_vec"), k=10, round_digits=R
    )
    labeled = top.join(
        F.broadcast(queries_df.select("query_id", "qlabel")), "query_id"
    ).join(emb.select("vec_id", "label"), "vec_id")
    rel = F.col("label") == F.col("qlabel")
    perq = labeled.groupBy("query_id", "qlabel").agg(
        F.coalesce(F.max(F.when(rel, 1.0 / F.col("rank"))), F.lit(0.0)).alias("rr"),
        F.coalesce(
            F.sum(F.when(rel, 1.0 / F.log2(F.col("rank") + 1))), F.lit(0.0)
        ).alias("dcg"),
        F.sum(rel.cast("long")).alias("n_rel_topk"),
    )
    # Total relevant per query = corpus size of its label minus itself
    # (knn_join excludes self) — a broadcast-joined per-label count.
    label_counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    idcg_n = F.least(F.col("n_label") - 1, F.lit(10))
    idcg = F.aggregate(
        F.sequence(F.lit(1), idcg_n),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    return (
        perq.join(
            F.broadcast(label_counts), perq.qlabel == label_counts.label
        )
        .select(
            "query_id",
            "n_rel_topk",
            F.round("rr", R).alias("mrr"),
            F.when(idcg_n <= 0, F.lit(0.0))
            .otherwise(F.round(F.col("dcg") / idcg, R))
            .alias("ndcg10"),
        )
        .orderBy("query_id")
    )


oracle(
    "p18_retrieval_metrics",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
             label AS qlabel
      FROM embeddings WHERE vec_id < 16
    ), scored AS (
      SELECT q.query_id, q.qlabel, e.vec_id AS doc_id, e.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
                   {R}) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS rank
      FROM scored
    ), perq AS (
      SELECT query_id, qlabel,
             coalesce(max(CASE WHEN label = qlabel THEN 1.0 / rank END), 0)
               AS rr,
             coalesce(sum(CASE WHEN label = qlabel
                          THEN 1.0 / log2(rank + 1) END), 0) AS dcg,
             sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS n_rel_topk
      FROM ranked WHERE rank <= 10 GROUP BY 1, 2
    ), counts AS (
      SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1
    )
    SELECT query_id, n_rel_topk, round(rr, {R}) AS mrr,
           CASE WHEN least(n_label - 1, 10) <= 0 THEN 0.0
                ELSE round(dcg / list_sum(list_transform(
                       range(1, least(n_label - 1, 10) + 1),
                       x -> 1.0 / log2(x + 1))), {R})
           END AS ndcg10
    FROM perq JOIN counts ON qlabel = label
    ORDER BY query_id
    """,
)


# ---------------------------------------------------------------------------
# End-to-end corpus build (extension): the full pre-training data DAG as
# ONE lineage — exact dedup (keep lowest doc_id per text), quality gate
# (composite score ≥ 0.5), deterministic md5 train/eval/test split, and
# per-(split, lang) reporting. One shuffle for the dedup window, one for
# the final small aggregate; the quality gate and split are map-side.
# Averages go through an exact DECIMAL(18,6) sum so the result is
# partitioning-invariant (same discipline as the money aggregates).
# ---------------------------------------------------------------------------
@query("p19_corpus_build_e2e")
def p19_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions import textstats as TS
    from mtg_vector_db_spark.functions.text import hash_fraction

    (docs,) = tables(spark, sf_dir, "documents")
    # Dedup window keys on md5(text), not the raw text: identical groups
    # (same hash both engines), but the shuffle key is a fixed 32-char
    # digest instead of the multi-KB document — at corpus scale the
    # exchange hashes/compares fingerprints, never documents (same
    # discipline as dedup.py exact_dup_stats).
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        docs.select("doc_id", "lang", "text")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    scored = deduped.select(
        "doc_id",
        "lang",
        TS.token_count(F.col("text")).alias("n_tokens"),
        TS.quality_score(F.col("text")).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    frac = hash_fraction(F.col("doc_id"))
    split = F.when(frac < 0.8, "train").when(frac < 0.9, "eval").otherwise("test")
    return (
        scored.select(split.alias("split"), "lang", "n_tokens", "quality")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            # Exact integer-micro average (seed-70707 tie fix, made
            # 2^53-safe in round 6 — see _avg_quality_exact).
            _avg_quality_exact(),
        )
        .orderBy("split", "lang")
    )


def _avg_quality_exact() -> Column:
    """Exact integer-arithmetic HALF_UP mean of per-doc quality at 6
    digits — shared by the p19/p24/p30 datasheet aggregates.

    Round-5 had fixed the double-round representation tie (fuzz seed
    70707) by summing integer micro-units, but then cast the long sum to
    double before dividing — lossy once Σ(quality·1e6) exceeds 2^53
    (~9e9 quality units, reachable at the billions-of-docs scale this
    engine targets), silently degrading the exact-.5-tie guarantee
    (round-5 ADVICE). This form never leaves integer arithmetic until
    the final ≤1e6-magnitude value: mean = sign·(|S| div n + 1 if
    2·(|S| mod n) ≥ n) — integer div/mod on the long sum, half-away-
    from-zero, exact at ANY corpus size. The sign split also keeps the
    Spark (`div` truncates toward zero) and DuckDB (`//` floors)
    replays identical for negative sums (p30 has no quality≥0.5 gate,
    and quality_score can reach −0.2/doc). The trailing /1e6 division
    is a ≤7-digit integer over a power of ten — exact in double."""
    s = "sum(CAST(CAST(quality AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
    n = "count(*)"
    mean = (
        f"(CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
        f" * ((abs({s}) div {n})"
        f" + (CASE WHEN 2 * (abs({s}) % {n}) >= {n} THEN 1 ELSE 0 END))"
    )
    # CAST(... AS DOUBLE): a bare 1000000.0 literal is DECIMAL in Spark
    # SQL, which would silently flip the output type to decimal(28,6)
    # while DuckDB returns DOUBLE.
    return F.expr(
        f"round(CAST(({mean}) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6)"
    ).alias("avg_quality")


def _avg_quality_exact_sql() -> str:
    """DuckDB replay of :func:`_avg_quality_exact` — same integer
    div/mod arithmetic (`//`/`%` on BIGINT over abs), so the two engines
    agree bit-for-bit at every corpus size, ties included."""
    s = "sum(CAST(CAST(quality AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
    n = "count(*)"
    mean = (
        f"(CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
        f" * ((abs({s}) // {n})"
        f" + (CASE WHEN 2 * (abs({s}) % {n}) >= {n} THEN 1 ELSE 0 END))"
    )
    return (
        f"round(CAST(({mean}) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6)"
        " AS avg_quality"
    )


def _p19_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import _NOISE, _NTOK, _SW_RATIO

    hash_frac = (
        "list_sum(list_transform(range(1, 9),"
        " i -> (strpos('0123456789abcdef',"
        " substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)"
        " * power(16, 8 - i))) / 4294967296.0"
    )
    return f"""
    WITH dedup AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1
    ), scored AS (
      SELECT doc_id, lang, {_NTOK} AS n_tokens,
             round(least(1.0, 0.3 + 0.4 * least(1.0, ({_SW_RATIO}) * 4)
                   + 0.3 * least(1.0, ({_NTOK}) / 100.0)
                   - 0.5 * ({_NOISE})), 6) AS quality
      FROM dedup
    ), gated AS (
      SELECT *, {hash_frac} AS frac FROM scored WHERE quality >= 0.5
    )
    SELECT CASE WHEN frac < 0.8 THEN 'train'
                WHEN frac < 0.9 THEN 'eval' ELSE 'test' END AS split,
           lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           {_avg_quality_exact_sql()}
    FROM gated GROUP BY 1, 2 ORDER BY 1, 2
    """


oracle("p19_corpus_build_e2e", _p19_oracle())


# ---------------------------------------------------------------------------
# Audio chunking plan (operators/multimodal.py:audio_chunk_plan): the
# 5-second chunk explode that spreads per-chunk decode/ASR work across
# executors, with the tail chunk truncated to the clip length. Media rows
# are synthesized from documents (duration = 10 ms per byte) so the
# oracle can replay the plan with generate_series.
# ---------------------------------------------------------------------------
@query("p20_audio_chunk_plan")
def p20_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.multimodal import audio_chunk_plan

    (docs,) = tables(spark, sf_dir, "documents")
    media = docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.lit("audio").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.octet_length(F.col("text")) * 10).cast("int").alias("duration_ms"),
    )
    return audio_chunk_plan(media, chunk_ms=5000).orderBy(
        "doc_id", "chunk_start_ms"
    )


oracle(
    "p20_audio_chunk_plan",
    """
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) * 10 AS duration_ms
      FROM documents WHERE doc_id < 50
    ), c AS (
      SELECT doc_id, duration_ms,
             unnest(generate_series(0, greatest(duration_ms - 1, 0), 5000))
               AS chunk_start_ms
      FROM m
    )
    SELECT doc_id, chunk_start_ms,
           least(duration_ms - chunk_start_ms, 5000) AS chunk_len_ms
    FROM c ORDER BY doc_id, chunk_start_ms
    """,
)


# ---------------------------------------------------------------------------
# Entity resolution end-to-end (extension): trigram set-similarity
# SELF-join (blocking by shared trigram — no cross join), connected
# components over the match graph (fixed-round min-label propagation —
# two keyed shuffles per round, no driver loop), canonical entity table
# (smallest member name per cluster). The oracle replays blocking,
# similarity, 3 propagation rounds, and canonicalization in SQL.
# ---------------------------------------------------------------------------
@query("p21_entity_resolution")
def p21_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.corpus import dup_clusters
    from mtg_vector_db_spark.operators.fuzzy_join import trigram_join

    (part,) = tables(spark, sf_dir, "part")
    bounded = part.filter(F.col("p_partkey") < 1000).select(
        "p_partkey", "p_name"
    )
    pairs = (
        trigram_join(
            bounded, bounded, "p_partkey", "p_name", "p_partkey", "p_name",
            threshold=0.6, round_digits=R,
        )
        .filter(F.col("id_l") < F.col("id_r"))
        .select(F.col("id_l").alias("id_a"), F.col("id_r").alias("id_b"))
    )
    # pin_chain: the trigram self-join verify runs once, not per round.
    clusters = dup_clusters(pairs, iters=3, pin_chain=True)
    return (
        clusters.join(bounded, clusters.doc_id == bounded.p_partkey)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("p_name").alias("canonical_name"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("cluster_id")
    )


def _p21_oracle() -> str:
    from mtg_vector_db_spark.functions.trigram import duckdb_trigram_set_sql

    tris = duckdb_trigram_set_sql("p_name")
    prop = (
        "SELECT e.u AS node, min(l.label) AS label "
        "FROM edges e JOIN {prev} l ON e.v = l.node GROUP BY e.u"
    )
    return f"""
    WITH b AS (SELECT p_partkey AS id, p_name, {tris} AS tris FROM part
               WHERE p_partkey < 1000),
    p AS (SELECT id, len(tris) AS n, unnest(tris) AS tri FROM b),
    j AS (SELECT a.id AS id_a, c.id AS id_b, a.n AS n_a, c.n AS n_c,
                 count(*) AS inter
          FROM p a JOIN p c USING (tri) WHERE a.id < c.id
          GROUP BY 1, 2, 3, 4),
    pairs AS (
      SELECT id_a, id_b FROM j
      WHERE round(inter * 1.0 / (n_a + n_c - inter), {R}) >= 0.6
    ),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    edges AS (SELECT u, v FROM sym UNION ALL SELECT node, node FROM nodes),
    l0 AS (SELECT node, node AS label FROM nodes),
    l1 AS ({prop.format(prev="l0")}),
    l2 AS ({prop.format(prev="l1")}),
    l3 AS ({prop.format(prev="l2")})
    SELECT label AS cluster_id, count(*) AS n_members,
           min(p_name) AS canonical_name
    FROM l3 JOIN b ON node = b.id
    GROUP BY 1 HAVING count(*) >= 2
    ORDER BY cluster_id
    """


oracle("p21_entity_resolution", _p21_oracle())


# ---------------------------------------------------------------------------
# Distributed classifier scoring + evaluation (extension): apply a
# broadcast linear model to every embedding (map-side dot + sigmoid —
# the batch-inference shape), then reduce to a per-class confusion
# matrix with precision/recall. The model is a literal weight vector:
# at scale it arrives as a broadcast, and scoring stays embarrassingly
# parallel; only the k-row confusion aggregate shuffles. Synthetic
# ground truth = even label id, weights are exact rationals so the
# oracle replays scoring bit-for-bit (sequential fold, like cosine).
# ---------------------------------------------------------------------------
@query("p22_classifier_eval")
def p22_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import dot, vec_lit

    (emb,) = tables(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    weights = [((i * 37) % 21 - 10) / 10.0 for i in range(dim)]
    z = dot(F.col("embedding"), vec_lit(weights))
    score = 1.0 / (1.0 + F.exp(-z))
    scored = emb.select(
        (F.col("label") % 2 == 0).alias("actual"),
        (score >= 0.5).alias("predicted"),
    )
    return (
        scored.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual", "predicted")
    )


def _p22_oracle() -> str:
    return """
    WITH w AS (
      SELECT list_transform(range(0, len(CAST(embedding AS DOUBLE[]))),
               i -> CAST((i * 37) % 21 - 10 AS DOUBLE) / 10.0) AS wv,
             CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings
    ), s AS (
      SELECT (label % 2 = 0) AS actual,
             (1.0 / (1.0 + exp(-list_inner_product(v, wv))) >= 0.5)
               AS predicted
      FROM w
    )
    SELECT actual, predicted, count(*) AS n
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """


oracle("p22_classifier_eval", _p22_oracle())


# ---------------------------------------------------------------------------
# Threshold sweep / PR curve (extension): score once, explode a literal
# threshold list (map-side 5× fan-out — no rescan, no per-threshold
# job), and reduce to (threshold, precision, recall). The standard
# operating-point selection for any filter model (quality gates, dedup
# verdicts, toxicity): one pass over the corpus regardless of how many
# thresholds are swept.
# ---------------------------------------------------------------------------
@query("p23_threshold_sweep")
def p23_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import dot, vec_lit

    (emb,) = tables(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    weights = [((i * 37) % 21 - 10) / 10.0 for i in range(dim)]
    score = 1.0 / (1.0 + F.exp(-dot(F.col("embedding"), vec_lit(weights))))
    thresholds = [0.3, 0.4, 0.5, 0.6, 0.7]
    scored = emb.select(
        (F.col("label") % 2 == 0).alias("actual"), score.alias("score")
    )
    swept = scored.select(
        "actual", "score",
        F.explode(F.array(*[F.lit(t) for t in thresholds])).alias("threshold"),
    )
    return (
        swept.groupBy("threshold")
        .agg(
            F.sum((F.col("score") >= F.col("threshold")).cast("long")).alias("pred_pos"),
            F.sum(
                ((F.col("score") >= F.col("threshold")) & F.col("actual")).cast("long")
            ).alias("true_pos"),
            F.sum(F.col("actual").cast("long")).alias("actual_pos"),
        )
        .select(
            "threshold",
            "pred_pos",
            "true_pos",
            F.round(
                F.when(F.col("pred_pos") > 0, F.col("true_pos") / F.col("pred_pos"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("precision"),
            F.round(F.col("true_pos") / F.col("actual_pos"), 6).alias("recall"),
        )
        .orderBy("threshold")
    )


oracle(
    "p23_threshold_sweep",
    """
    WITH s AS (
      SELECT (label % 2 = 0) AS actual,
             1.0 / (1.0 + exp(-list_inner_product(
               CAST(embedding AS DOUBLE[]),
               list_transform(range(0, len(CAST(embedding AS DOUBLE[]))),
                 i -> CAST((i * 37) % 21 - 10 AS DOUBLE) / 10.0)))) AS score
      FROM embeddings
    ), sw AS (
      SELECT actual, score, unnest([0.3, 0.4, 0.5, 0.6, 0.7]) AS threshold
      FROM s
    ), agg AS (
      SELECT threshold,
             CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT)
               AS pred_pos,
             CAST(sum(CASE WHEN score >= threshold AND actual THEN 1 ELSE 0 END)
               AS BIGINT) AS true_pos,
             CAST(sum(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT)
               AS actual_pos
      FROM sw GROUP BY 1
    )
    SELECT threshold, pred_pos, true_pos,
           round(CASE WHEN pred_pos > 0
                      THEN true_pos * 1.0 / pred_pos ELSE 0.0 END, 6)
             AS precision,
           round(true_pos * 1.0 / actual_pos, 6) AS recall
    FROM agg ORDER BY threshold
    """,
)


# ---------------------------------------------------------------------------
# P24 (extension): the DECONTAMINATED corpus build — p19's end-to-end DAG
# upgraded with the round-2 operators, as one lineage:
#   exact dedup → repeated-span gate (d07: drop docs ≥80% covered by
#   cross-document 5-gram spans) → quality gate → md5 split → Bloom
#   decontamination (c10: drop train docs whose shingle hit-ratio against
#   the eval/test filter ≥ 0.3) → per-(split, lang) report.
# Everything stays the operators' own plan shapes: one md5-keyed window
# for dedup (fingerprint-width shuffle key, never the raw document),
# hash-keyed span shuffles, a broadcast bitset for the contamination
# probe, and a tiny final aggregate. Oracle replays the whole chain
# CTE-for-CTE from the proven p19/d07/c10 pieces. The post-gate relation
# is persisted inside the query so the three split branches share one
# computation of the dedup+span+quality prefix (the round-2 1.7×
# branch-recompute finding); a production run would materialize the
# gated corpus to storage at the same point.
# ---------------------------------------------------------------------------
_P24_SPAN_TAU = 0.8
_P24_CONTAM_TAU = 0.3


@query("p24_decontaminated_corpus_build")
def p24_decontaminated_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions import textstats as TS
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.operators import bloom as B, dedup as D

    (docs,) = tables(spark, sf_dir, "documents")
    from mtg_vector_db_spark.session import pin

    # md5(text) window key: same dedup groups, fingerprint-width shuffle
    # (see p19; dedup.py exact_dup_stats is the canonical pattern).
    #
    # Pinned (round 9, guide §2.4): `deduped` feeds TWO sibling branches
    # of the final DAG — the span miner (repeated_ngram_spans) and the
    # span_kept join — so the md5 window shuffle over the full text
    # corpus ran twice (the same shared-subtree recompute the CC family
    # had; Catalyst reuses only exchange subtrees). Semantics-neutral
    # eager localCheckpoint, recomputed from parquet every run.
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = pin(
        docs.select("doc_id", "lang", "text")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    spans = D.repeated_ngram_spans(deduped, n=5, min_docs=2).select(
        "doc_id", "covered_ratio"
    )
    span_kept = (
        deduped.join(spans, "doc_id", "left")
        .filter(
            F.col("covered_ratio").isNull()
            | (F.col("covered_ratio") < _P24_SPAN_TAU)
        )
        .drop("covered_ratio")
    )
    scored = span_kept.select(
        "doc_id",
        "lang",
        "text",
        TS.token_count(F.col("text")).alias("n_tokens"),
        TS.quality_score(F.col("text")).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    frac = hash_fraction(F.col("doc_id"))
    split = F.when(frac < 0.8, "train").when(frac < 0.9, "eval").otherwise("test")
    # Pin the post-gate relation: three branches (bench-side filter
    # builder, train-side probe, final union) otherwise re-derive the
    # whole dedup+span+quality prefix — Catalyst can't reuse subtrees
    # that differ by pushed-down split filters. A plan property, not a
    # semantic one: the oracle replays the identical one-DAG chain. In a
    # production run this is the materialize-between-stages point (write
    # the gated corpus, then decontaminate); pin (vs persist) releases
    # the blocks when the query's refs drop — round-3 ADVICE.
    sp = pin(scored.withColumn("split", split))
    bench = sp.filter(F.col("split") != "train")
    train = sp.filter(F.col("split") == "train")
    flagged = (
        B.bloom_decontaminate(train, bench)
        .filter(F.col("hit_ratio") >= _P24_CONTAM_TAU)
        .select("doc_id")
    )
    clean = train.join(flagged, "doc_id", "left_anti").unionByName(bench)
    return (
        clean.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            # Exact integer-micro average (seed-70707 tie fix, made
            # 2^53-safe in round 6 — see _avg_quality_exact).
            _avg_quality_exact(),
        )
        .orderBy("split", "lang")
    )


def _p24_oracle() -> str:
    from mtg_vector_db_spark.plans.corpus_queries import (
        _BLOOM_P,
        _BLOOM_POS,
        _SH_H60,
    )
    from mtg_vector_db_spark.plans.dedup_queries import _H60, _SHINGLES, _TOKS_L
    from mtg_vector_db_spark.plans.text_queries import _NOISE, _NTOK, _SW_RATIO

    hash_frac = (
        "list_sum(list_transform(range(1, 9),"
        " i -> (strpos('0123456789abcdef',"
        " substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)"
        " * power(16, 8 - i))) / 4294967296.0"
    )
    return f"""
    WITH dedup AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1
    ),
    dtok AS (SELECT doc_id, {_TOKS_L} AS toks FROM dedup),
    dwnd AS (SELECT doc_id, i - 1 AS pos, len(toks) AS n_tokens,
                    array_to_string(toks[i:i + 4], ' ') AS gram
             FROM dtok, unnest(range(1, greatest(len(toks) - 3, 1))) AS u(i)),
    dh AS (SELECT doc_id, pos, n_tokens, {_H60} AS hh FROM dwnd),
    ddup AS (SELECT hh FROM dh GROUP BY hh HAVING count(DISTINCT doc_id) >= 2),
    dcov AS (SELECT doc_id,
                    round(count(DISTINCT p) * 1.0 / any_value(n_tokens), 6)
                      AS covered_ratio
             FROM (SELECT doc_id, n_tokens, unnest(range(pos, pos + 5)) AS p
                   FROM dh JOIN ddup USING (hh))
             GROUP BY doc_id),
    span_kept AS (
      SELECT d.* FROM dedup d LEFT JOIN dcov USING (doc_id)
      WHERE dcov.covered_ratio IS NULL OR dcov.covered_ratio < {_P24_SPAN_TAU}
    ),
    scored AS (
      SELECT doc_id, lang, text, {_NTOK} AS n_tokens,
             round(least(1.0, 0.3 + 0.4 * least(1.0, ({_SW_RATIO}) * 4)
                   + 0.3 * least(1.0, ({_NTOK}) / 100.0)
                   - 0.5 * ({_NOISE})), 6) AS quality
      FROM span_kept
    ),
    sp AS (
      SELECT *, CASE WHEN frac < 0.8 THEN 'train'
                     WHEN frac < 0.9 THEN 'eval' ELSE 'test' END AS split
      FROM (SELECT *, {hash_frac} AS frac FROM scored WHERE quality >= 0.5)
    ),
    bench_sh AS (SELECT DISTINCT unnest({_SHINGLES}) AS sh
                 FROM sp WHERE split <> 'train'),
    bench_h AS (SELECT {_SH_H60} % {_BLOOM_P} AS hh FROM bench_sh),
    build_pos AS (SELECT DISTINCT unnest({_BLOOM_POS}) AS pos FROM bench_h),
    probe AS (SELECT doc_id, unnest({_SHINGLES}) AS sh
              FROM sp WHERE split = 'train'),
    probe_h AS (SELECT doc_id, sh, {_SH_H60} % {_BLOOM_P} AS hh FROM probe),
    probe_pos AS (SELECT DISTINCT doc_id, sh, pos
                  FROM (SELECT doc_id, sh, unnest({_BLOOM_POS}) AS pos
                        FROM probe_h)),
    tested AS (SELECT p.doc_id, p.sh,
                      min(CASE WHEN bp.pos IS NOT NULL THEN 1 ELSE 0 END) AS hit
               FROM probe_pos p LEFT JOIN build_pos bp USING (pos)
               GROUP BY p.doc_id, p.sh),
    flagged AS (SELECT doc_id FROM (
                  SELECT doc_id,
                         round(sum(hit) * 1.0 / count(*), 6) AS hit_ratio
                  FROM tested GROUP BY doc_id)
                WHERE hit_ratio >= {_P24_CONTAM_TAU}),
    clean AS (
      SELECT * FROM sp
      WHERE split <> 'train'
         OR doc_id NOT IN (SELECT doc_id FROM flagged)
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           {_avg_quality_exact_sql()}
    FROM clean GROUP BY 1, 2 ORDER BY 1, 2
    """


oracle("p24_decontaminated_corpus_build", _p24_oracle())


# ---------------------------------------------------------------------------
# P25 (extension): binary-payload exact dedup — the store-by-content-hash
# step every multimodal lake runs before feature extraction (payloads are
# opaque bytes; dedup keys on md5 of the bytes, never on decoded
# content). Media rows are synthesized from documents (payload = UTF-8
# bytes of the first 40 chars, so collisions exist by construction);
# the real-codec path would feed actual image/audio bytes through the
# same shape. One hash-keyed shuffle; byte savings = total − distinct.
# ---------------------------------------------------------------------------
@query("p25_payload_dedup")
def p25_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    media = docs.select(
        F.encode(F.substring(F.col("text"), 1, 40), "UTF-8").alias("payload")
    )
    hashed = media.select(
        F.md5(F.col("payload")).alias("h"),
        F.octet_length(F.col("payload")).alias("nbytes"),
    )
    groups = hashed.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("nbytes").alias("nbytes"),
        F.sum("nbytes").alias("bytes_all"),
    )
    return groups.agg(
        F.sum("n").alias("n_payloads"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.max("n").alias("max_group_size"),
        F.sum("bytes_all").alias("bytes_total"),
        F.sum("nbytes").alias("bytes_deduped"),
    )


oracle(
    "p25_payload_dedup",
    """
    WITH g AS (
      SELECT md5(substring(text, 1, 40)) AS h, count(*) AS n,
             max(octet_length(encode(substring(text, 1, 40)))) AS nbytes,
             CAST(sum(octet_length(encode(substring(text, 1, 40)))) AS BIGINT)
               AS bytes_all
      FROM documents GROUP BY 1
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_payloads,
           count(*) AS n_distinct,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           max(n) AS max_group_size,
           CAST(sum(bytes_all) AS BIGINT) AS bytes_total,
           CAST(sum(nbytes) AS BIGINT) AS bytes_deduped
    FROM g
    """,
)


# ---------------------------------------------------------------------------
# P26 (extension): semi-hard negative mining for contrastive training —
# for each anchor, the k most-similar candidates inside a similarity band
# (below the positive threshold, above the trivial floor), drawn from the
# IVF-cell-blocked candidate space (d06's blocking, never O(n²)). The
# data-prep step behind embedding-model fine-tuning: positives come from
# near-dup pairs, negatives from this query. Per-anchor rank windows see
# only blocked candidates; the anchor set is batch-bounded by contract.
# ---------------------------------------------------------------------------
_P26_HI = 0.5   # sim >= HI is a positive, not a negative
_P26_LO = 0.15  # sim < LO is a trivial negative (uninformative)
_P26_K = 5
_P26_ANCHORS = 20
_P26_NPROBE = 3


@query("p26_hard_negatives")
def p26_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import dot, l2_normalize
    from mtg_vector_db_spark.operators.ann import ivf_multi_assign

    (emb,) = tables(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    blocked = ivf_multi_assign(emb, seeds, nprobe=_P26_NPROBE)
    anchors = blocked.filter(F.col("vec_id") < _P26_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), "cell"
    )
    partners = blocked.select(F.col("vec_id").alias("neg_id"), "cell")
    cand = (
        anchors.join(partners, "cell")
        .filter(F.col("anchor_id") != F.col("neg_id"))
        .select("anchor_id", "neg_id")
        .distinct()
    )
    nx = emb.select("vec_id", l2_normalize(F.col("embedding")).alias("nx"))
    na = nx.select(F.col("vec_id").alias("anchor_id"), F.col("nx").alias("nx_a"))
    nb = nx.select(F.col("vec_id").alias("neg_id"), F.col("nx").alias("nx_b"))
    sim = F.round(dot(F.col("nx_a"), F.col("nx_b")), 6)
    banded = (
        cand.join(na, "anchor_id")
        .join(nb, "neg_id")
        .select("anchor_id", "neg_id", sim.alias("sim"))
        .filter((F.col("sim") >= _P26_LO) & (F.col("sim") < _P26_HI))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), F.asc("neg_id"))
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P26_K)
        .orderBy("anchor_id", "rank")
    )


oracle(
    "p26_hard_negatives",
    f"""
    WITH c AS (
      SELECT CAST(vec_id AS INT) AS cell, CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < 8
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nx
          FROM e),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    a AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cell) AS rn
            FROM d) WHERE rn <= {_P26_NPROBE}),
    cand AS (
      SELECT DISTINCT l.vec_id AS anchor_id, r.vec_id AS neg_id
      FROM a l JOIN a r ON l.cell = r.cell AND l.vec_id <> r.vec_id
      WHERE l.vec_id < {_P26_ANCHORS}
    ),
    banded AS (
      SELECT anchor_id, neg_id,
             round(list_inner_product(na.nx, nb.nx), 6) AS sim
      FROM cand JOIN n na ON cand.anchor_id = na.vec_id
                JOIN n nb ON cand.neg_id = nb.vec_id
      WHERE round(list_inner_product(na.nx, nb.nx), 6) >= {_P26_LO}
        AND round(list_inner_product(na.nx, nb.nx), 6) < {_P26_HI}
    )
    SELECT anchor_id, neg_id, sim, rank FROM (
      SELECT anchor_id, neg_id, sim,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY sim DESC, neg_id ASC) AS rank
      FROM banded)
    WHERE rank <= {_P26_K}
    ORDER BY anchor_id, rank
    """,
)


# ---------------------------------------------------------------------------
# P27 (extension): driver-checked ANN recall — recall@10 of the IVF path
# against exact KNN for query vectors 0..9, as a QUERY with a DuckDB
# oracle rather than a committed artifact (RECALL.md holds the broader
# sweep; this row makes the headline claim machine-verified every
# round). Both arms share the broadcast query table; the IVF arm prunes
# to nprobe=3 cells via the same frozen assignment d06/p04 use.
# ---------------------------------------------------------------------------
_P27_K = 10
# nprobe=4 (round-3 sweep): Lloyd-IVF recall@10 0.88 -> 0.91 at sf0.1
# while scanning ~half the corpus (RECALL.md trade table) — clears the
# >=0.90 deterministic-arm bar against the reference HNSW analog.
_P27_NPROBE = 4


@query("p27_ivf_recall_report")
def p27_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import ivf_assign, ivf_multi_assign
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_join(emb, queries_df, k=_P27_K, round_digits=R).select(
        "query_id", "vec_id"
    )

    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    assigned = ivf_assign(emb, seeds)
    probe = ivf_multi_assign(
        queries_df.select(
            F.col("query_id").alias("vec_id"),
            F.col("query_vec").alias("embedding"),
        ),
        seeds,
        nprobe=_P27_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    sim = F.round(
        cosine_similarity(F.col("embedding"), F.col("query_vec")), R
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    ivf_topk = (
        assigned.join(probe, "cell")
        .join(F.broadcast(queries_df), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P27_K)
        .select("query_id", "vec_id")
    )
    overlap = (
        exact.join(ivf_topk, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        queries_df.select("query_id")
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.lit(float(_P27_K)), 6
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


oracle(
    "p27_ivf_recall_report",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    exact AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv), {R}) DESC,
                 e.vec_id ASC) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= {_P27_K}
    ),
    c AS (
      SELECT CAST(vec_id AS INT) AS cell, CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < 8
    ),
    n AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                    CAST(embedding AS DOUBLE[])))) AS nx
          FROM embeddings),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, cell FROM (
                   SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cell) AS rn
                   FROM d) WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cell) AS rn
                FROM d WHERE vec_id < 10) WHERE rn <= {_P27_NPROBE}),
    ivf_topk AS (
      SELECT query_id, doc_id FROM (
        SELECT p.query_id, a.vec_id AS doc_id,
               row_number() OVER (PARTITION BY p.query_id ORDER BY
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv), {R}) DESC,
                 a.vec_id ASC) AS rank
        FROM assigned a
        JOIN probe p USING (cell)
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN q ON q.query_id = p.query_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rank <= {_P27_K}
    ),
    ov AS (
      SELECT exact.query_id, count(*) AS n_overlap
      FROM exact JOIN ivf_topk
        ON exact.query_id = ivf_topk.query_id
       AND exact.doc_id = ivf_topk.doc_id
      GROUP BY exact.query_id
    )
    SELECT q.query_id, coalesce(ov.n_overlap, 0) AS n_overlap,
           round(coalesce(ov.n_overlap, 0) / {float(_P27_K)}, 6) AS recall_at_10
    FROM q LEFT JOIN ov ON q.query_id = ov.query_id
    ORDER BY q.query_id
    """,
)


# ---------------------------------------------------------------------------
# P28 (extension): machine-verified recall for the binary-quantization
# arm — recall@10 of sign-bit Hamming candidates (oversample 4) + exact
# rescore against exact KNN, for query vectors 0..9 (p27's pattern
# applied to p11's index structure). The Hamming stage is a batch
# formulation: queries broadcast, one zip_with sign-mismatch fold per
# (vector, query), per-query TakeOrdered windows.
# ---------------------------------------------------------------------------
_P28_K = 10
_P28_OS = 4


@query("p28_bq_recall_report")
def p28_bq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_join(emb, queries_df, k=_P28_K, round_digits=R).select(
        "query_id", "vec_id"
    )
    ham = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("query_vec"),
            lambda a, b: ((a > 0) != (b > 0)).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pairs = (
        emb.join(F.broadcast(queries_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "query_vec",
            ham.alias("hamming"),
        )
    )
    wh = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    cand = pairs.withColumn("hrank", F.row_number().over(wh)).filter(
        F.col("hrank") <= _P28_K * _P28_OS
    )
    sim = F.round(cosine_similarity(F.col("embedding"), F.col("query_vec")), R)
    ws = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    bq_topk = (
        cand.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= _P28_K)
        .select("query_id", "vec_id")
    )
    overlap = (
        exact.join(bq_topk, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        queries_df.select("query_id")
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.lit(float(_P28_K)), 6
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


oracle(
    "p28_bq_recall_report",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe,
             CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    exact AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv), {R}) DESC,
                 e.vec_id ASC) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= {_P28_K}
    ),
    h AS (
      SELECT q.query_id, e.vec_id AS doc_id, e.embedding,  q.qv,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0)
                    THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    cand AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY hamming ASC, doc_id ASC) AS hrank
               FROM h) WHERE hrank <= {_P28_K * _P28_OS}),
    bq_topk AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY
                 round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              qv), {R}) DESC,
                 doc_id ASC) AS rank
        FROM cand
      ) WHERE rank <= {_P28_K}
    ),
    ov AS (
      SELECT exact.query_id, count(*) AS n_overlap
      FROM exact JOIN bq_topk
        ON exact.query_id = bq_topk.query_id
       AND exact.doc_id = bq_topk.doc_id
      GROUP BY exact.query_id
    )
    SELECT q.query_id, coalesce(ov.n_overlap, 0) AS n_overlap,
           round(coalesce(ov.n_overlap, 0) / {float(_P28_K)}, 6) AS recall_at_10
    FROM q LEFT JOIN ov ON q.query_id = ov.query_id
    ORDER BY q.query_id
    """,
)


# ---------------------------------------------------------------------------
# P29 (extension): frame-level video dedup — frame-sample plan (p08's
# explode) → per-frame content hash (deterministic stand-in for a
# perceptual hash; the real phash slots in behind the same column) →
# cross-video duplicate-frame detection, reported per video. The
# multimodal composition of d07's span idea: dup detection keys one
# shuffle on the 16-hex frame hash; frame content is a timestamp-scaled
# window of the source text so near-dup videos share frames by
# construction.
# ---------------------------------------------------------------------------
@query("p29_frame_dedup")
def p29_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.multimodal import frame_sample_plan

    (docs,) = tables(spark, sf_dir, "documents")
    media = docs.filter(F.col("doc_id") < 1000).select(
        "doc_id",
        F.lit("video").alias("media_type"),
        F.col("text"),
        (F.octet_length(F.col("text")) * 10).cast("int").alias("duration_ms"),
    )
    frames = frame_sample_plan(media, every_ms=1000).join(
        media.select("doc_id", "text"), "doc_id"
    )
    hashed = frames.select(
        "doc_id",
        "frame_ts_ms",
        F.substring(
            F.md5(F.substring(F.col("text"), (F.col("frame_ts_ms") / 10 + 1).cast("int"), 20)),
            1,
            16,
        ).alias("phash"),
    )
    dup = (
        hashed.groupBy("phash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("phash")
    )
    per_doc = (
        hashed.join(dup, "phash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_frames"))
    )
    totals = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return (
        totals.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_frames",
            "n_dup_frames",
            F.round(F.col("n_dup_frames") / F.col("n_frames"), 6).alias(
                "dup_frame_ratio"
            ),
        )
        .orderBy("doc_id")
    )


oracle(
    "p29_frame_dedup",
    """
    WITH media AS (
      SELECT doc_id, text, octet_length(encode(text)) * 10 AS duration_ms
      FROM documents WHERE doc_id < 1000
    ),
    frames AS (
      SELECT doc_id, text,
             unnest(range(0, greatest(duration_ms - 1, 0) + 1, 1000))
               AS frame_ts_ms
      FROM media
    ),
    hashed AS (
      SELECT doc_id, frame_ts_ms,
             substring(md5(substring(text,
               CAST(frame_ts_ms / 10 + 1 AS INT), 20)), 1, 16) AS phash
      FROM frames
    ),
    dup AS (SELECT phash FROM hashed
            GROUP BY phash HAVING count(DISTINCT doc_id) >= 2),
    per_doc AS (SELECT doc_id, count(*) AS n_dup_frames
                FROM hashed JOIN dup USING (phash) GROUP BY doc_id),
    totals AS (SELECT doc_id, count(*) AS n_frames FROM hashed GROUP BY doc_id)
    SELECT totals.doc_id, totals.n_frames, per_doc.n_dup_frames,
           round(per_doc.n_dup_frames * 1.0 / totals.n_frames, 6)
             AS dup_frame_ratio
    FROM totals JOIN per_doc USING (doc_id)
    ORDER BY totals.doc_id
    """,
)


# ---------------------------------------------------------------------------
# P30 (extension): dataset card — the datasheet emitted alongside a
# corpus snapshot: per-language (plus ALL, via rollup's one Expand pass)
# document/token counts, quality, and exact-duplicate rate. Single
# aggregation over one scan; averages ride the exact-DECIMAL sum so the
# row hashes are partitioning-independent.
# ---------------------------------------------------------------------------
@query("p30_dataset_report")
def p30_dataset_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions import textstats as TS

    (docs,) = tables(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        TS.token_count(F.col("text")).alias("n_tokens"),
        TS.quality_score(F.col("text")).alias("quality"),
        F.md5("text").alias("content"),
    )
    return (
        base.rollup("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            # Exact integer-micro average (seed-70707 tie fix, made
            # 2^53-safe in round 6 — see _avg_quality_exact).
            _avg_quality_exact(),
            F.round(
                1 - F.count_distinct("content") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "n_tokens",
            "avg_quality",
            "dup_rate",
        )
        .orderBy("lang")
    )


def _p30_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import _NOISE, _NTOK, _SW_RATIO

    quality = (
        f"round(least(1.0, 0.3 + 0.4 * least(1.0, ({_SW_RATIO}) * 4)"
        f" + 0.3 * least(1.0, ({_NTOK}) / 100.0)"
        f" - 0.5 * ({_NOISE})), 6)"
    )
    return f"""
    WITH base AS (
      SELECT lang, {_NTOK} AS n_tokens, {quality} AS quality,
             md5(text) AS content
      FROM documents
    )
    SELECT coalesce(lang, 'ALL') AS lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           {_avg_quality_exact_sql()},
           round(1 - count(DISTINCT content) * 1.0 / count(*), 6) AS dup_rate
    FROM base GROUP BY ROLLUP (lang) ORDER BY lang
    """


oracle("p30_dataset_report", _p30_oracle())


# ---------------------------------------------------------------------------
# P31: curation-funnel datasheet — cumulative survivor counts through the
# standard cleaning cascade (raw → language filter → quality score →
# within-doc repetition gate → exact dedup), one row, with end-to-end
# yield. Composes t08's quality formula, t22's repetition gate
# (operators/repetition.py), and d01's content-hash dedup; the oracle
# replays the whole cascade (the repetition CTEs are shared with t22's
# oracle verbatim). Every stage is a map-side flag; the only wide ops
# are the repetition profile's gram shuffle and one count-distinct.
# ---------------------------------------------------------------------------
@query("p31_curation_funnel")
def p31_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions import textstats as TSS
    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    prof = doc_repetition_profile(docs).select("doc_id", "keep")
    flags = (
        docs.select(
            "doc_id",
            "lang",
            F.md5("text").alias("h"),
            TSS.quality_score(F.col("text")).alias("q"),
        )
        .join(prof, "doc_id", "left")
        .select(
            "doc_id",
            "h",
            (F.col("lang") == "en").alias("s_lang"),
            (
                (F.col("lang") == "en") & (F.col("q") > 0.55)
            ).alias("s_q"),
            (
                (F.col("lang") == "en")
                & (F.col("q") > 0.55)
                # The profile is total (one row per doc), so this
                # coalesce never fires; true mirrors its short-doc
                # default if an upstream ever reintroduces a gap.
                & F.coalesce(F.col("keep"), F.lit(True))
            ).alias("s_rep"),
        )
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("s_lang").cast("long")).alias("n_lang"),
        F.sum(F.col("s_q").cast("long")).alias("n_quality"),
        F.sum(F.col("s_rep").cast("long")).alias("n_repetition"),
        F.count_distinct(F.when(F.col("s_rep"), F.col("h"))).alias(
            "n_unique"
        ),
    ).select(
        "*",
        F.round(F.col("n_unique") / F.col("n_raw"), 6).alias("yield_rate"),
    )


def _p31_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import (
        T22_PROF_CTES,
        _NOISE,
        _NTOK,
        _SW_RATIO,
    )

    quality = (
        f"least(1.0, 0.3 + 0.4 * least(1.0, ({_SW_RATIO}) * 4)"
        f" + 0.3 * least(1.0, ({_NTOK}) / 100.0) - 0.5 * ({_NOISE}))"
    )
    return f"""
    WITH {T22_PROF_CTES},
    base AS (
      SELECT doc_id, md5(text) AS h,
             (lang = 'en') AS s_lang,
             (lang = 'en' AND {quality} > 0.55) AS s_q
      FROM documents
    ),
    flags AS (
      -- coalesce(..., true): a doc with no rep_prof row has no n-grams
      -- at all; the repetition screen passes it (operator totality).
      SELECT b.doc_id, h, s_lang, s_q,
             s_q AND coalesce(
               (top2 <= 0.20 AND top3 <= 0.18 AND dup5 <= 0.30), true
             ) AS s_rep
      FROM base b LEFT JOIN rep_prof p USING (doc_id)
    )
    SELECT count(*) AS n_raw,
           CAST(sum(CASE WHEN s_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(sum(CASE WHEN s_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN s_rep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetition,
           count(DISTINCT CASE WHEN s_rep THEN h END) AS n_unique,
           round(count(DISTINCT CASE WHEN s_rep THEN h END) * 1.0
                 / count(*), 6) AS yield_rate
    FROM flags
    """


oracle("p31_curation_funnel", _p31_oracle())


# ---------------------------------------------------------------------------
# P32: active-learning margin sampling — the labeling queue: held-out
# documents ranked by how UNSURE the in-engine Naive Bayes classifier
# is (smallest top-1 minus top-2 log-score margin first). Margins are
# differences of exact DECIMAL scores (operators/nbayes.py), so the
# queue order is engine-exact down to ties, which break on doc_id. The
# oracle reuses t24's score CTEs verbatim.
# ---------------------------------------------------------------------------
@query("p32_margin_sampling")
def p32_margin_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.operators.nbayes import nb_doc_scores

    (docs,) = tables(spark, sf_dir, "documents")
    scores = nb_doc_scores(docs, F.col("doc_id") % 5 != 0)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.desc("cls")
    )
    ranked = scores.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    per_doc = ranked.groupBy("doc_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cls"))).alias("predicted"),
        (
            F.max(F.when(F.col("rn") == 1, F.col("score")))
            - F.max(F.when(F.col("rn") == 2, F.col("score")))
        )
        .cast("double")
        .alias("margin"),
    )
    return (
        per_doc.select(
            "doc_id", "predicted", F.round("margin", 6).alias("margin")
        )
        .orderBy(F.asc("margin"), F.asc("doc_id"))
        .limit(20)
    )


def _p32_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import T24_SCORE_CTES

    return f"""
    WITH {T24_SCORE_CTES},
    ranked AS (
      SELECT doc_id, cls, score, row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, cls DESC) AS rn
      FROM scored
    ),
    per_doc AS (
      SELECT doc_id,
             max(CASE WHEN rn = 1 THEN cls END) AS predicted,
             CAST(max(CASE WHEN rn = 1 THEN score END)
                  - max(CASE WHEN rn = 2 THEN score END) AS DOUBLE)
               AS margin
      FROM ranked WHERE rn <= 2 GROUP BY doc_id
    )
    SELECT doc_id, predicted, round(margin, 6) AS margin
    FROM per_doc ORDER BY margin ASC, doc_id ASC LIMIT 20
    """


oracle("p32_margin_sampling", _p32_oracle())


# ---------------------------------------------------------------------------
# P33: retrieval-arm agreement — how much do the lexical (BM25) and
# vector arms of the p10 hybrid agree before fusion? Overlap@30,
# Jaccard, and Spearman's rho over the shared documents' ranks — the
# diagnostic that says whether hybrid fusion is adding signal or just
# averaging one arm with itself. All-integer rank arithmetic (exact in
# both engines); reuses the p10 arms and oracle fragments verbatim.
# ---------------------------------------------------------------------------
@query("p33_arm_agreement")
def p33_arm_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.knn import knn
    from mtg_vector_db_spark.operators.text_search import bm25_topk, ranked
    from mtg_vector_db_spark.plans.text_queries import BM25_TERMS
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    b = ranked(bm25_topk(docs, BM25_TERMS, k=30, round_digits=R), "bm25")
    v = ranked(
        knn(emb, qv, 30, round_digits=R), "sim", id_col="vec_id"
    ).withColumnRenamed("vec_id", "doc_id")
    joined = b.select("doc_id", F.col("rank").alias("rb0")).join(
        v.select("doc_id", F.col("rank").alias("rv0")), "doc_id"
    )
    # Spearman applies to a permutation of 1..n: re-rank WITHIN the
    # overlap (arm order is preserved; absolute top-30 positions are not
    # a permutation of the shared set).
    from pyspark.sql import Window

    joined = joined.select(
        "doc_id",
        F.row_number().over(Window.orderBy("rb0", "doc_id")).alias("rb"),
        F.row_number().over(Window.orderBy("rv0", "doc_id")).alias("rv"),
    )
    d2 = (F.col("rb") - F.col("rv")) * (F.col("rb") - F.col("rv"))
    n = F.count(F.lit(1))
    nd = n.cast("double")
    return joined.agg(
        n.alias("n_overlap"),
        F.round(n / (60 - n), 6).alias("jaccard_at_30"),
        F.round(
            F.when(
                n > 1,
                1.0
                - 6.0 * F.sum(d2) / (nd * (nd * nd - 1.0)),
            ),
            6,
        ).alias("spearman_rho"),
    )


def _p33_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import bm25_sql_ctes

    return f"""
    WITH {bm25_sql_ctes()},
    bt AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 30),
    br AS (SELECT doc_id,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
           FROM bt),
    vt AS (SELECT e.vec_id AS doc_id, {_SIM} AS sim FROM embeddings e
           ORDER BY sim DESC, e.vec_id LIMIT 30),
    vr AS (SELECT doc_id,
                  row_number() OVER (ORDER BY sim DESC, doc_id) AS rv
           FROM vt),
    j0 AS (SELECT br.doc_id, rb AS rb0, rv AS rv0
           FROM br JOIN vr USING (doc_id)),
    j AS (SELECT doc_id,
                 row_number() OVER (ORDER BY rb0, doc_id) AS rb,
                 row_number() OVER (ORDER BY rv0, doc_id) AS rv
          FROM j0)
    SELECT count(*) AS n_overlap,
           round(count(*) * 1.0 / (60 - count(*)), 6) AS jaccard_at_30,
           round(CASE WHEN count(*) > 1 THEN
             1.0 - 6.0 * sum((rb - rv) * (rb - rv))
                   / (CAST(count(*) AS DOUBLE)
                      * (CAST(count(*) AS DOUBLE)
                         * CAST(count(*) AS DOUBLE) - 1.0))
             END, 6) AS spearman_rho
    FROM j
    """


oracle("p33_arm_agreement", _p33_oracle())


# ---------------------------------------------------------------------------
# P34 (extension): MaxSim late-interaction retrieval (the ColBERT
# scoring rule): score(q, d) = Σ over unique query terms of the MAX
# cosine between the term vector and any passage-chunk vector of d —
# multi-vector retrieval re-expressed relationally. Chunk and term
# vectors are md5-derived unit vectors BOTH engines compute identically
# (the repo's engine-portable embedding surrogate), so the oracle
# replays scoring end to end. Shape at scale: the term table (a few
# rows) broadcasts into the chunk relation — corpus-side work is
# #chunks × #terms map-side rows into two keyed aggregations
# ((qid,term,doc) max then (qid,doc) decimal-exact sum); the corpus is
# never self-joined and never globally sorted (per-query top-k window
# over the doc-level relation only).
# ---------------------------------------------------------------------------
_P34_QUERIES = {
    1: "vector table scan",
    2: "stream window agg",
    3: "customer join merge",
}
_P34_DIM = 8
_P34_K = 5


def _p34_embed(col):
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.functions.vector import l2_normalize

    v = F.array(
        *[
            hash_fraction(F.concat(col, F.lit(f":{d}"))) - 0.5
            for d in range(_P34_DIM)
        ]
    )
    return l2_normalize(v)


@query("p34_maxsim_late_interaction")
def p34_maxsim_late_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import dot
    from mtg_vector_db_spark.operators.corpus import chunk_documents
    from mtg_vector_db_spark.session import widen

    (docs,) = tables(spark, sf_dir, "documents")
    # Lowercase BEFORE chunking: term vectors are lowercase, and the
    # oracle tokenizes lowercased text — raw-case chunks would hash to
    # different vectors (fuzz-parity finding: the all-lowercase driver
    # fixture masked this).
    lowered = widen(docs).withColumn("text", F.lower(F.col("text")))
    chunks = chunk_documents(lowered, size=16, stride=16).select(
        "doc_id", _p34_embed(F.col("chunk_text")).alias("cv")
    )
    qterms = spark.createDataFrame(
        [
            (qid, t)
            for qid, s in _P34_QUERIES.items()
            for t in dict.fromkeys(s.split())
        ],
        ["qid", "term"],
    )
    qvecs = qterms.select("qid", "term", _p34_embed(F.col("term")).alias("qv"))
    sims = chunks.crossJoin(F.broadcast(qvecs)).select(
        "qid",
        "term",
        "doc_id",
        F.round(dot(F.col("cv"), F.col("qv")), 6).alias("sim"),
    )
    mx = sims.groupBy("qid", "term", "doc_id").agg(F.max("sim").alias("mx"))
    sc = mx.groupBy("qid", "doc_id").agg(
        F.round(
            F.sum(F.round(F.col("mx"), 12).cast("decimal(28,12)")).cast(
                "double"
            ),
            6,
        ).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P34_K)
        .select("qid", "rank", "doc_id", "score")
        .orderBy("qid", "rank")
    )


def _p34_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import _TOKS_L

    def hf(e: str) -> str:
        return (
            "(list_sum(list_transform(range(1, 9),"
            " i -> (strpos('0123456789abcdef',"
            f" substring(md5({e}), i, 1)) - 1)"
            " * power(16, 8 - i))) / 4294967296.0)"
        )

    def emb(e: str) -> str:
        return (
            f"list_transform(range(0, {_P34_DIM}),"
            f" d -> {hf(f'{e} || chr(58) || CAST(d AS VARCHAR)')} - 0.5)"
        )

    terms = ", ".join(
        f"({qid}, '{t}')"
        for qid, s in _P34_QUERIES.items()
        for t in dict.fromkeys(s.split())
    )
    return f"""
    WITH tk AS (SELECT doc_id, {_TOKS_L} AS toks FROM documents),
    ch AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, k * 16 + 1, k * 16 + 16), ' ')
               AS chunk_text
      FROM (SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / 16.0) AS INT))) AS k
            FROM tk WHERE len(toks) > 0)
    ),
    cv0 AS (SELECT doc_id, {emb('chunk_text')} AS v FROM ch),
    cv AS (SELECT doc_id,
                  list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
                    AS cv
           FROM cv0),
    qt AS (SELECT * FROM (VALUES {terms}) AS q(qid, term)),
    qv0 AS (SELECT qid, term, {emb('term')} AS v FROM qt),
    qv AS (SELECT qid, term,
                  list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
                    AS qv
           FROM qv0),
    sims AS (
      SELECT qv.qid, qv.term, cv.doc_id,
             round(list_inner_product(cv.cv, qv.qv), 6) AS sim
      FROM cv CROSS JOIN qv
    ),
    mx AS (SELECT qid, term, doc_id, max(sim) AS mx FROM sims
           GROUP BY qid, term, doc_id),
    sc AS (SELECT qid, doc_id,
                  round(CAST(sum(CAST(round(mx, 12) AS DECIMAL(28,12)))
                        AS DOUBLE), 6) AS score
           FROM mx GROUP BY qid, doc_id),
    ranked AS (
      SELECT qid, doc_id, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id ASC) AS rank
      FROM sc
    )
    SELECT qid, rank, doc_id, score FROM ranked
    WHERE rank <= {_P34_K} ORDER BY qid, rank
    """


oracle("p34_maxsim_late_interaction", _p34_oracle())


# ---------------------------------------------------------------------------
# P35 (extension): hard-negative mining — for each seed vector, the
# top-k most-similar vectors with a DIFFERENT label (the retrieval /
# contrastive-training staple: the best negatives are the near-misses,
# not random draws). Shape: the seed set broadcasts (seeds ≪ corpus);
# similarity + the cross-label filter are one map stage over the
# corpus; the per-seed top-k is a window keyed on query_id over rows
# that survive — the corpus is never self-joined at large. Rank ties
# break on ROUNDED sim then doc_id (engine-tie discipline).
# ---------------------------------------------------------------------------
_P35_SEEDS = 8
_P35_K = 5


@query("p35_hard_negatives")
def p35_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import dot, l2_normalize

    (emb,) = tables(spark, sf_dir, "embeddings")
    nx = emb.select(
        "vec_id", "label", l2_normalize(F.col("embedding")).alias("nx")
    )
    seeds = nx.filter(F.col("vec_id") < _P35_SEEDS).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("nx").alias("qx"),
    )
    scored = (
        nx.join(F.broadcast(seeds), nx["label"] != seeds["query_label"])
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(dot(F.col("nx"), F.col("qx")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P35_K)
        .select(
            "query_id", "query_label", "rank", "neg_id", "neg_label", "sim"
        )
        .orderBy("query_id", "rank")
    )


oracle(
    "p35_hard_negatives",
    f"""
    WITH n AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(
                 CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))))
               AS nx
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS query_id, label AS query_label, nx AS qx
      FROM n WHERE vec_id < {_P35_SEEDS}
    ),
    scored AS (
      SELECT s.query_id, s.query_label, n.vec_id AS neg_id,
             n.label AS neg_label,
             round(list_inner_product(n.nx, s.qx), 6) AS sim
      FROM n JOIN seeds s ON n.label <> s.query_label
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neg_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, query_label, rank, neg_id, neg_label, sim
    FROM ranked WHERE rank <= {_P35_K} ORDER BY query_id, rank
    """,
)


# ---------------------------------------------------------------------------
# P36 (extension): one-scan nprobe sweep — recall@10 and candidate cost
# for nprobe = 1..5 from a SINGLE cell-scoring pass (p23's knob-sweep
# discipline applied to the ANN serving knob). Probe cells carry their
# rank, candidate sets are NESTED in that rank, so each sweep point is
# a rank filter + per-query top-k over the one scored candidate
# relation — the corpus is scanned once, not once per knob. The output
# is the recall-vs-cost curve an operator reads to pick nprobe.
# ---------------------------------------------------------------------------
_P36_K = 10
_P36_MAX_NPROBE = 5


@query("p36_nprobe_sweep")
def p36_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        ivf_assign,
        ivf_ranked_assign,
    )
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from mtg_vector_db_spark.session import pin

    # The exact top-k and the scored candidate pool are each consumed by
    # every nprobe branch below (8 hits + 8 ncand subtrees in ONE final
    # DAG); unpinned, Catalyst re-derives the scoring chain per branch
    # (the round-3 c18 recompute defect — only exchange subtrees get
    # reused). Pinning is semantics-neutral (eager localCheckpoint).
    exact = pin(
        knn_join(emb, queries_df, k=_P36_K, round_digits=R).select(
            "query_id", "vec_id", F.lit(1).alias("is_true")
        )
    )
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    assigned = ivf_assign(emb, seeds)
    probe = ivf_ranked_assign(
        queries_df.select(
            F.col("query_id").alias("vec_id"),
            F.col("query_vec").alias("embedding"),
        ),
        seeds,
        nprobe=_P36_MAX_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), "cell", "cell_rank")
    sim = F.round(
        cosine_similarity(F.col("embedding"), F.col("query_vec")), R
    )
    cand = pin(
        assigned.join(probe, "cell")
        .join(F.broadcast(queries_df), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cell_rank", sim.alias("sim"))
    )
    per_n = []
    for n in range(1, _P36_MAX_NPROBE + 1):
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("vec_id")
        )
        sub = cand.filter(F.col("cell_rank") <= n)
        hits = (
            sub.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _P36_K)
            .join(exact, ["query_id", "vec_id"], "left")
            .agg(
                F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias(
                    "n_hits"
                )
            )
        )
        ncand = sub.agg(F.count(F.lit(1)).alias("n_cand"))
        per_n.append(
            hits.crossJoin(F.broadcast(ncand)).select(
                F.lit(n).alias("nprobe"), "n_hits", "n_cand"
            )
        )
    out = per_n[0]
    for df in per_n[1:]:
        out = out.unionByName(df)
    n_q = 10  # vec_id < 10 — fixed probe set, same as p27
    return out.select(
        "nprobe",
        F.round(F.col("n_hits") / F.lit(float(n_q * _P36_K)), 6).alias(
            "avg_recall_at_10"
        ),
        F.round(F.col("n_cand") / F.lit(float(n_q)), 6).alias(
            "avg_candidates"
        ),
    ).orderBy("nprobe")


def _p36_oracle() -> str:
    branches = " UNION ALL ".join(
        f"""
      SELECT {n} AS nprobe,
        (SELECT count(*) FROM topk t JOIN exact x
          ON t.query_id = x.query_id AND t.doc_id = x.doc_id
          WHERE t.nprobe = {n}) AS n_hits,
        (SELECT count(*) FROM cand WHERE cell_rank <= {n}) AS n_cand
        """
        for n in range(1, _P36_MAX_NPROBE + 1)
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    exact AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv), {R}) DESC,
                 e.vec_id ASC) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= {_P36_K}
    ),
    c AS (
      SELECT CAST(vec_id AS INT) AS cell, CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < 8
    ),
    n AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(
                     CAST(embedding AS DOUBLE[]),
                     CAST(embedding AS DOUBLE[])))) AS nx
          FROM embeddings),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, cell FROM (
                   SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cell) AS rn
                   FROM d) WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, cell, rn AS cell_rank FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cell) AS rn
                FROM d WHERE vec_id < 10)
              WHERE rn <= {_P36_MAX_NPROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id, p.cell_rank,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), {R}) AS sim
      FROM assigned a
      JOIN probe p USING (cell)
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN q ON q.query_id = p.query_id
      WHERE a.vec_id <> p.query_id
    ),
    topk AS (
      SELECT nprobe, query_id, vec_id AS doc_id FROM (
        SELECT nr.n AS nprobe, cand.query_id, cand.vec_id,
               row_number() OVER (PARTITION BY nr.n, cand.query_id
                 ORDER BY cand.sim DESC, cand.vec_id ASC) AS rank
        FROM cand JOIN (SELECT unnest(range(1, {_P36_MAX_NPROBE + 1})) AS n)
                       nr ON cand.cell_rank <= nr.n
      ) WHERE rank <= {_P36_K}
    ),
    sweep AS ({branches})
    SELECT nprobe,
           round(n_hits / {float(10 * _P36_K)}, 6) AS avg_recall_at_10,
           round(n_cand / 10.0, 6) AS avg_candidates
    FROM sweep ORDER BY nprobe
    """


oracle("p36_nprobe_sweep", _p36_oracle())


# ---------------------------------------------------------------------------
# P37 (extension): multi-stage retrieval CASCADE — the production
# serving shape: a cheap wide recall stage (BM25 keyword top-100), a
# cheap vector re-rank over candidates only (packed sign-bit Hamming →
# top-20), then the expensive exact-cosine rescore on 20 rows. Each
# stage touches only the previous stage's survivors: the corpus is
# scanned once by BM25's posting filter, the Hamming stage joins the
# 100-row candidate table (broadcast) against embeddings, and exact
# math runs on 20 rows. Per-stage scores ride to the output so the
# cascade is auditable end to end.
# ---------------------------------------------------------------------------
_P37_S1 = 100
_P37_S2 = 20
_P37_K = 10


@query("p37_cascade_search")
def p37_cascade_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.quantize import (
        binary_signature,
        hamming_packed,
        signature_of,
    )
    from mtg_vector_db_spark.operators.text_search import bm25_topk
    from mtg_vector_db_spark.plans.text_queries import BM25_TERMS
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qv = query_vector(spark, sf_dir)
    s1 = bm25_topk(docs, BM25_TERMS, k=_P37_S1, round_digits=R)
    q_sig = F.array(*[F.lit(w).cast("long") for w in signature_of(qv)])
    s2 = (
        emb.join(
            F.broadcast(s1), emb["vec_id"] == s1["doc_id"]
        )
        .select(
            "doc_id",
            "bm25",
            "embedding",
            hamming_packed(
                binary_signature(F.col("embedding"), len(qv)), q_sig
            ).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("doc_id"))
        .limit(_P37_S2)
    )
    s3 = s2.select(
        "doc_id",
        "bm25",
        "hamming",
        F.round(cosine_similarity(F.col("embedding"), qv), R).alias("sim"),
    )
    w = Window.orderBy(F.desc("sim"), F.asc("doc_id"))
    return (
        s3.orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(_P37_K)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "bm25", "hamming", "sim")
        .orderBy("rank")
    )


def _p37_oracle() -> str:
    from mtg_vector_db_spark.plans.text_queries import bm25_sql_ctes

    return f"""
    WITH {bm25_sql_ctes()},
    s1 AS (SELECT doc_id, bm25 FROM bm
           ORDER BY bm25 DESC, doc_id LIMIT {_P37_S1}),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    s2 AS (
      SELECT s1.doc_id, s1.bm25,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0)
                    THEN 1 ELSE 0 END)) AS BIGINT) AS hamming,
             e.embedding
      FROM s1 JOIN embeddings e ON e.vec_id = s1.doc_id CROSS JOIN q
      ORDER BY hamming ASC, s1.doc_id ASC LIMIT {_P37_S2}
    ),
    s3 AS (
      SELECT doc_id, bm25, hamming,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   {_Q_SUB}), {R}) AS sim
      FROM s2
    )
    SELECT CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC)
                AS BIGINT) AS rank,
           doc_id, bm25, hamming, sim
    FROM (SELECT * FROM s3 ORDER BY sim DESC, doc_id ASC LIMIT {_P37_K})
    ORDER BY rank
    """


oracle("p37_cascade_search", _p37_oracle())


# ---------------------------------------------------------------------------
# P38 (extension): margin-based bitext mining (Artetxe & Schwenk 2019 —
# the CCMatrix/LASER scoring rule). Cross-language candidate pairs from
# the corpus-sized IVF soft-assignment blocking (cells ∝ n, same as
# d06/c23 — the FAISS role in the real pipelines); margin = cos / mean
# of the two sides' top-k candidate neighborhoods, so hubs (docs near
# everything) are demoted and only pairs much closer to each other than
# to background pass. Top-k sums ride DECIMAL(12,6) over pre-rounded
# sims — addition-order-independent, hence bit-identical to the SQL
# replay. Forward-best pair per source doc, margin ≥ 1.2.
# ---------------------------------------------------------------------------
_P38_SRC, _P38_TGT = "de", "en"
_P38_K, _P38_NPROBE, _P38_MARGIN = 4, 3, 1.2


@query("p38_bitext_margin_mining")
def p38_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.bitext import margin_bitext_pairs

    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    return margin_bitext_pairs(
        docs,
        emb,
        _P38_SRC,
        _P38_TGT,
        k=_P38_K,
        nprobe=_P38_NPROBE,
        min_margin=_P38_MARGIN,
    ).orderBy("src_id")


def _p38_oracle() -> str:
    return f"""
    WITH k AS (
      SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS INT)) AS n_cells
      FROM embeddings
    ),
    c AS (
      SELECT CAST(vec_id AS INT) AS cell, CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < (SELECT n_cells FROM k)
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
                   AS nx
          FROM e),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    a AS (SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cell) AS rn
            FROM d) WHERE rn <= {_P38_NPROBE}),
    src AS (SELECT a.vec_id AS src_id, a.cell
            FROM a JOIN documents dd ON dd.doc_id = a.vec_id
            WHERE dd.lang = '{_P38_SRC}'),
    tgt AS (SELECT a.vec_id AS tgt_id, a.cell
            FROM a JOIN documents dd ON dd.doc_id = a.vec_id
            WHERE dd.lang = '{_P38_TGT}'),
    cand AS (SELECT DISTINCT src_id, tgt_id
             FROM src JOIN tgt ON src.cell = tgt.cell),
    scored AS (
      SELECT * FROM (
        SELECT cand.src_id, cand.tgt_id,
               round(list_inner_product(na.nx, nb.nx), 6) AS sim
        FROM cand JOIN n na ON cand.src_id = na.vec_id
                  JOIN n nb ON cand.tgt_id = nb.vec_id
      ) WHERE sim > 0
    ),
    da AS (
      SELECT src_id,
             CAST(sum(CAST(sim AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS den_s
      FROM (SELECT src_id, sim,
                   row_number() OVER (PARTITION BY src_id
                                      ORDER BY sim DESC, tgt_id) AS rn
            FROM scored)
      WHERE rn <= {_P38_K} GROUP BY src_id
    ),
    db AS (
      SELECT tgt_id,
             CAST(sum(CAST(sim AS DECIMAL(12,6))) AS DOUBLE) / count(*) AS den_t
      FROM (SELECT tgt_id, sim,
                   row_number() OVER (PARTITION BY tgt_id
                                      ORDER BY sim DESC, src_id) AS rn
            FROM scored)
      WHERE rn <= {_P38_K} GROUP BY tgt_id
    ),
    m AS (
      SELECT s.src_id, s.tgt_id, s.sim,
             round(s.sim / ((da.den_s + db.den_t) / 2), 6) AS margin
      FROM scored s JOIN da ON s.src_id = da.src_id
                    JOIN db ON s.tgt_id = db.tgt_id
    )
    SELECT src_id, tgt_id, sim, margin
    FROM (SELECT src_id, tgt_id, sim, margin,
                 row_number() OVER (PARTITION BY src_id
                                    ORDER BY margin DESC, tgt_id) AS rn
          FROM m WHERE margin >= {_P38_MARGIN})
    WHERE rn = 1
    ORDER BY src_id
    """


oracle("p38_bitext_margin_mining", _p38_oracle())


# ---------------------------------------------------------------------------
# P39 (extension): pseudo-relevance-feedback query expansion (RM3) — the
# classic second search arm the reference's multi-strategy searcher
# (db/search_strategies.py:97-162) stops short of: run the seed BM25
# query, treat its top-10 as a relevance sample, extract expansion terms
# by relevance-model weight rm1(t) = Σ_{d∈F} tf(t,d)·bm25(d)/|d|, and
# rescore the corpus with the expanded weighted query (seeds at weight
# 1.0, expansions at 0.5·w/wmax — the RM3 interpolation).
#
# Everything stays IN-PLAN: the feedback set (10 rows), the expansion
# table (8 rows), and the weight max (1 row) are broadcast-sized
# relations flowing through joins — no driver collect anywhere, so the
# whole expansion re-plans per query on a cluster with zero round trips.
# Scale shape: both scoring passes filter postings map-side (literal IN
# for seeds; broadcast hash join for the data-derived expanded query)
# before any shuffle, so shuffled state ∝ matching postings, never the
# corpus. Cross-row score sums ride DECIMAL(28,12) over round-12
# components (the expanded query has ~11 terms — enough for float sum
# order to matter at round-6).
# ---------------------------------------------------------------------------
_P39_SEED = ("vector", "join", "spark")
_P39_FB_K = 10
_P39_EXP_K = 8


@query("p39_prf_query_expansion")
def p39_prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import tokens
    from mtg_vector_db_spark.operators.text_search import (
        bm25_scores,
        bm25_weighted_scores,
    )

    from mtg_vector_db_spark.session import pin

    (docs,) = tables(spark, sf_dir, "documents")
    # Tokenize the corpus ONCE (round 9, guide §2.4): the RM3 loop used
    # to tokenize three times — inside bm25_scores (seed pass), here for
    # the feedback-term extraction, and inside bm25_weighted_scores
    # (expanded rescore) — and each scoring pass also re-derived the
    # corpus stats from its own tokenization. One pinned (doc_id, toks)
    # relation now feeds all three consumers; same expression, pinned,
    # so every downstream number is unchanged (eager localCheckpoint,
    # recomputed from parquet per run).
    toks = pin(
        docs.select(
            "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
        )
    )
    fb = (
        bm25_scores(docs, _P39_SEED, round_digits=6, tok=toks)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_P39_FB_K)
    )
    fbt = toks.join(F.broadcast(fb), "doc_id").select(
        "doc_id",
        "bm25",
        F.size("toks").alias("doclen"),
        F.explode("toks").alias("term"),
    )
    tfb = (
        fbt.filter(
            (~F.col("term").isin(list(_P39_SEED)))
            & (F.length("term") >= 3)
        )
        .groupBy("term", "doc_id", "doclen", "bm25")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rm1 = tfb.groupBy("term").agg(
        F.round(
            F.sum(
                F.round(
                    F.col("tf") * F.col("bm25") / F.col("doclen"), 12
                ).cast("decimal(28,12)")
            ).cast("double"),
            6,
        ).alias("w")
    )
    exp = rm1.orderBy(F.desc("w"), F.asc("term")).limit(_P39_EXP_K)
    wm = exp.agg(F.max("w").alias("wmax"))
    expw = exp.crossJoin(F.broadcast(wm)).select(
        "term",
        F.round(F.lit(0.5) * F.col("w") / F.col("wmax"), 6).alias("tw"),
    )
    seeds = spark.createDataFrame(
        [(t, 1.0) for t in _P39_SEED], "term string, tw double"
    )
    qt = seeds.unionByName(expw)
    return (
        bm25_weighted_scores(docs, qt, round_digits=6, tok=toks)
        .orderBy(F.desc("score_prf"), F.asc("doc_id"))
        .limit(10)
    )


def _p39_oracle() -> str:
    toks = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
        " t -> len(t) > 0)"
    )
    seeds = ", ".join(f"'{t}'" for t in _P39_SEED)
    seed_rows = ", ".join(f"('{t}')" for t in _P39_SEED)
    sat = "(t.tf + 1.2e0 * (0.25e0 + 0.75e0 * t.doclen / s.avgdl))"
    idf = "ln((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0) + 1)"
    return f"""
    WITH tok AS (SELECT doc_id, {toks} AS toks FROM documents),
    st AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM tok),
    tfs AS (SELECT doc_id, doclen, term, count(*) AS tf
            FROM (SELECT doc_id, len(toks) AS doclen, unnest(toks) AS term
                  FROM tok)
            WHERE term IN ({seeds})
            GROUP BY 1, 2, 3),
    dfq AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
    bm AS (SELECT t.doc_id,
                  round(sum({idf} * t.tf * 2.2e0 / {sat}), 6) AS bm25
           FROM tfs t JOIN dfq d USING (term) CROSS JOIN st s
           GROUP BY t.doc_id),
    fb AS (SELECT doc_id, bm25 FROM bm
           ORDER BY bm25 DESC, doc_id LIMIT {_P39_FB_K}),
    fbt AS (SELECT f.doc_id, f.bm25, len(t.toks) AS doclen,
                   unnest(t.toks) AS term
            FROM fb f JOIN tok t USING (doc_id)),
    tfb AS (SELECT term, doc_id, doclen, bm25, count(*) AS tf
            FROM fbt
            WHERE term NOT IN ({seeds}) AND len(term) >= 3
            GROUP BY 1, 2, 3, 4),
    rm1 AS (SELECT term,
                   round(CAST(sum(CAST(round(tf * bm25 / doclen, 12)
                     AS DECIMAL(28,12))) AS DOUBLE), 6) AS w
            FROM tfb GROUP BY term),
    ex AS (SELECT term, w FROM rm1
           ORDER BY w DESC, term LIMIT {_P39_EXP_K}),
    wm AS (SELECT max(w) AS wmax FROM ex),
    qt AS (SELECT term, 1.0e0 AS tw
           FROM (VALUES {seed_rows}) s(term)
           UNION ALL
           SELECT term, round(0.5e0 * w / wmax, 6) AS tw
           FROM ex CROSS JOIN wm),
    tf2 AS (SELECT p.doc_id, p.doclen, p.term, q.tw, count(*) AS tf
            FROM (SELECT doc_id, len(toks) AS doclen, unnest(toks) AS term
                  FROM tok) p
            JOIN qt q USING (term)
            GROUP BY 1, 2, 3, 4),
    df2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
    sc AS (SELECT t.doc_id,
                  round(CAST(sum(CAST(round(
                    t.tw * {idf} * t.tf * 2.2e0 / {sat}, 12)
                    AS DECIMAL(28,12))) AS DOUBLE), 6) AS score_prf
           FROM tf2 t JOIN df2 d USING (term) CROSS JOIN st s
           GROUP BY t.doc_id)
    SELECT doc_id, score_prf FROM sc
    ORDER BY score_prf DESC, doc_id LIMIT 10
    """


oracle("p39_prf_query_expansion", _p39_oracle())


# ---------------------------------------------------------------------------
# P40 (extension): NN-Descent k-NN-graph construction audit — the
# graph-ANN family the reference's HNSW index belongs to
# (db/init.sql:50-53), as fixed-round keyed joins (Dong et al., WWW'11):
# divide-and-conquer init (two independent md5 bucketings — one
# partitioned blocking is provably 2-hop-closed, see operators/ann.py),
# then two rounds of undirected 2-hop candidate expansion → exact
# rescore → per-node top-k merge (monotone by construction: each round
# keeps the top-k of a superset). HNSW's sequential insert loop cannot
# distribute; NN-Descent's rounds are O(n·k²) shuffles and can. Output:
# per-round n_edges, mean neighbor similarity (DECIMAL-exact mean — can
# only rise), and recall@10 of the graph lists vs exact KNN over a
# 50-probe set. Graphs and the exact probe answer are persisted inside
# the query body — the p24 lesson: 2 report branches per graph would
# otherwise re-derive the whole chain (a plan property; the oracle
# replays the identical one-DAG form).
# ---------------------------------------------------------------------------
_P40_K = 24       # neighbor-list width — the dominant recall knob
_P40_EVAL_K = 10  # recall@10 ground-truth depth
_P40_ROUNDS = 3
_P40_PROBES = 50
_P40_BUCKETS = 16


@query("p40_nn_descent_graph")
def p40_nn_descent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import (
        nn_descent_init,
        nn_descent_round,
    )
    from mtg_vector_db_spark.operators.knn import knn_join

    from mtg_vector_db_spark.session import pin

    (emb,) = tables(spark, sf_dir, "embeddings")
    # Bounded count action: nb grows with the corpus so the init pair
    # volume stays linear (16 at every committed test scale — the
    # dynamic guard changes nothing below ~2k vectors).
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    probes = emb.filter(F.col("vec_id") < _P40_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # The exact-KNN audit is independent of the graph chain: submit its
    # pin from a driver thread so its job backfills executors while the
    # (inherently sequential) init/round pins run (§2.6 overlap of
    # independent jobs). Job description is thread-local; results are
    # the same pinned DataFrames either way.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        exact_fut = pool.submit(
            lambda: pin(
                knn_join(emb, probes, k=_P40_EVAL_K, round_digits=6).select(
                    F.col("query_id").alias("a"), F.col("vec_id").alias("b")
                )
            )
        )
        # pin, not persist (round-3 ADVICE): the round artifacts are
        # ContextCleaner-released when the query's refs drop, so graph
        # queries back-to-back don't grow the cached pool monotonically.
        graphs = [pin(nn_descent_init(emb, nb, _P40_K))]
        for _ in range(_P40_ROUNDS):
            graphs.append(
                pin(nn_descent_round(graphs[-1], emb, _P40_K))
            )
        exact = exact_fut.result()
    # Recall denominator from the ACTUAL probe count (round-3 ADVICE:
    # the _P40_PROBES*_P40_EVAL_K constant silently understated recall
    # on corpora with sparse or non-zero-based vec_ids).
    npb = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    rows = []
    for rnd, g in enumerate(graphs):
        stats = g.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.col("sim").cast("decimal(18,6)")).alias("ssim"),
        )
        hits = g.join(exact, ["a", "b"]).agg(
            F.count(F.lit(1)).alias("nhit")
        )
        rows.append(
            stats.crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(npb))
            .select(
                F.lit(rnd).alias("step"),
                "n_edges",
                F.round(
                    F.col("ssim").cast("double") / F.col("n_edges"), 6
                ).alias("mean_sim"),
                F.round(
                    F.col("nhit").cast("double")
                    / (F.col("n_probes") * F.lit(_P40_EVAL_K)).cast(
                        "double"
                    ),
                    6,
                ).alias("recall_at_10"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


def _p40_graph_ctes(
    k: int, nb: int, corpus_where: str = "TRUE", rounds: int = 2
) -> str:
    """Shared WITH-chain for the NN-Descent oracles: corpus CTE ``e``
    (optionally filtered — the append oracle holds out its batch), dual
    md5 bucket assignment ``asg``, init graph ``g0``, refinement rounds
    ``g1``/``g2``. Emitted MATERIALIZED (the v17 lesson: DuckDB inlines
    CTEs and chained rounds re-evaluate exponentially)."""
    from mtg_vector_db_spark.plans.corpus_queries import _hash_frac

    h1 = _hash_frac("CAST(vec_id AS VARCHAR)")
    h2 = _hash_frac("CAST(vec_id AS VARCHAR) || ':b2'")
    ctes = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE {corpus_where}),
    nbv AS (SELECT greatest({nb},
                   CAST(ceil(count(*) / 125.0) AS INT)) AS nb FROM e),
    asg AS (SELECT vec_id,
                   CAST(floor({h1} * nb) AS INT) AS cell
            FROM e CROSS JOIN nbv
            UNION ALL
            SELECT vec_id,
                   CAST(floor({h2} * nb) AS INT) + nb AS cell
            FROM e CROSS JOIN nbv),
    pr0 AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
            FROM asg x JOIN asg y USING (cell)
            WHERE x.vec_id <> y.vec_id),
    p0 AS (SELECT pr.a, pr.b,
                  round(list_cosine_similarity(ex.v, ey.v), 6) AS sim
           FROM pr0 pr
           JOIN e ex ON ex.vec_id = pr.a
           JOIN e ey ON ey.vec_id = pr.b),
    g0 AS (SELECT a, b, sim FROM (
             SELECT a, b, sim, row_number() OVER (PARTITION BY a
               ORDER BY sim DESC, b) AS rn FROM p0) WHERE rn <= {k})"""
    for r in range(1, rounds + 1):
        ctes += f""",
    u{r} AS (SELECT a, b FROM g{r - 1}
             UNION ALL SELECT b, a FROM g{r - 1}),
    cand{r} AS (SELECT DISTINCT a, b FROM (
                  SELECT q.a AS a, w.b AS b
                  FROM u{r} q JOIN u{r} w ON q.b = w.a
                  WHERE q.a <> w.b
                  UNION ALL SELECT a, b FROM g{r - 1})),
    p{r} AS (SELECT cd.a, cd.b,
                    round(list_cosine_similarity(ex.v, ey.v), 6) AS sim
             FROM cand{r} cd
             JOIN e ex ON ex.vec_id = cd.a
             JOIN e ey ON ey.vec_id = cd.b),
    g{r} AS (SELECT a, b, sim FROM (
               SELECT a, b, sim, row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC, b) AS rn FROM p{r}) WHERE rn <= {k})"""
    return ctes.replace(" AS (", " AS MATERIALIZED (")


def _p40_oracle() -> str:
    k, probes, ek = _P40_K, _P40_PROBES, _P40_EVAL_K
    ctes = _p40_graph_ctes(k, _P40_BUCKETS, rounds=_P40_ROUNDS)
    ctes += f""",
    xs AS MATERIALIZED (SELECT q.vec_id AS a, t.vec_id AS b,
                  round(list_cosine_similarity(q.v, t.v), 6) AS sim
           FROM e q JOIN e t ON q.vec_id <> t.vec_id
           WHERE q.vec_id < {probes}),
    exct AS MATERIALIZED (SELECT a, b FROM (
               SELECT a, b, row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC, b) AS rn FROM xs) WHERE rn <= {ek}),
    pcnt AS MATERIALIZED (SELECT count(*) AS n_probes FROM e
                          WHERE vec_id < {probes})"""
    selects = []
    for r in range(_P40_ROUNDS + 1):
        selects.append(f"""
    SELECT {r} AS step, s.n_edges,
           round(s.ssim / s.n_edges, 6) AS mean_sim,
           round(CAST(h.nhit AS DOUBLE)
                 / CAST(p.n_probes * {ek} AS DOUBLE), 6) AS recall_at_10
    FROM (SELECT count(*) AS n_edges,
                 CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS ssim
          FROM g{r}) s
    CROSS JOIN (SELECT count(*) AS nhit
                FROM g{r} JOIN exct USING (a, b)) h
    CROSS JOIN pcnt p""")
    return ctes + "\n" + "\n    UNION ALL\n".join(selects) + "\n    ORDER BY step"


oracle("p40_nn_descent_graph", _p40_oracle())


# ---------------------------------------------------------------------------
# P41 (extension): frozen-graph index APPEND — the maintenance face of
# p40 and the graph analog of p17's frozen-cell IVF assignment: a 10%
# md5-held-out batch of "new" vectors joins the corpus-built k-NN graph
# without any rebuild (HNSW's insert, minus the sequential lock).
# Candidates per new vector = dual-md5 bucket-mates ∪ their frozen
# neighbor lists (one graph hop), exact-rescored, top-k kept — work per
# arrival is corpus-size-independent once n_buckets ∝ n. Output: one
# summary row (n_new, n_edges, DECIMAL-exact mean list similarity,
# recall@10 of appended lists vs exact KNN into the corpus). The graph,
# appended lists, and exact answer persist inside the query body (the
# p24 lesson); the oracle replays build + append + audit end to end.
# ---------------------------------------------------------------------------
_P41_FRAC = 0.1
_P41_K = 10


@query("p41_graph_index_append")
def p41_graph_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import (
        nn_descent_append,
        nn_descent_init,
        nn_descent_round,
    )
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    newf = (
        hash_fraction(
            F.concat(F.col("vec_id").cast("string"), F.lit(":new"))
        )
        < _P41_FRAC
    )
    corpus = emb.filter(~newf)
    new = emb.filter(newf)

    # Same dynamic bucket count for build AND append — the appended
    # vectors must land in the buckets the graph was built with.
    nb = A.dynamic_bucket_count(corpus, min_buckets=_P40_BUCKETS)
    # pin, not persist — see p40 (round-3 ADVICE: cache release).
    from mtg_vector_db_spark.session import pin

    g = pin(nn_descent_init(corpus, nb, _P41_K))
    for _ in range(2):
        g = pin(nn_descent_round(g, corpus, _P41_K))
    app = pin(nn_descent_append(g, corpus, new, nb, _P41_K))

    # The recall AUDIT probes a FIXED 50-vector subset (lowest new ids,
    # TakeOrdered): exact KNN over every held-out vector is
    # O(n_new·n_corpus) — quadratic by construction since n_new ∝ n
    # (measured: the all-new audit went 44 s → 755 s over the 10× step,
    # exp 1.24, while the append itself is bucket-bounded). The audit
    # cost is now O(50·n) at any scale; appended lists and mean_sim
    # still cover ALL new vectors.
    probes = new.orderBy("vec_id").limit(_P40_PROBES)
    queries_df = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = pin(
        knn_join(corpus, queries_df, k=_P41_K, round_digits=6)
        .select(F.col("query_id").alias("a"), F.col("vec_id").alias("b"))
    )
    stats = app.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("sim").cast("decimal(18,6)")).alias("ssim"),
    )
    hits = app.join(exact, ["a", "b"]).agg(F.count(F.lit(1)).alias("nhit"))
    nnew = new.agg(F.count(F.lit(1)).alias("n_new"))
    npb = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    return (
        stats.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(nnew))
        .crossJoin(F.broadcast(npb))
        .select(
            "n_new",
            "n_probes",
            "n_edges",
            F.round(
                F.col("ssim").cast("double") / F.col("n_edges"), 6
            ).alias("mean_sim"),
            F.round(
                F.col("nhit").cast("double")
                / (F.col("n_probes") * F.lit(_P41_K)).cast("double"),
                6,
            ).alias("recall_at_10"),
        )
    )


def _p41_oracle() -> str:
    from mtg_vector_db_spark.plans.corpus_queries import _hash_frac

    k, nb, probes = _P41_K, _P40_BUCKETS, _P40_PROBES
    hn = _hash_frac("CAST(vec_id AS VARCHAR) || ':new'")
    h1 = _hash_frac("CAST(vec_id AS VARCHAR)")
    h2 = _hash_frac("CAST(vec_id AS VARCHAR) || ':b2'")
    chain = _p40_graph_ctes(k, nb, corpus_where=f"NOT ({hn} < {_P41_FRAC})")
    tail = f""",
    ne AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE {hn} < {_P41_FRAC}),
    nasg AS MATERIALIZED (
        SELECT vec_id, CAST(floor({h1} * nb) AS INT) AS cell
        FROM ne CROSS JOIN nbv
        UNION ALL
        SELECT vec_id, CAST(floor({h2} * nb) AS INT) + nb AS cell
        FROM ne CROSS JOIN nbv),
    mates AS MATERIALIZED (
        SELECT na.vec_id AS a, ca.vec_id AS b
        FROM nasg na JOIN asg ca USING (cell)),
    hop AS MATERIALIZED (
        SELECT m.a, g.b AS b FROM mates m
        JOIN g2 g ON g.a = m.b),
    canda AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT a, b FROM mates UNION ALL SELECT a, b FROM hop)
        WHERE a <> b),
    pa AS MATERIALIZED (
        SELECT cd.a, cd.b,
               round(list_cosine_similarity(ex.v, ey.v), 6) AS sim
        FROM canda cd
        JOIN ne ex ON ex.vec_id = cd.a
        JOIN e ey ON ey.vec_id = cd.b),
    ga AS MATERIALIZED (
        SELECT a, b, sim FROM (
          SELECT a, b, sim, row_number() OVER (PARTITION BY a
            ORDER BY sim DESC, b) AS rn FROM pa) WHERE rn <= {k}),
    nep AS MATERIALIZED (
        SELECT vec_id, v FROM ne ORDER BY vec_id LIMIT {probes}),
    xs2 AS MATERIALIZED (
        SELECT q.vec_id AS a, t.vec_id AS b,
               round(list_cosine_similarity(q.v, t.v), 6) AS sim
        FROM nep q JOIN e t ON q.vec_id <> t.vec_id),
    exct2 AS MATERIALIZED (
        SELECT a, b FROM (
          SELECT a, b, row_number() OVER (PARTITION BY a
            ORDER BY sim DESC, b) AS rn FROM xs2) WHERE rn <= {k})
    SELECT n.n_new, p.n_probes, s.n_edges,
           round(s.ssim / s.n_edges, 6) AS mean_sim,
           round(CAST(h.nhit AS DOUBLE)
                 / CAST(p.n_probes * {k} AS DOUBLE), 6) AS recall_at_10
    FROM (SELECT count(*) AS n_edges,
                 CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS ssim
          FROM ga) s
    CROSS JOIN (SELECT count(*) AS nhit
                FROM ga JOIN exct2 USING (a, b)) h
    CROSS JOIN (SELECT count(*) AS n_new FROM ne) n
    CROSS JOIN (SELECT count(*) AS n_probes FROM nep) p"""
    return chain + tail


oracle("p41_graph_index_append", _p41_oracle())


# ---------------------------------------------------------------------------
# P42 (extension): graph beam-search SERVING — the query-time walk that
# completes the HNSW analogy (round-3 VERDICT #4: the reference builds
# AND searches its indexes as graphs, db/init.sql:50-53 with an
# ef_search beam; p40/p41 built and appended, this serves). Build the
# shipped p40 graph (k=24 lists, 3 NN-Descent rounds), then answer the
# 50-probe set by fixed-round beam search: dual-md5 bucket seeds →
# ≤3 rounds of expand-one-hop / exact-rescore / re-beam (operators/
# ann.py:graph_beam_search_rounds). Output: per-round scored-candidate
# volume and recall@10 of the beam's top-10 vs exact KNN — `rounds` IS
# the ef-style recall knob, and this report is its measured curve. The
# oracle replays build + every beam round with MATERIALIZED CTEs (the
# v17 lesson).
# ---------------------------------------------------------------------------
_P42_BEAM = 24
_P42_ROUNDS = 3


@query("p42_graph_beam_search")
def p42_graph_beam_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import (
        graph_beam_search_rounds,
        nn_descent_init,
        nn_descent_round,
    )
    from mtg_vector_db_spark.operators.knn import knn_join
    from mtg_vector_db_spark.session import pin

    (emb,) = tables(spark, sf_dir, "embeddings")
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    g = pin(nn_descent_init(emb, nb, _P40_K))
    for _ in range(_P40_ROUNDS):
        g = pin(nn_descent_round(g, emb, _P40_K))

    probes = emb.filter(F.col("vec_id") < _P40_PROBES)
    rounds = graph_beam_search_rounds(
        g, emb, probes, n_buckets=nb, beam=_P42_BEAM, rounds=_P42_ROUNDS
    )
    exact = pin(
        knn_join(
            emb,
            probes.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=_P40_EVAL_K,
            round_digits=6,
        ).select(F.col("query_id").alias("a"), F.col("vec_id").alias("b"))
    )
    npb = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    from mtg_vector_db_spark.operators.ann import _graph_topk

    rows = []
    for step, s in enumerate(rounds):
        top = _graph_topk(
            s.withColumnRenamed("q", "a"), _P40_EVAL_K
        ).select("a", "b")
        hits = top.join(exact, ["a", "b"]).agg(
            F.count(F.lit(1)).alias("nhit")
        )
        vol = s.agg(F.count(F.lit(1)).alias("n_scored"))
        rows.append(
            vol.crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(npb))
            .select(
                F.lit(step).alias("step"),
                "n_scored",
                F.round(
                    F.col("nhit").cast("double")
                    / (F.col("n_probes") * F.lit(_P40_EVAL_K)).cast(
                        "double"
                    ),
                    6,
                ).alias("recall_at_10"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


def _p42_oracle() -> str:
    from mtg_vector_db_spark.plans.corpus_queries import _hash_frac

    k, nb, probes, ek = _P40_K, _P40_BUCKETS, _P40_PROBES, _P40_EVAL_K
    beam, rounds = _P42_BEAM, _P42_ROUNDS
    h1 = _hash_frac("CAST(vec_id AS VARCHAR)")
    h2 = _hash_frac("CAST(vec_id AS VARCHAR) || ':b2'")
    ctes = _p40_graph_ctes(k, nb, rounds=_P40_ROUNDS)
    last_g = f"g{_P40_ROUNDS}"
    ctes += f""",
    qv AS MATERIALIZED (SELECT vec_id, v FROM e WHERE vec_id < {probes}),
    qasg AS MATERIALIZED (
        SELECT vec_id, CAST(floor({h1} * nb) AS INT) AS cell
        FROM qv CROSS JOIN nbv
        UNION ALL
        SELECT vec_id, CAST(floor({h2} * nb) AS INT) + nb AS cell
        FROM qv CROSS JOIN nbv),
    seeds AS MATERIALIZED (
        SELECT DISTINCT qa.vec_id AS q, ca.vec_id AS b
        FROM qasg qa JOIN asg ca USING (cell)
        WHERE qa.vec_id <> ca.vec_id),
    s0 AS MATERIALIZED (
        SELECT sd.q, sd.b,
               round(list_cosine_similarity(eq.v, eb.v), 6) AS sim
        FROM seeds sd
        JOIN e eq ON eq.vec_id = sd.q
        JOIN e eb ON eb.vec_id = sd.b),
    und AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT a, b FROM {last_g}
          UNION ALL SELECT b, a FROM {last_g}))"""
    for r in range(1, rounds + 1):
        ctes += f""",
    bm{r} AS MATERIALIZED (
        SELECT q, b FROM (
          SELECT q, b, row_number() OVER (PARTITION BY q
            ORDER BY sim DESC, b) AS rn FROM s{r - 1}) WHERE rn <= {beam}),
    fr{r} AS MATERIALIZED (
        SELECT DISTINCT bm.q, u.b
        FROM bm{r} bm JOIN und u ON u.a = bm.b
        WHERE bm.q <> u.b),
    sf{r} AS MATERIALIZED (
        SELECT fr.q, fr.b,
               round(list_cosine_similarity(eq.v, eb.v), 6) AS sim
        FROM fr{r} fr
        JOIN e eq ON eq.vec_id = fr.q
        JOIN e eb ON eb.vec_id = fr.b),
    s{r} AS MATERIALIZED (
        SELECT DISTINCT q, b, sim FROM (
          SELECT q, b, sim FROM s{r - 1}
          UNION ALL SELECT q, b, sim FROM sf{r}))"""
    ctes += f""",
    xs AS MATERIALIZED (SELECT qq.vec_id AS a, t.vec_id AS b,
                  round(list_cosine_similarity(qq.v, t.v), 6) AS sim
           FROM qv qq JOIN e t ON qq.vec_id <> t.vec_id),
    exct AS MATERIALIZED (SELECT a, b FROM (
               SELECT a, b, row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC, b) AS rn FROM xs) WHERE rn <= {ek}),
    pcnt AS MATERIALIZED (SELECT count(*) AS n_probes FROM qv)"""
    selects = []
    for r in range(rounds + 1):
        selects.append(f"""
    SELECT {r} AS step, v.n_scored,
           round(CAST(h.nhit AS DOUBLE)
                 / CAST(p.n_probes * {ek} AS DOUBLE), 6) AS recall_at_10
    FROM (SELECT count(*) AS n_scored FROM s{r}) v
    CROSS JOIN (SELECT count(*) AS nhit FROM (
                  SELECT q AS a, b FROM (
                    SELECT q, b, row_number() OVER (PARTITION BY q
                      ORDER BY sim DESC, b) AS rn FROM s{r})
                  WHERE rn <= {ek}) t
                JOIN exct USING (a, b)) h
    CROSS JOIN pcnt p""")
    return ctes + "\n" + "\n    UNION ALL\n".join(selects) + "\n    ORDER BY step"


oracle("p42_graph_beam_search", _p42_oracle())


# ---------------------------------------------------------------------------
# P43 (extension): quantized-arm OVERSAMPLE sweep — the cost↔recall
# frontier of the two code-only scan arms (BQ sign bits, seeded PQ ADC)
# measured as ONE registered query (round-3 VERDICT #5: the quantized
# arms sat at 0.39-0.57 recall@10 because os=4 was the only benched
# point; the knob was always the fix). One corpus×probe pair pass
# computes exact sim + Hamming together; the PQ chain encodes once; the
# five oversample depths are then windows over the SAME ranked pairs —
# the p36 one-scan sweep discipline. Output: per (method, oversample)
# mean recall@10 and the exact-rescore scan fraction, so the operating
# point (os=32 ≈ 0.84 recall at 16% scanned, os=64 ≈ 0.97 at 32% — the
# signature/code stage reads nothing but 64-bit sigs / 8-byte codes) is
# re-verified by the driver every round. RECALL.md commits the table;
# tests pin the floors.
# ---------------------------------------------------------------------------
_P43_OS = (4, 8, 16, 32, 64)
_P43_K = 10


@query("p43_quantized_oversample_sweep")
def p43_quantized_oversample_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity,
        l2_normalize,
    )
    from mtg_vector_db_spark.operators.quantize import (
        pq_encode,
        seeded_pq_codebooks,
    )
    from mtg_vector_db_spark.session import pin

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # ONE pair pass: exact cosine AND sign-bit Hamming per (probe, doc).
    ham = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("query_vec"),
            lambda a, b: ((a > 0) != (b > 0)).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pr = pin(
        emb.join(F.broadcast(queries_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine_similarity(F.col("embedding"), F.col("query_vec")), R
            ).alias("sim"),
            ham.alias("hamming"),
        )
    )
    wx = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("doc_id"))
    wh = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("doc_id")
    )
    ranked = pin(
        pr.withColumn("xrank", F.row_number().over(wx)).withColumn(
            "hrank", F.row_number().over(wh)
        )
    )

    # PQ arm: seeded codebooks (the oracle-able freeze), encode once,
    # per-probe ADC via a relational distance table — codes join dtable
    # on (s, code), never a per-query plan.
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    cw = spark.createDataFrame(
        [
            (s, c, list(cbs[s][c]))
            for s in range(_PQ_M)
            for c in range(_PQ_CODES)
        ],
        "s int, code int, w array<double>",
    )
    enc = pq_encode(emb, cbs).select(
        "vec_id", F.posexplode("codes").alias("s", "code")
    )
    qslice = F.slice(
        l2_normalize(F.col("query_vec")), F.col("s") * _PQ_DSUB + 1, _PQ_DSUB
    )
    dt = (
        queries_df.crossJoin(F.broadcast(cw))
        .select(
            "query_id",
            "s",
            "code",
            F.aggregate(
                F.zip_with(
                    F.col("w"), qslice, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dv"),
        )
    )
    adc = (
        enc.join(F.broadcast(dt), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("doc_id"))
        .agg(F.round(F.sum("dv"), R).alias("adc_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("doc_id")
    )
    pq_ranked = pin(
        adc.withColumn("arank", F.row_number().over(wa)).join(
            ranked.select("query_id", "doc_id", "sim", "xrank"),
            ["query_id", "doc_id"],
        )
    )

    nq = queries_df.agg(F.count(F.lit(1)).alias("n_q"))
    nc = emb.agg(F.count(F.lit(1)).alias("n_corpus"))
    rows = []
    for method, src, rank_col in (
        ("bq", ranked, "hrank"),
        ("pq", pq_ranked, "arank"),
    ):
        for os_ in _P43_OS:
            cand = src.filter(F.col(rank_col) <= _P43_K * os_)
            wsel = Window.partitionBy("query_id").orderBy(
                F.desc("sim"), F.asc("doc_id")
            )
            hits = (
                cand.withColumn("rn", F.row_number().over(wsel))
                .filter((F.col("rn") <= _P43_K) & (F.col("xrank") <= _P43_K))
                .agg(F.count(F.lit(1)).alias("nhit"))
            )
            rows.append(
                hits.crossJoin(F.broadcast(nq))
                .crossJoin(F.broadcast(nc))
                .select(
                    F.lit(method).alias("method"),
                    F.lit(os_).alias("oversample"),
                    F.round(
                        F.col("nhit").cast("double")
                        / (F.col("n_q") * F.lit(_P43_K)).cast("double"),
                        6,
                    ).alias("mean_recall_at_10"),
                    F.round(
                        F.least(
                            F.lit(_P43_K * os_), F.col("n_corpus") - 1
                        ).cast("double")
                        / (F.col("n_corpus") - 1).cast("double"),
                        6,
                    ).alias("scan_fraction"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("method", "oversample")


def _p43_oracle() -> str:
    d, m, nc, k = _PQ_DSUB, _PQ_M, _PQ_CODES, _P43_K
    sql = f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, embedding AS raw
        FROM embeddings),
    n AS MATERIALIZED (
        SELECT vec_id, v,
               list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
                 AS nx
        FROM e),
    qs AS MATERIALIZED (
        SELECT n.vec_id AS query_id, n.v AS qv, n.nx AS nq, e.raw AS qraw
        FROM n JOIN e USING (vec_id) WHERE n.vec_id < 10),
    pr AS MATERIALIZED (
        SELECT q.query_id, e.vec_id AS doc_id,
               round(list_cosine_similarity(e.v, q.qv), {R}) AS sim,
               CAST(list_sum(list_transform(range(1, 65), i ->
                 CASE WHEN (e.raw[i] > 0) <> (q.qraw[i] > 0)
                      THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        FROM e CROSS JOIN qs q
        WHERE e.vec_id <> q.query_id),
    ranked AS MATERIALIZED (
        SELECT *,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, doc_id ASC) AS xrank,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY hamming ASC, doc_id ASC) AS hrank
        FROM pr),
    cw AS MATERIALIZED (
        SELECT t.s, n.vec_id AS code,
               n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS w
        FROM n, range(0, {m}) t(s) WHERE n.vec_id < {nc}),
    sub AS (SELECT n.vec_id, t.s,
                   n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS sv
            FROM n, range(0, {m}) t(s)),
    enc AS MATERIALIZED (
        SELECT vec_id, s, code FROM (
          SELECT sub.vec_id, sub.s, cw.code,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY round(list_inner_product(sub.sv, sub.sv)
                                  - 2 * list_inner_product(sub.sv, cw.w)
                                  + list_inner_product(cw.w, cw.w), 9),
                            cw.code) AS rn
          FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1),
    dt AS MATERIALIZED (
        SELECT query_id, s, code,
               list_inner_product(diff, diff) AS dv FROM (
          SELECT q.query_id, cw.s, cw.code,
                 list_transform(range(1, {d + 1}),
                   i -> cw.w[i] - q.nq[cw.s * {d} + i]) AS diff
          FROM cw CROSS JOIN qs q)),
    adc AS MATERIALIZED (
        SELECT dt.query_id, enc.vec_id AS doc_id,
               round(sum(dt.dv), {R}) AS adc_dist
        FROM enc JOIN dt ON enc.s = dt.s AND enc.code = dt.code
        WHERE enc.vec_id <> dt.query_id
        GROUP BY dt.query_id, enc.vec_id),
    pq_ranked AS MATERIALIZED (
        SELECT a.query_id, a.doc_id, r.sim, r.xrank,
               row_number() OVER (PARTITION BY a.query_id
                 ORDER BY a.adc_dist ASC, a.doc_id ASC) AS arank
        FROM adc a JOIN ranked r
          ON a.query_id = r.query_id AND a.doc_id = r.doc_id),
    nq AS (SELECT count(*) AS n_q FROM qs),
    ncrp AS (SELECT count(*) AS n_corpus FROM e)"""
    selects = []
    for method, rel, rank_col in (
        ("bq", "ranked", "hrank"),
        ("pq", "pq_ranked", "arank"),
    ):
        for os_ in _P43_OS:
            selects.append(f"""
    SELECT '{method}' AS method, {os_} AS oversample,
           round(CAST(h.nhit AS DOUBLE)
                 / CAST(nq.n_q * {k} AS DOUBLE), 6) AS mean_recall_at_10,
           round(CAST(least({k * os_}, ncrp.n_corpus - 1) AS DOUBLE)
                 / CAST(ncrp.n_corpus - 1 AS DOUBLE), 6) AS scan_fraction
    FROM (SELECT count(*) AS nhit FROM (
            SELECT query_id, doc_id, xrank,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, doc_id ASC) AS rn
            FROM {rel} WHERE {rank_col} <= {k * os_})
          WHERE rn <= {k} AND xrank <= {k}) h
    CROSS JOIN nq CROSS JOIN ncrp""")
    return (
        sql + "\n" + "\n    UNION ALL\n".join(selects)
        + "\n    ORDER BY method, oversample"
    )


oracle("p43_quantized_oversample_sweep", _p43_oracle())


# ---------------------------------------------------------------------------
# P44 (extension): graph serving FROM A STORED INDEX — the build-once /
# serve-many split the reference embodies (index built once at schema
# create, db/init.sql:50-53; walked per query with an ef_search beam,
# db/search_strategies.py:147-162). p42 measures the recall curve but
# re-derives the NN-Descent graph inside its own body every execution
# (round-4 VERDICT #1: the bench therefore tracked BUILD cost for the
# arm whose headline claim is SERVING latency). Here the p40 graph
# (k=24 lists, 3 rounds) is a content-addressed parquet artifact
# (operators/artifacts.py): built at most once per (corpus fingerprint,
# params), then every execution only seeds from dual-md5 buckets and
# walks ≤3 bounded hop-joins against the FROZEN lists — query-time work
# is O(|bucket| + rounds·beam·k) per probe, corpus-scan-free except the
# exact rescore. Output: the serving ANSWER itself (query_id,
# neighbor_id, sim, rank — top-10 per probe), not a recall report; the
# oracle replays build + walk end-to-end in MATERIALIZED CTEs, which is
# exactly why the stored lists must be (and are) bit-identical to a
# fresh build: deterministic md5 buckets, round(·,6) sims, id
# tie-breaks, and an exact double round-trip through parquet.
# ---------------------------------------------------------------------------
_P44_K = 10  # answers per query


_P44_HOPBUCKETS = 16  # adjacency partitions; scale ∝ n in production


def _stored_graph_path(spark: SparkSession, sf_dir: str, nb: int) -> str:
    """Build-if-missing path of the frozen p40 graph for this corpus.
    Key = corpus parquet fingerprint + build params + algo version; the
    artifact is the graph sibling of partitioning.partition_by_cell.

    v2 layout (round 5): the DISTINCT UNDIRECTED adjacency expansion,
    hive-partitioned by ``abucket = pmod(a, _P44_HOPBUCKETS)`` — the
    serving walk joins each hop on (abucket, a) with the beam side
    broadcast, so dynamic partition pruning confines every hop's graph
    read to the frontier's buckets (plan-asserted). Identical walk
    results: the v1 reader derived exactly this set with a
    reverse-union + distinct at query time."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key(
        "nn_descent_graph", "v2", _P40_K, _P40_ROUNDS, nb,
        _P44_HOPBUCKETS, fp,
    )
    path = os.path.join(artifact_root(), "graph_knn", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.operators.ann import (
            nn_descent_init,
            nn_descent_round,
        )
        from mtg_vector_db_spark.session import pin

        (emb,) = tables(spark, sf_dir, "embeddings")
        g = pin(nn_descent_init(emb, nb, _P40_K))
        for _ in range(_P40_ROUNDS):
            g = pin(nn_descent_round(g, emb, _P40_K))
        und = (
            g.select("a", "b")
            .union(g.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
            .withColumn("abucket", F.pmod(F.col("a"), F.lit(_P44_HOPBUCKETS)))
        )
        from mtg_vector_db_spark.operators.artifacts import (
            write_partitioned,
        )

        write_partitioned(und, tmp, "abucket")

    ensure_artifact(path, build)
    return path


@query("p44_graph_serve_stored")
def p44_graph_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import graph_beam_search

    (emb,) = tables(spark, sf_dir, "embeddings")
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    g = spark.read.parquet(_stored_graph_path(spark, sf_dir, nb))
    probes = emb.filter(F.col("vec_id") < _P40_PROBES)
    ans = graph_beam_search(
        g, emb, probes,
        k=_P44_K, n_buckets=nb, beam=_P42_BEAM, rounds=_P42_ROUNDS,
        pre_undirected=True, bucket_by=_P44_HOPBUCKETS,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("b"))
    return (
        ans.select(
            F.col("q").alias("query_id"),
            F.col("b").alias("neighbor_id"),
            "sim",
            F.row_number().over(w).alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def _p44_oracle() -> str:
    from mtg_vector_db_spark.plans.corpus_queries import _hash_frac

    k, nb, probes = _P40_K, _P40_BUCKETS, _P40_PROBES
    beam, rounds = _P42_BEAM, _P42_ROUNDS
    h1 = _hash_frac("CAST(vec_id AS VARCHAR)")
    h2 = _hash_frac("CAST(vec_id AS VARCHAR) || ':b2'")
    ctes = _p40_graph_ctes(k, nb, rounds=_P40_ROUNDS)
    last_g = f"g{_P40_ROUNDS}"
    ctes += f""",
    qv AS MATERIALIZED (SELECT vec_id, v FROM e WHERE vec_id < {probes}),
    qasg AS MATERIALIZED (
        SELECT vec_id, CAST(floor({h1} * nb) AS INT) AS cell
        FROM qv CROSS JOIN nbv
        UNION ALL
        SELECT vec_id, CAST(floor({h2} * nb) AS INT) + nb AS cell
        FROM qv CROSS JOIN nbv),
    seeds AS MATERIALIZED (
        SELECT DISTINCT qa.vec_id AS q, ca.vec_id AS b
        FROM qasg qa JOIN asg ca USING (cell)
        WHERE qa.vec_id <> ca.vec_id),
    s0 AS MATERIALIZED (
        SELECT sd.q, sd.b,
               round(list_cosine_similarity(eq.v, eb.v), 6) AS sim
        FROM seeds sd
        JOIN e eq ON eq.vec_id = sd.q
        JOIN e eb ON eb.vec_id = sd.b),
    und AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT a, b FROM {last_g}
          UNION ALL SELECT b, a FROM {last_g}))"""
    for r in range(1, rounds + 1):
        ctes += f""",
    bm{r} AS MATERIALIZED (
        SELECT q, b FROM (
          SELECT q, b, row_number() OVER (PARTITION BY q
            ORDER BY sim DESC, b) AS rn FROM s{r - 1}) WHERE rn <= {beam}),
    fr{r} AS MATERIALIZED (
        SELECT DISTINCT bm.q, u.b
        FROM bm{r} bm JOIN und u ON u.a = bm.b
        WHERE bm.q <> u.b),
    sf{r} AS MATERIALIZED (
        SELECT fr.q, fr.b,
               round(list_cosine_similarity(eq.v, eb.v), 6) AS sim
        FROM fr{r} fr
        JOIN e eq ON eq.vec_id = fr.q
        JOIN e eb ON eb.vec_id = fr.b),
    s{r} AS MATERIALIZED (
        SELECT DISTINCT q, b, sim FROM (
          SELECT q, b, sim FROM s{r - 1}
          UNION ALL SELECT q, b, sim FROM sf{r}))"""
    return ctes + f"""
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT q AS query_id, b AS neighbor_id, sim,
             row_number() OVER (PARTITION BY q
               ORDER BY sim DESC, b) AS rank
      FROM s{rounds})
    WHERE rank <= {_P44_K}
    ORDER BY query_id, rank"""


oracle("p44_graph_serve_stored", _p44_oracle())


# ---------------------------------------------------------------------------
# P45 (extension): IVF serving FROM THE STORED CELL LAYOUT — the second
# half of round-4 VERDICT #5: partition_by_cell's pruning behavior was
# plan-tested but no registered query actually READ a partitionBy(cell)
# layout, so the driver never saw the pruned-scan serving shape. The
# corpus is assigned to frozen dynamic seed cells (dynamic_seed_cells —
# cells ∝ n) and written hive-partitioned by cell as a content-addressed
# artifact (built at most once per corpus fingerprint). Serving: the 50
# probe vectors pick their nprobe=4 nearest cells (ivf_ranked_assign —
# map-side centroid-literal argmin), and the layout scan is pruned to
# exactly those cells by Spark DYNAMIC PARTITION PRUNING — the probe
# side is broadcast and the scan's PartitionFilters carries
# dynamicpruningexpression(cell IN ...), so only the probed cells'
# files are read (plan-asserted in tests/test_plans.py). No driver
# collect anywhere: the cell list never leaves the JVM. Output: the
# serving answer (query_id, neighbor_id, sim, rank — top-10 per probe);
# the oracle replays seed cells + assignment + probe + rescore (the p36
# machinery) with the dynamic cell count as a scalar subquery.
# ---------------------------------------------------------------------------
_P45_NPROBE = 4
_P45_K = 10


def _stored_ivf_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing path of the frozen cell-partitioned IVF layout:
    the layout IS the index (operators/ann.py:ivf_index_append)."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key("ivf_cell_layout", "v1", 250, 8, fp)
    path = os.path.join(artifact_root(), "ivf_cells", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.operators.ann import (
            dynamic_seed_cells,
            ivf_assign,
        )

        (emb,) = tables(spark, sf_dir, "embeddings")
        cents = dynamic_seed_cells(emb)
        from mtg_vector_db_spark.operators.artifacts import (
            write_partitioned,
        )

        write_partitioned(
            ivf_assign(emb, cents).select("vec_id", "embedding", "cell"),
            tmp,
            "cell",
        )

    ensure_artifact(path, build)
    return path


@query("p45_ivf_serve_stored")
def p45_ivf_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_ranked_assign,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    layout = spark.read.parquet(_stored_ivf_path(spark, sf_dir))
    cents = dynamic_seed_cells(emb)
    probes = emb.filter(F.col("vec_id") < _P40_PROBES)
    pcells = ivf_ranked_assign(probes, cents, nprobe=_P45_NPROBE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "cell",
    )
    # Probe side broadcast → DPP prunes the layout scan to probed cells.
    cand = (
        layout.join(F.broadcast(pcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("embedding"), F.col("query_vec")),
                R,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P45_K)
        .orderBy("query_id", "rank")
    )


def _p45_oracle() -> str:
    return f"""
    WITH kc AS (
      SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS INT)) AS k
      FROM embeddings
    ),
    c AS (
      SELECT CAST(vec_id AS INT) AS cell,
             CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < (SELECT k FROM kc)
    ),
    n AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(
                     CAST(embedding AS DOUBLE[]),
                     CAST(embedding AS DOUBLE[])))) AS nx
          FROM embeddings),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, cell FROM (
                   SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cell) AS rn
                   FROM d) WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cell) AS rn
                FROM d WHERE vec_id < {_P40_PROBES})
              WHERE rn <= {_P45_NPROBE}),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < {_P40_PROBES}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), {R}) AS sim
      FROM assigned a
      JOIN probe p USING (cell)
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN q ON q.query_id = p.query_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id) AS rank
      FROM cand)
    WHERE rank <= {_P45_K}
    ORDER BY query_id, rank
    """


oracle("p45_ivf_serve_stored", _p45_oracle())


# ---------------------------------------------------------------------------
# P46 (extension): QUANTIZED serving FROM STORED CODES — the third
# serving arm's build/serve split, completing the set (graph walk =
# p44, IVF pruned cells = p45, PQ code scan = this; reference analogy:
# index built once at schema create, /root/reference/db/init.sql:50-53,
# only walked per query, db/search_strategies.py:147-162). The
# O(n·m·n_codes) encode pass is the build: its output — 8 small ints
# per vector — is a content-addressed parquet artifact, and the
# serving scan reads NOTHING but those codes (the compressed-scan
# claim p43's frontier priced). Per execution: the 10 probes build an
# ADC distance table from the deterministic seeded codebooks (bounded
# driver fetch, p43's machinery), the code scan ranks candidates by
# summed table lookups, and only the top K*os = 320 per probe are
# exact-rescored against the raw embeddings (os=32 — the operating
# point RECALL.md commits: ~0.84 recall rescoring 16% of the corpus
# at sf0.1). Output: the serving answer (query_id, neighbor_id, sim,
# rank). The oracle replays codebooks + encode in CTEs (stored codes
# are bit-identical to a fresh encode — pq_encode's tie_digits argmin
# determinism, pinned by test_p46_stored_codes_equal_fresh_encode)
# and rescores the same top-320.
# ---------------------------------------------------------------------------
_P46_OS = 32
_P46_K = 10
_P46_PROBES = 10


def _stored_pq_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing path of the frozen PQ code table: the encode is
    the build-once pass; codebooks stay derivable (seeded — a pure
    function of the corpus) so only the O(n) scan payload is stored."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key("pq_codes", "v1", _PQ_M, _PQ_CODES, fp)
    path = os.path.join(artifact_root(), "pq_codes", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.operators.quantize import (
            pq_encode,
            seeded_pq_codebooks,
        )

        (emb,) = tables(spark, sf_dir, "embeddings")
        cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
        pq_encode(emb, cbs).select("vec_id", "codes").write.parquet(tmp)

    ensure_artifact(path, build)
    return path


@query("p46_pq_serve_stored")
def p46_pq_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity,
        l2_normalize,
    )
    from mtg_vector_db_spark.operators.quantize import seeded_pq_codebooks

    (emb,) = tables(spark, sf_dir, "embeddings")
    codes = spark.read.parquet(_stored_pq_path(spark, sf_dir))
    queries_df = emb.filter(F.col("vec_id") < _P46_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # Bounded driver fetch: m*n_codes codebook rows (allowlisted class).
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    cw = spark.createDataFrame(
        [
            (s, c, list(cbs[s][c]))
            for s in range(_PQ_M)
            for c in range(_PQ_CODES)
        ],
        "s int, code int, w array<double>",
    )
    qslice = F.slice(
        l2_normalize(F.col("query_vec")), F.col("s") * _PQ_DSUB + 1, _PQ_DSUB
    )
    dt = (
        queries_df.crossJoin(F.broadcast(cw))
        .select(
            "query_id",
            "s",
            "code",
            F.aggregate(
                F.zip_with(
                    F.col("w"), qslice, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dv"),
        )
    )
    # Serving scan: CODES ONLY (vec_id + 8 ints/row) joined to the
    # broadcast distance table — the raw embeddings are untouched until
    # the bounded rescore below.
    enc = codes.select("vec_id", F.posexplode("codes").alias("s", "code"))
    adc = (
        enc.join(F.broadcast(dt), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("doc_id"))
        .agg(F.round(F.sum("dv"), R).alias("adc_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("doc_id")
    )
    cand = (
        adc.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= _P46_K * _P46_OS)
        .select("query_id", "doc_id")
    )
    # Exact rescore of K*os candidates per probe: broadcast the bounded
    # candidate list into the embedding scan — shuffle-free.
    resc = emb.join(
        F.broadcast(cand.join(F.broadcast(queries_df), "query_id")),
        emb["vec_id"] == F.col("doc_id"),
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.round(
            cosine_similarity(F.col("embedding"), F.col("query_vec")), R
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        resc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P46_K)
        .orderBy("query_id", "rank")
    )


def _p46_oracle() -> str:
    d, m, nc = _PQ_DSUB, _PQ_M, _PQ_CODES
    k, os_, probes = _P46_K, _P46_OS, _P46_PROBES
    return f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS MATERIALIZED (
        SELECT vec_id, v,
               list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
                 AS nx
        FROM e),
    qs AS MATERIALIZED (
        SELECT vec_id AS query_id, v AS qv, nx AS nq
        FROM n WHERE vec_id < {probes}),
    cw AS MATERIALIZED (
        SELECT t.s, n.vec_id AS code,
               n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS w
        FROM n, range(0, {m}) t(s) WHERE n.vec_id < {nc}),
    sub AS (SELECT n.vec_id, t.s,
                   n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS sv
            FROM n, range(0, {m}) t(s)),
    enc AS MATERIALIZED (
        SELECT vec_id, s, code FROM (
          SELECT sub.vec_id, sub.s, cw.code,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY round(list_inner_product(sub.sv, sub.sv)
                                  - 2 * list_inner_product(sub.sv, cw.w)
                                  + list_inner_product(cw.w, cw.w), 9),
                            cw.code) AS rn
          FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1),
    dt AS MATERIALIZED (
        SELECT query_id, s, code,
               list_inner_product(diff, diff) AS dv FROM (
          SELECT q.query_id, cw.s, cw.code,
                 list_transform(range(1, {d + 1}),
                   i -> cw.w[i] - q.nq[cw.s * {d} + i]) AS diff
          FROM cw CROSS JOIN qs q)),
    adc AS MATERIALIZED (
        SELECT dt.query_id, enc.vec_id AS doc_id,
               round(sum(dt.dv), {R}) AS adc_dist
        FROM enc JOIN dt ON enc.s = dt.s AND enc.code = dt.code
        WHERE enc.vec_id <> dt.query_id
        GROUP BY dt.query_id, enc.vec_id),
    cand AS MATERIALIZED (
        SELECT query_id, doc_id FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_dist ASC, doc_id ASC) AS arank
          FROM adc) WHERE arank <= {k * os_}),
    resc AS (
        SELECT c.query_id, c.doc_id AS neighbor_id,
               round(list_cosine_similarity(e.v, q.qv), {R}) AS sim
        FROM cand c
        JOIN e ON e.vec_id = c.doc_id
        JOIN qs q ON q.query_id = c.query_id)
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM resc)
    WHERE rank <= {k}
    ORDER BY query_id, rank"""


oracle("p46_pq_serve_stored", _p46_oracle())


# ---------------------------------------------------------------------------
# P47 (extension): IVF-PQ serving FROM THE STORED LAYOUT — the combined
# production ANN shape (FAISS IVFPQ): ONE artifact holds the PQ codes
# hive-partitioned by IVF cell, so a query (a) probes nprobe cells
# map-side (p45's centroid-literal argmin), (b) scans ONLY those cells'
# CODE rows under dynamic partition pruning — per-query bytes read =
# (nprobe/cells) × 9 small ints per vector, the 100 TB serving claim in
# one number — (c) ranks candidates by broadcast-ADC lookups, and
# (d) exact-rescores the bounded top K·os. p45 proves the pruning arm,
# p46 the code-scan arm; this is their composition, which is what a
# real deployment runs. Oracle: p45's assignment/probe CTEs feeding
# p46's codebook/encode/ADC chain, restricted to probed cells, then
# the rescore — all replayable because both halves are deterministic.
# ---------------------------------------------------------------------------
_P47_NPROBE = 4
_P47_OS = 32
_P47_K = 10
_P47_PROBES = 10


def _stored_ivfpq_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing path of the frozen IVF-PQ layout: PQ codes
    partitioned by their vector's IVF cell (codes + cell assignment are
    both pure deterministic functions of the corpus)."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key(
        "ivfpq_layout", "v1", 250, 8, _PQ_M, _PQ_CODES, fp
    )
    path = os.path.join(artifact_root(), "ivfpq_layout", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.operators.ann import (
            dynamic_seed_cells,
            ivf_assign,
        )
        from mtg_vector_db_spark.operators.quantize import (
            pq_encode,
            seeded_pq_codebooks,
        )

        (emb,) = tables(spark, sf_dir, "embeddings")
        cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
        coded = pq_encode(emb, cbs).select("vec_id", "codes")
        cells = ivf_assign(emb, dynamic_seed_cells(emb)).select(
            "vec_id", "cell"
        )
        from mtg_vector_db_spark.operators.artifacts import (
            write_partitioned,
        )

        write_partitioned(coded.join(cells, "vec_id"), tmp, "cell")

    ensure_artifact(path, build)
    return path


@query("p47_ivfpq_serve_stored")
def p47_ivfpq_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity,
        l2_normalize,
    )
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_ranked_assign,
    )
    from mtg_vector_db_spark.operators.quantize import seeded_pq_codebooks

    (emb,) = tables(spark, sf_dir, "embeddings")
    layout = spark.read.parquet(_stored_ivfpq_path(spark, sf_dir))
    probes = emb.filter(F.col("vec_id") < _P47_PROBES)
    cents = dynamic_seed_cells(emb)
    pcells = ivf_ranked_assign(probes, cents, nprobe=_P47_NPROBE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "cell",
    )
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    cw = spark.createDataFrame(
        [
            (s, c, list(cbs[s][c]))
            for s in range(_PQ_M)
            for c in range(_PQ_CODES)
        ],
        "s int, code int, w array<double>",
    )
    qslice = F.slice(
        l2_normalize(F.col("query_vec")), F.col("s") * _PQ_DSUB + 1, _PQ_DSUB
    )
    dt = (
        pcells.select("query_id", "query_vec").distinct()
        .crossJoin(F.broadcast(cw))
        .select(
            "query_id",
            "s",
            "code",
            F.aggregate(
                F.zip_with(
                    F.col("w"), qslice, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dv"),
        )
    )
    # (b) probe side broadcast -> DPP prunes the CODE scan to probed
    # cells; only those cells' 9-int rows are ever read.
    cand_codes = (
        layout.join(F.broadcast(pcells.select("query_id", "cell")), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.posexplode("codes").alias("s", "code"))
    )
    adc = (
        cand_codes.join(F.broadcast(dt), ["query_id", "s", "code"])
        .groupBy("query_id", F.col("vec_id").alias("doc_id"))
        .agg(F.round(F.sum("dv"), R).alias("adc_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("doc_id")
    )
    cand = (
        adc.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= _P47_K * _P47_OS)
        .select("query_id", "doc_id")
    )
    qv = pcells.select("query_id", "query_vec").distinct()
    resc = emb.join(
        F.broadcast(cand.join(F.broadcast(qv), "query_id")),
        emb["vec_id"] == F.col("doc_id"),
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.round(
            cosine_similarity(F.col("embedding"), F.col("query_vec")), R
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        resc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P47_K)
        .orderBy("query_id", "rank")
    )


def _p47_oracle() -> str:
    d, m, nc = _PQ_DSUB, _PQ_M, _PQ_CODES
    k, os_, probes, nprobe = _P47_K, _P47_OS, _P47_PROBES, _P47_NPROBE
    return f"""
    WITH kc AS (
      SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS INT)) AS k
      FROM embeddings),
    e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS MATERIALIZED (
        SELECT vec_id, v,
               list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
                 AS nx
        FROM e),
    c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec,
                 list_inner_product(v, v) AS n2
          FROM e WHERE vec_id < (SELECT k FROM kc)),
    dmat AS (SELECT n.vec_id, c.cell,
                    c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
             FROM n CROSS JOIN c),
    assigned AS MATERIALIZED (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cell) AS rn
          FROM dmat) WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cell) AS rn
                FROM dmat WHERE vec_id < {probes})
              WHERE rn <= {nprobe}),
    qs AS MATERIALIZED (
        SELECT vec_id AS query_id, v AS qv, nx AS nq
        FROM n WHERE vec_id < {probes}),
    cw AS MATERIALIZED (
        SELECT t.s, n.vec_id AS code,
               n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS w
        FROM n, range(0, {m}) t(s) WHERE n.vec_id < {nc}),
    sub AS (SELECT n.vec_id, t.s,
                   n.nx[t.s * {d} + 1 : t.s * {d} + {d}] AS sv
            FROM n, range(0, {m}) t(s)),
    enc AS MATERIALIZED (
        SELECT vec_id, s, code FROM (
          SELECT sub.vec_id, sub.s, cw.code,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY round(list_inner_product(sub.sv, sub.sv)
                                  - 2 * list_inner_product(sub.sv, cw.w)
                                  + list_inner_product(cw.w, cw.w), 9),
                            cw.code) AS rn
          FROM sub JOIN cw ON sub.s = cw.s) WHERE rn = 1),
    dt AS MATERIALIZED (
        SELECT query_id, s, code,
               list_inner_product(diff, diff) AS dv FROM (
          SELECT q.query_id, cw.s, cw.code,
                 list_transform(range(1, {d + 1}),
                   i -> cw.w[i] - q.nq[cw.s * {d} + i]) AS diff
          FROM cw CROSS JOIN qs q)),
    cand0 AS MATERIALIZED (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM assigned a JOIN probe p USING (cell)
        WHERE a.vec_id <> p.query_id),
    adc AS MATERIALIZED (
        SELECT c0.query_id, enc.vec_id AS doc_id,
               round(sum(dt.dv), {R}) AS adc_dist
        FROM cand0 c0
        JOIN enc ON enc.vec_id = c0.vec_id
        JOIN dt ON dt.query_id = c0.query_id
               AND dt.s = enc.s AND dt.code = enc.code
        GROUP BY c0.query_id, enc.vec_id),
    cand AS MATERIALIZED (
        SELECT query_id, doc_id FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_dist ASC, doc_id ASC) AS arank
          FROM adc) WHERE arank <= {k * os_}),
    resc AS (
        SELECT c.query_id, c.doc_id AS neighbor_id,
               round(list_cosine_similarity(e.v, q.qv), {R}) AS sim
        FROM cand c
        JOIN e ON e.vec_id = c.doc_id
        JOIN qs q ON q.query_id = c.query_id)
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM resc)
    WHERE rank <= {k}
    ORDER BY query_id, rank"""


oracle("p47_ivfpq_serve_stored", _p47_oracle())


# ---------------------------------------------------------------------------
# P48: APPENDED-GRAPH REFRESH — the graph twin of an IVF refit (round-5
# VERDICT #5). The append face (p41) gives each arriving vector a
# good-enough list against the frozen graph; this query runs the
# periodic batch job that closes the gap: one bounded NN-Descent round
# SEEDED FROM the appended nodes' current lists
# (operators/ann.py:nn_descent_refresh_appended — candidates = current
# list ∪ 2-hop through the undirected combined graph, corpus targets,
# exact rescore, monotone top-k). Work is O(|appended|·k²): frozen
# corpus lists pass through untouched, so the job costs by the append
# backlog, not the corpus — exactly the serve-vs-refit split the
# reference implies but never ships (its HNSW has no refit path at all;
# init.sql:50-53 builds once and per-row inserts forever). Config is
# the SHIPPED serving graph (k=24 lists, 3 rounds — the p44 artifact's
# build), where measured recall@10 of appended lists goes 0.946 → 0.992
# at sf0.1 (RECALL.md; the k=10 demo substrate saturates at 0.71 —
# refresh quality is bounded by substrate graph quality, which is why
# the job targets the serving graph). Output: one row per stage
# (appended / refreshed) with edge count, DECIMAL-exact mean list
# similarity, and recall@10 of the lists' top-10 vs exact KNN over the
# fixed 50-probe subset — the lift is machine-checked by the oracle,
# and the ≥0.85 floor + monotonicity are test-pinned.
# ---------------------------------------------------------------------------
_P48_FRAC = 0.1


@query("p48_graph_refresh_appended")
def p48_graph_refresh_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import (
        _graph_topk,
        nn_descent_append,
        nn_descent_init,
        nn_descent_refresh_appended,
        nn_descent_round,
    )
    from mtg_vector_db_spark.operators.knn import knn_join
    from mtg_vector_db_spark.session import pin

    (emb,) = tables(spark, sf_dir, "embeddings")
    newf = (
        hash_fraction(
            F.concat(F.col("vec_id").cast("string"), F.lit(":new"))
        )
        < _P48_FRAC
    )
    corpus = emb.filter(~newf)
    new = emb.filter(newf)
    nb = A.dynamic_bucket_count(corpus, min_buckets=_P40_BUCKETS)

    g = pin(nn_descent_init(corpus, nb, _P40_K))
    for _ in range(_P40_ROUNDS):
        g = pin(nn_descent_round(g, corpus, _P40_K))
    app = pin(nn_descent_append(g, corpus, new, nb, _P40_K))
    refreshed = nn_descent_refresh_appended(
        g.unionByName(app), corpus, new, k=_P40_K, rounds=1
    )
    rapp = pin(
        refreshed.join(
            new.select(F.col("vec_id").alias("a")), "a", "left_semi"
        )
    )

    # Fixed 50-probe exact audit (the p41 discipline: exact KNN over ALL
    # held-out vectors is O(n_new·n_corpus) — quadratic since n_new ∝ n).
    probes = new.orderBy("vec_id").limit(_P40_PROBES)
    qdf = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = pin(
        knn_join(corpus, qdf, k=_P40_EVAL_K, round_digits=6)
        .select(F.col("query_id").alias("a"), F.col("vec_id").alias("b"))
    )
    npb = probes.agg(F.count(F.lit(1)).alias("n_probes"))

    def stage_row(lists: DataFrame, stage: str) -> DataFrame:
        stats = lists.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.col("sim").cast("decimal(18,6)")).alias("ssim"),
        )
        hits = (
            _graph_topk(lists, _P40_EVAL_K)
            .join(exact, ["a", "b"])
            .agg(F.count(F.lit(1)).alias("nhit"))
        )
        return (
            stats.crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(npb))
            .select(
                F.lit(stage).alias("stage"),
                "n_edges",
                F.round(
                    F.col("ssim").cast("double") / F.col("n_edges"), 6
                ).alias("mean_sim"),
                F.round(
                    F.col("nhit").cast("double")
                    / (
                        F.col("n_probes") * F.lit(_P40_EVAL_K)
                    ).cast("double"),
                    6,
                ).alias("recall_at_10"),
            )
        )

    return (
        stage_row(app, "appended")
        .unionByName(stage_row(rapp, "refreshed"))
        .orderBy("stage")
    )


def _p48_oracle() -> str:
    from mtg_vector_db_spark.plans.corpus_queries import _hash_frac

    k, ek, nb, probes = _P40_K, _P40_EVAL_K, _P40_BUCKETS, _P40_PROBES
    hn = _hash_frac("CAST(vec_id AS VARCHAR) || ':new'")
    h1 = _hash_frac("CAST(vec_id AS VARCHAR)")
    h2 = _hash_frac("CAST(vec_id AS VARCHAR) || ':b2'")
    chain = _p40_graph_ctes(
        k, nb, corpus_where=f"NOT ({hn} < {_P48_FRAC})", rounds=_P40_ROUNDS
    )
    last_g = f"g{_P40_ROUNDS}"
    tail = f""",
    ne AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE {hn} < {_P48_FRAC}),
    nasg AS MATERIALIZED (
        SELECT vec_id, CAST(floor({h1} * nb) AS INT) AS cell
        FROM ne CROSS JOIN nbv
        UNION ALL
        SELECT vec_id, CAST(floor({h2} * nb) AS INT) + nb AS cell
        FROM ne CROSS JOIN nbv),
    mates AS MATERIALIZED (
        SELECT na.vec_id AS a, ca.vec_id AS b
        FROM nasg na JOIN asg ca USING (cell)),
    hop AS MATERIALIZED (
        SELECT m.a, g.b AS b FROM mates m
        JOIN {last_g} g ON g.a = m.b),
    canda AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT a, b FROM mates UNION ALL SELECT a, b FROM hop)
        WHERE a <> b),
    pa AS MATERIALIZED (
        SELECT cd.a, cd.b,
               round(list_cosine_similarity(ex.v, ey.v), 6) AS sim
        FROM canda cd
        JOIN ne ex ON ex.vec_id = cd.a
        JOIN e ey ON ey.vec_id = cd.b),
    ga AS MATERIALIZED (
        SELECT a, b, sim FROM (
          SELECT a, b, sim, row_number() OVER (PARTITION BY a
            ORDER BY sim DESC, b) AS rn FROM pa) WHERE rn <= {k}),
    fullg AS MATERIALIZED (
        SELECT a, b FROM {last_g} UNION ALL SELECT a, b FROM ga),
    ur AS MATERIALIZED (
        SELECT a, b FROM fullg UNION ALL SELECT b, a FROM fullg),
    candr AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT x.a, y.b FROM ga x JOIN ur y ON x.b = y.a
          UNION ALL SELECT a, b FROM ga)
        WHERE a <> b AND b IN (SELECT vec_id FROM e)),
    pr AS MATERIALIZED (
        SELECT cd.a, cd.b,
               round(list_cosine_similarity(ex.v, ey.v), 6) AS sim
        FROM candr cd
        JOIN ne ex ON ex.vec_id = cd.a
        JOIN e ey ON ey.vec_id = cd.b),
    gr AS MATERIALIZED (
        SELECT a, b, sim FROM (
          SELECT a, b, sim, row_number() OVER (PARTITION BY a
            ORDER BY sim DESC, b) AS rn FROM pr) WHERE rn <= {k}),
    nep AS MATERIALIZED (
        SELECT vec_id, v FROM ne ORDER BY vec_id LIMIT {probes}),
    xs2 AS MATERIALIZED (
        SELECT q.vec_id AS a, t.vec_id AS b,
               round(list_cosine_similarity(q.v, t.v), 6) AS sim
        FROM nep q JOIN e t ON q.vec_id <> t.vec_id),
    exct2 AS MATERIALIZED (
        SELECT a, b FROM (
          SELECT a, b, row_number() OVER (PARTITION BY a
            ORDER BY sim DESC, b) AS rn FROM xs2) WHERE rn <= {ek}),
    npb AS MATERIALIZED (SELECT count(*) AS n_probes FROM nep)"""
    selects = []
    for stage, rel in (("appended", "ga"), ("refreshed", "gr")):
        selects.append(f"""
    SELECT '{stage}' AS stage, s.n_edges,
           round(s.ssim / s.n_edges, 6) AS mean_sim,
           round(CAST(h.nhit AS DOUBLE)
                 / CAST(p.n_probes * {ek} AS DOUBLE), 6) AS recall_at_10
    FROM (SELECT count(*) AS n_edges,
                 CAST(sum(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS ssim
          FROM {rel}) s
    CROSS JOIN (SELECT count(*) AS nhit FROM (
                  SELECT a, b FROM (
                    SELECT a, b, row_number() OVER (PARTITION BY a
                      ORDER BY sim DESC, b) AS rn FROM {rel})
                  WHERE rn <= {ek}) t10
                JOIN exct2 USING (a, b)) h
    CROSS JOIN npb p""")
    return (
        chain + tail + "\n" + "\n    UNION ALL\n".join(selects)
        + "\n    ORDER BY stage"
    )


oracle("p48_graph_refresh_appended", _p48_oracle())


# ---------------------------------------------------------------------------
# P49: TWO-LEVEL COARSE ASSIGNMENT — the extreme-cardinality quantizer
# (round-6 extension past the broadcast fold): level-1 codebook = the
# ⌈√k⌉ lowest-id cells (deterministic, SQL-replayable), every centroid
# assigned to its nearest super-cell once, vectors score O(√k) supers
# map-side then only the chosen super's member list (delivered by a
# BroadcastHashJoin on super_cell — the centroid table reaches tasks
# sharded one row per super-cell, so no single broadcast row grows with
# total cell count; the bound SCALE.md's centroid-cardinality table
# leaves open at ~4M cells is closed by construction). Output: one row
# per super-cell with member count, assigned-vector count, and the
# AGREEMENT count vs flat argmin assignment — the two-level recipe is
# an approximation and its quality is the query's own measured output,
# replayed end-to-end by the oracle (both levels + the flat argmin).
# ---------------------------------------------------------------------------
# Committed two-level operating point (round-6 VERDICT #2): measured by
# p52's one-scan sweep — at sf0.1, serving recall behind two-level
# assignment is 0.86/0.90/0.92/0.95 at probes 1/2/4/8 (8 = flat). Probe
# 4 is the committed point: ≥0.9 serving recall, within 0.03 of flat,
# at O(4·√k) map-side scoring instead of O(k). RECALL.md "Two-level
# arm"; floor pinned in test_p52_two_level_operating_points.
_P49_PROBE = 4


@query("p49_two_level_assign")
def p49_two_level_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_assign,
        two_level_assign,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    cents = dynamic_seed_cells(emb)
    two = two_level_assign(
        emb, cents, n_probe_super=_P49_PROBE
    ).select("vec_id", "super_cell", "cell")
    flat = ivf_assign(emb, cents).select(
        "vec_id", F.col("cell").alias("flat_cell")
    )
    both = two.join(flat, "vec_id")
    # Distinct member cells actually CHOSEN per super (null cells — a
    # vector whose nearest super attracted no members — excluded, the
    # COUNT(DISTINCT) null semantics the oracle uses).
    mem = (
        two.filter(F.col("cell").isNotNull())
        .select("super_cell", "cell")
        .distinct()
        .groupBy("super_cell")
        .agg(F.count(F.lit(1)).alias("n_member_cells_used"))
    )
    return (
        both.groupBy("super_cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                F.when(F.col("cell") == F.col("flat_cell"), 1).otherwise(0)
            ).alias("n_agree"),
        )
        .join(mem, "super_cell", "left")
        .select(
            "super_cell",
            "n_vectors",
            "n_agree",
            F.coalesce("n_member_cells_used", F.lit(0)).alias(
                "n_member_cells_used"
            ),
        )
        .orderBy("super_cell")
    )


def _p49_oracle() -> str:
    probe = _P49_PROBE
    return f"""
    WITH c AS MATERIALIZED (
      SELECT CAST(vec_id AS INT) AS cell,
             CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings
      WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS INT))
                      FROM embeddings)
    ),
    sups AS MATERIALIZED (
      SELECT cell AS super_cell, cvec AS svec, n2 AS sn2 FROM (
        SELECT c.*, row_number() OVER (ORDER BY cell) AS rn FROM c)
      WHERE rn <= (SELECT CAST(ceil(sqrt(count(*))) AS INT) FROM c)
    ),
    casg AS MATERIALIZED (
      SELECT cell, cvec, n2, super_cell FROM (
        SELECT c.cell, c.cvec, c.n2, s.super_cell,
               row_number() OVER (PARTITION BY c.cell
                 ORDER BY s.sn2 - 2 * list_inner_product(s.svec,
                   list_transform(c.cvec,
                     x -> x / sqrt(list_inner_product(c.cvec, c.cvec)))),
                 s.super_cell) AS rn
        FROM c CROSS JOIN sups s) WHERE rn = 1
    ),
    n AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(
                 CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[])))) AS nx
      FROM embeddings
    ),
    vsup AS MATERIALIZED (
      SELECT vec_id, nx, super_cell FROM (
        SELECT n.vec_id, n.nx, s.super_cell,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY s.sn2 - 2 * list_inner_product(s.svec, n.nx),
                 s.super_cell) AS rn
        FROM n CROSS JOIN sups s) WHERE rn <= {probe}
    ),
    two AS MATERIALIZED (
      -- Multi-probe: min (dist, cell, super) over the probed supers'
      -- member shards; a memberless probed super contributes a NULL
      -- row ordered as the +inf / max-cell sentinel (the Spark side's
      -- coalesce(_best, inf_ord)), so the cell stays NULL only when
      -- EVERY probed super is memberless.
      SELECT vec_id, super_cell, cell FROM (
        SELECT v.vec_id, v.super_cell, m.cell,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY coalesce(m.n2
                     - 2 * list_inner_product(m.cvec, v.nx),
                     CAST('infinity' AS DOUBLE)),
                   coalesce(m.cell, 2147483647),
                   v.super_cell) AS rn
        FROM vsup v LEFT JOIN casg m USING (super_cell)) WHERE rn = 1
    ),
    flat AS MATERIALIZED (
      SELECT vec_id, cell AS flat_cell FROM (
        SELECT n.vec_id, c.cell,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY c.n2 - 2 * list_inner_product(c.cvec, n.nx),
                 c.cell) AS rn
        FROM n CROSS JOIN c) WHERE rn = 1
    ),
    mem AS (
      SELECT super_cell, count(DISTINCT cell) AS n_member_cells_used
      FROM two GROUP BY super_cell
    )
    SELECT t.super_cell,
           count(*) AS n_vectors,
           CAST(sum(CASE WHEN t.cell = f.flat_cell THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           coalesce(any_value(m.n_member_cells_used), 0)
             AS n_member_cells_used
    FROM two t
    JOIN flat f USING (vec_id)
    LEFT JOIN mem m ON m.super_cell = t.super_cell
    GROUP BY t.super_cell
    ORDER BY t.super_cell"""


oracle("p49_two_level_assign", _p49_oracle())


# ---------------------------------------------------------------------------
# P50: LSH SERVING FROM A STORED BUCKET TABLE — the last approximate arm
# without a stored-index face (graph=p44, IVF=p45, PQ=p46, IVF-PQ=p47,
# trigram=t40, BM25=t41; this completes the matrix). p06 recomputes
# every vector's 8 table buckets per execution; here the bucket table
# (w, b, vec_id) is a content-addressed artifact range-partitioned and
# sorted by (w, b), and serving filters it with the query's 8 (table,
# bucket) pairs — an OR-of-equalities PUSHED to the parquet scan, so
# row groups holding none of the query's buckets are skipped (the
# E2LSH hash-table lookup access pattern). Distinct candidates are then
# exact-rescored against the corpus, so p50's top-10 equals p06's
# full-scan answer bit-for-bit (pinned), and the oracle is LITERALLY
# p06's (the bucket table is a materialization of its `eb` CTE).
# ---------------------------------------------------------------------------
def _stored_lsh_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing path of the frozen RP-LSH bucket table: one row
    per (table w, bucket b, vec_id), same floor(round(·/L, 9)) bucket
    arithmetic as rp_lsh_topk (engine-replayable literals)."""
    import os

    from mtg_vector_db_spark.operators.ann import (
        RP_BUCKET_LENGTH,
        RP_SEED,
        RP_TABLES,
        rp_planes,
    )
    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key(
        "rp_lsh_buckets", "v1", RP_TABLES, RP_BUCKET_LENGTH, RP_SEED, fp
    )
    path = os.path.join(artifact_root(), "lsh_buckets", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.functions.vector import dot, l2_normalize

        (emb,) = tables(spark, sf_dir, "embeddings")
        planes = rp_planes(64, RP_TABLES, RP_SEED)
        planes_lit = F.array(
            *[F.array(*[F.lit(v) for v in p]) for p in planes]
        )
        nx = l2_normalize(F.col("embedding"))
        buckets = F.transform(
            F.sequence(F.lit(1), F.lit(RP_TABLES)),
            lambda w: F.struct(
                w.cast("int").alias("w"),
                F.floor(
                    F.round(
                        dot(F.element_at(planes_lit, w.cast("int")), nx)
                        / F.lit(RP_BUCKET_LENGTH),
                        9,
                    )
                ).cast("long").alias("b"),
            ),
        )
        (
            emb.select("vec_id", F.explode(buckets).alias("wb"))
            .select(F.col("wb.w").alias("w"), F.col("wb.b").alias("b"),
                    "vec_id")
            .repartitionByRange(8, "w", "b")
            .sortWithinPartitions("w", "b")
            .write.parquet(tmp)
        )

    ensure_artifact(path, build)
    return path


@query("p50_lsh_serve_stored")
def p50_lsh_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        RP_BUCKET_LENGTH,
        RP_SEED,
        RP_TABLES,
        _seq_dot,
        round_half_up,
        rp_planes,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    planes = rp_planes(len(qv), RP_TABLES, RP_SEED)
    qn_norm = _math.sqrt(_seq_dot(qv, qv))
    qn = [x / qn_norm for x in qv]
    # round_half_up, NOT round(): the stored table rounds with Spark's
    # HALF_UP F.round; Python's HALF_EVEN would bucket .5-tie queries
    # into a row the frozen artifact doesn't hold (round-6 ADVICE).
    q_buckets = [
        int(
            _math.floor(
                round_half_up(_seq_dot(qn, p) / RP_BUCKET_LENGTH, 9)
            )
        )
        for p in planes
    ]
    table = spark.read.parquet(_stored_lsh_path(spark, sf_dir))
    hit = None
    for w, b in enumerate(q_buckets, start=1):
        clause = (F.col("w") == w) & (F.col("b") == b)
        hit = clause if hit is None else (hit | clause)
    cand = table.filter(hit).select("vec_id").distinct()
    sim = F.round(cosine_similarity(F.col("embedding"), qv), R)
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(10)
    )


# The stored bucket table is a materialization of the p06 oracle's `eb`
# CTE, and the serve-side rescore is identical — so the oracle IS p06's.
oracle("p50_lsh_serve_stored", _p06_oracle())


# ---------------------------------------------------------------------------
# P51: APPEND+REFRESH SERVING FROM THE STORED BASE GRAPH — p48's serve
# face (round-6 VERDICT #3). p48 stays registered as the oracle-self-
# contained BUILD form (base substrate + append + refresh + audit all
# in-query), but its production shape never rebuilds the substrate: the
# k=24/3-round base graph over the pre-append corpus is a content-
# addressed artifact (built at most once per corpus fingerprint — the
# p44 discipline; the streaming twin refresh_appended_graph_store,
# streaming/pipelines.py, maintains the same stored lists per batch),
# and per maintenance cycle only the O(new) append + bounded refresh +
# fixed-50-probe audit run. Output and oracle are LITERALLY p48's — the
# stored lists are bit-identical to a fresh build (deterministic md5
# buckets, round(·,6) sims, id tie-breaks, exact double parquet
# round-trip), which test_artifacts pins directly.
# ---------------------------------------------------------------------------
def _stored_p48_base_path(
    spark: SparkSession, sf_dir: str, nb: int
) -> str:
    """Build-if-missing path of the frozen p48 BASE graph (k=24 lists,
    3 NN-Descent rounds over the non-appended 90% of the corpus). Keyed
    on corpus fingerprint + build params + the append fraction that
    defines the held-out region."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/embeddings.parquet")
    key = artifact_key(
        "p48_base_graph", "v1", _P40_K, _P40_ROUNDS, nb, _P48_FRAC, fp
    )
    path = os.path.join(artifact_root(), "graph_knn", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.functions.text import hash_fraction
        from mtg_vector_db_spark.operators.ann import (
            nn_descent_init,
            nn_descent_round,
        )
        from mtg_vector_db_spark.session import pin

        (emb,) = tables(spark, sf_dir, "embeddings")
        corpus = emb.filter(
            ~(
                hash_fraction(
                    F.concat(F.col("vec_id").cast("string"), F.lit(":new"))
                )
                < _P48_FRAC
            )
        )
        g = pin(nn_descent_init(corpus, nb, _P40_K))
        for _ in range(_P40_ROUNDS):
            g = pin(nn_descent_round(g, corpus, _P40_K))
        g.write.parquet(tmp)

    ensure_artifact(path, build)
    return path


@query("p51_graph_refresh_serve_stored")
def p51_graph_refresh_serve_stored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import (
        _graph_topk,
        nn_descent_append,
        nn_descent_refresh_appended,
    )
    from mtg_vector_db_spark.operators.knn import knn_join
    from mtg_vector_db_spark.session import pin

    (emb,) = tables(spark, sf_dir, "embeddings")
    newf = (
        hash_fraction(
            F.concat(F.col("vec_id").cast("string"), F.lit(":new"))
        )
        < _P48_FRAC
    )
    corpus = emb.filter(~newf)
    new = emb.filter(newf)
    nb = A.dynamic_bucket_count(corpus, min_buckets=_P40_BUCKETS)

    # The ONLY difference from p48: the base substrate comes from the
    # frozen artifact instead of an in-query 3-round build.
    g = spark.read.parquet(_stored_p48_base_path(spark, sf_dir, nb))

    probes = new.orderBy("vec_id").limit(_P40_PROBES)
    qdf = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # The exact audit is independent of the append→refresh chain —
    # overlap its pin from a driver thread (§2.6), as in p40.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        exact_fut = pool.submit(
            lambda: pin(
                knn_join(corpus, qdf, k=_P40_EVAL_K, round_digits=6).select(
                    F.col("query_id").alias("a"), F.col("vec_id").alias("b")
                )
            )
        )
        app = pin(nn_descent_append(g, corpus, new, nb, _P40_K))
        refreshed = nn_descent_refresh_appended(
            g.unionByName(app), corpus, new, k=_P40_K, rounds=1
        )
        rapp = pin(
            refreshed.join(
                new.select(F.col("vec_id").alias("a")), "a", "left_semi"
            )
        )
        exact = exact_fut.result()
    npb = probes.agg(F.count(F.lit(1)).alias("n_probes"))

    def stage_row(lists: DataFrame, stage: str) -> DataFrame:
        stats = lists.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.col("sim").cast("decimal(18,6)")).alias("ssim"),
        )
        hits = (
            _graph_topk(lists, _P40_EVAL_K)
            .join(exact, ["a", "b"])
            .agg(F.count(F.lit(1)).alias("nhit"))
        )
        return (
            stats.crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(npb))
            .select(
                F.lit(stage).alias("stage"),
                "n_edges",
                F.round(
                    F.col("ssim").cast("double") / F.col("n_edges"), 6
                ).alias("mean_sim"),
                F.round(
                    F.col("nhit").cast("double")
                    / (
                        F.col("n_probes") * F.lit(_P40_EVAL_K)
                    ).cast("double"),
                    6,
                ).alias("recall_at_10"),
            )
        )

    return (
        stage_row(app, "appended")
        .unionByName(stage_row(rapp, "refreshed"))
        .orderBy("stage")
    )


# The stored base graph is bit-identical to p48's in-query build (pinned
# in tests), and everything downstream is the same DAG — so the oracle
# is LITERALLY p48's.
oracle("p51_graph_refresh_serve_stored", _p48_oracle())


# ---------------------------------------------------------------------------
# P52: TWO-LEVEL OPERATING-POINT SWEEP (round-6 VERDICT #2) — the
# measured answer to "what end-to-end serving recall does an IVF probe
# see BEHIND two_level_assign, at which n_probe_super?". The two-level
# arm was the only approximation whose quality knob had no committed
# operating point (SCALE.md's 0.38→0.89 numbers are flat-ASSIGNMENT
# agreement on a synthetic, not serving recall). One-scan discipline
# (p36/p43/v18): the corpus is scored against the 64-cell codebook and
# the 8-super codebook ONCE each (ivf_ranked_assign keeps the rank
# order, so "assignment at probe p" is a rank filter + argmin — never a
# re-assignment), and all four probe levels plus serving recall come
# from those two scored passes. probe=8 probes every super, so its row
# IS flat assignment — the exactness anchor (agree_frac = 1.0 by
# construction). Geometry: 64 cells / 8 supers puts the sweep in the
# real two-level regime (n_super = √k), unlike dynamic_seed_cells'
# 8-cell/3-super fixture scale. Serving: the standard IVF probe (top-8
# of 64 cells by query-centroid distance), candidates = corpus rows
# whose p-level assigned cell is probed, exact cosine rescore, top-10
# vs exact KNN. Committed operating point: RECALL.md "Two-level arm".
# ---------------------------------------------------------------------------
_P52_CELLS = 64
_P52_NSUPER = 8
_P52_K = 10
_P52_NPROBE = 8
_P52_LEVELS = (1, 2, 4, 8)


@query("p52_two_level_operating_points")
def p52_two_level_operating_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.operators.ann import (
        ivf_assign,
        ivf_ranked_assign,
    )
    from mtg_vector_db_spark.operators.knn import knn_join

    (emb,) = tables(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < _P52_CELLS).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    supers = emb.filter(F.col("vec_id") < _P52_NSUPER).select(
        F.col("vec_id").cast("int").alias("super"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    # Level-1 membership: each cell's nearest super (two_level_assign's
    # casg) — 64 bounded rows, broadcast.
    casg = ivf_assign(
        seeds.select(
            F.col("cell").alias("vec_id"),
            F.col("centroid").alias("embedding"),
        ),
        supers,
        cluster_col="super",
        centroid_col="centroid",
    ).select(F.col("vec_id").alias("cell"), "super")

    # ONE scored pass per codebook, rank order kept: "assigned cell at
    # probe p" = the min-rank cell whose super ranks within p.
    #
    # Round 8 (§2.4 remove shuffles outright): the previous form exploded
    # every (vector × cell) rank row (128k), shuffle-joined it with the
    # per-vector super ranks on (vec_id, super), exploded ×4 probe
    # levels, and took rn=1 per (p, vec_id) through a 512k-row window —
    # three exchanges to express what is a PER-ROW computation. Both
    # codebooks are scored map-side (_with_scored_cells), the cell→super
    # membership folds to a 1-row broadcast map, and "assigned cell at
    # probe p" is the first entry of the (dist, cell)-sorted array whose
    # super's rank is ≤ p — array_sort's struct comparison IS the
    # (dist, cell)/(dist, super) tie-break the window form ordered by,
    # so the emitted (p, vec_id, cell) rows are identical (a (p, vec)
    # whose probed supers attracted no cells emits no row, exactly like
    # the empty window partition). Oracle unchanged (replays the window
    # form; values equal).
    from mtg_vector_db_spark.operators.ann import _with_scored_cells
    from mtg_vector_db_spark.session import pin

    # strategy="broadcast" EXPLICITLY for the corpus-wide 64-cell scored
    # pass (round 9): the round-9 A/B of round-8 VERDICT #1 measured the
    # broadcast fold the end-to-end winner for this query (p52 4.51 s
    # broadcast vs 6.51 s literal — the 64-cell plan literal costs ~4k
    # F.lit doubles of Catalyst analysis per execution). The auto
    # threshold (IVF_LITERAL_MAX_CELLS=32) picks the same path; the
    # explicit argument pins the measured per-call-site choice.
    cscored = (
        _with_scored_cells(
            emb, seeds, "embedding", "cell", "centroid", "broadcast"
        )
        .withColumnRenamed("_scored", "_csc")
        .drop("_nx")
    )
    sscored = _with_scored_cells(
        cscored, supers, "embedding", "super", "centroid"
    ).withColumnRenamed("_scored", "_ssc")
    cmap = casg.agg(
        F.map_from_entries(
            F.collect_list(F.struct("cell", "super"))
        ).alias("_cmap")
    )
    levels_arr = F.array(*[F.lit(p) for p in _P52_LEVELS])
    # Every shared subexpression is BOUND ONCE per row through
    # singleton-array lambdas (HOFs are interpreted with no CSE — the
    # l2_normalize discipline): the two sorts, then the super-rank map,
    # then the per-cell (cell, srank) array; the four probe levels are
    # then 4 cheap filters over 64 precomputed ranks.
    srm = lambda ss: F.map_from_entries(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.lit(_P52_NSUPER)),
            lambda i: F.struct(
                F.element_at(ss, i.cast("int"))["cell"], i.cast("int")
            ),
        )
    )
    per_level = F.get(
        F.transform(
            F.array(
                F.struct(
                    F.array_sort(F.col("_csc")).alias("cs"),
                    F.array_sort(F.col("_ssc")).alias("ss"),
                )
            ),
            lambda b: F.get(
                F.transform(
                    F.array(
                        F.struct(
                            b["cs"].alias("cs"), srm(b["ss"]).alias("sm")
                        )
                    ),
                    lambda b2: F.get(
                        F.transform(
                            F.array(
                                F.transform(
                                    b2["cs"],
                                    lambda s: F.struct(
                                        s["cell"].alias("cell"),
                                        F.element_at(
                                            b2["sm"],
                                            F.element_at(
                                                F.col("_cmap"), s["cell"]
                                            ),
                                        ).alias("srank"),
                                    ),
                                )
                            ),
                            lambda csr: F.filter(
                                F.transform(
                                    levels_arr,
                                    lambda p: F.struct(
                                        p.alias("p"),
                                        F.filter(
                                            csr, lambda s: s["srank"] <= p
                                        ).alias("_picks"),
                                    ),
                                ),
                                lambda e: F.size(e["_picks"]) > 0,
                            ),
                        ),
                        0,
                    ),
                ),
                0,
            ),
        ),
        0,
    )
    # asg feeds four downstream subtrees (flat, both sides of agree, and
    # the serving candidates) inside one final DAG; pin so the scored
    # pass runs once. Semantics-neutral (eager localCheckpoint).
    asg = pin(
        sscored.crossJoin(F.broadcast(cmap))
        .select(
            "vec_id", F.explode(per_level).alias("_e")
        )
        .select(
            F.col("_e")["p"].alias("p"),
            "vec_id",
            F.element_at(F.col("_e")["_picks"], 1)["cell"].alias("cell"),
        )
    )
    # probe=8 probes every super => flat assignment (exactness anchor).
    flat = asg.filter(F.col("p") == _P52_LEVELS[-1]).select(
        "vec_id", F.col("cell").alias("flat_cell")
    )
    agree = (
        asg.join(flat, "vec_id")
        .groupBy("p")
        .agg(
            F.round(
                F.avg(
                    F.when(
                        F.col("cell") == F.col("flat_cell"), 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias("agree_frac")
        )
    )

    # Serving: standard IVF probe over the 64-cell codebook, candidates
    # gated by the p-level corpus assignment, exact rescore, top-10.
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_join(emb, queries_df, k=_P52_K, round_digits=R).select(
        "query_id", "vec_id", F.lit(1).alias("is_true")
    )
    probe = ivf_ranked_assign(
        queries_df.select(
            F.col("query_id").alias("vec_id"),
            F.col("query_vec").alias("embedding"),
        ),
        seeds,
        nprobe=_P52_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    # Norms hoisted to once-per-row / once-per-query (round 8): same
    # dot/(ne*nq) tree as cosine_similarity — bit-identical, 1/3 the
    # interpreted folds on the pair-expanded rescore.
    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity_prenorm,
        l2_norm,
    )

    sim = F.round(
        cosine_similarity_prenorm(
            F.col("embedding"),
            F.col("_ne"),
            F.col("query_vec"),
            F.col("_nq"),
        ),
        R,
    )
    # scand feeds both the hits and n_cand branches — pin for the same
    # reason as asg.
    scand = pin(
        asg.join(probe, "cell")
        .join(emb.withColumn("_ne", l2_norm(F.col("embedding"))), "vec_id")
        .join(
            F.broadcast(
                queries_df.withColumn("_nq", l2_norm(F.col("query_vec")))
            ),
            "query_id",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("p", "query_id", "vec_id", sim.alias("sim"))
    )
    w_k = Window.partitionBy("p", "query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    hits = (
        scand.withColumn("rk", F.row_number().over(w_k))
        .filter(F.col("rk") <= _P52_K)
        .join(exact, ["query_id", "vec_id"], "left")
        .groupBy("p")
        .agg(
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias("n_hits")
        )
    )
    ncand = scand.groupBy("p").agg(F.count(F.lit(1)).alias("n_cand"))
    n_q = 10
    return (
        agree.join(hits, "p")
        .join(ncand, "p")
        .select(
            F.col("p").alias("n_probe_super"),
            "agree_frac",
            F.round(
                F.col("n_hits") / F.lit(float(n_q * _P52_K)), 6
            ).alias("avg_recall_at_10"),
            F.round(F.col("n_cand") / F.lit(float(n_q)), 6).alias(
                "avg_candidates"
            ),
        )
        .orderBy("n_probe_super")
    )


def _p52_oracle() -> str:
    cells, nsuper, k, nprobe = _P52_CELLS, _P52_NSUPER, _P52_K, _P52_NPROBE
    asg_branches = "\n      UNION ALL\n".join(
        f"""      SELECT {p} AS p, vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY crank) AS rn
        FROM cand WHERE srank <= {p}) WHERE rn = 1"""
        for p in _P52_LEVELS
    )
    return f"""
    WITH c AS MATERIALIZED (
      SELECT CAST(vec_id AS INT) AS cell,
             CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < {cells}
    ),
    s AS MATERIALIZED (
      SELECT CAST(vec_id AS INT) AS super,
             CAST(embedding AS DOUBLE[]) AS svec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS sn2
      FROM embeddings WHERE vec_id < {nsuper}
    ),
    n AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(
                 CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[])))) AS nx
      FROM embeddings
    ),
    casg AS MATERIALIZED (
      SELECT cell, super FROM (
        SELECT c.cell, s.super,
               row_number() OVER (PARTITION BY c.cell
                 ORDER BY s.sn2 - 2 * list_inner_product(s.svec,
                   list_transform(c.cvec,
                     x -> x / sqrt(list_inner_product(c.cvec, c.cvec)))),
                 s.super) AS rn
        FROM c CROSS JOIN s) WHERE rn = 1
    ),
    cd AS MATERIALIZED (
      SELECT n.vec_id, c.cell,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY c.n2 - 2 * list_inner_product(c.cvec, n.nx),
               c.cell) AS crank
      FROM n CROSS JOIN c
    ),
    sd AS MATERIALIZED (
      SELECT n.vec_id, s.super,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY s.sn2 - 2 * list_inner_product(s.svec, n.nx),
               s.super) AS srank
      FROM n CROSS JOIN s
    ),
    cand AS MATERIALIZED (
      SELECT cd.vec_id, cd.cell, cd.crank, sd.srank
      FROM cd JOIN casg USING (cell)
      JOIN sd ON sd.vec_id = cd.vec_id AND sd.super = casg.super
    ),
    asg AS MATERIALIZED (
{asg_branches}
    ),
    agree AS MATERIALIZED (
      SELECT a.p,
             round(avg(CASE WHEN a.cell = f.flat_cell
                            THEN 1.0 ELSE 0.0 END), 6) AS agree_frac
      FROM asg a JOIN (SELECT vec_id, cell AS flat_cell FROM asg
                       WHERE p = {_P52_LEVELS[-1]}) f USING (vec_id)
      GROUP BY a.p
    ),
    q AS MATERIALIZED (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ),
    exact AS MATERIALIZED (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), q.qv), {R}) DESC,
                 e.vec_id ASC) AS rank
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
      ) WHERE rank <= {k}
    ),
    probe AS MATERIALIZED (
      SELECT query_id, cell FROM (
        SELECT q.query_id, c.cell,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY c.n2 - 2 * list_inner_product(c.cvec,
                   list_transform(q.qv,
                     x -> x / sqrt(list_inner_product(q.qv, q.qv)))),
                 c.cell) AS rn
        FROM q CROSS JOIN c) WHERE rn <= {nprobe}
    ),
    scand AS MATERIALIZED (
      SELECT a.p, pr.query_id, a.vec_id,
             round(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]), q2.qv), {R}) AS sim
      FROM asg a
      JOIN probe pr ON a.cell = pr.cell
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN q q2 ON q2.query_id = pr.query_id
      WHERE a.vec_id <> pr.query_id
    ),
    topk AS MATERIALIZED (
      SELECT p, query_id, vec_id FROM (
        SELECT p, query_id, vec_id,
               row_number() OVER (PARTITION BY p, query_id
                 ORDER BY sim DESC, vec_id) AS rk
        FROM scand) WHERE rk <= {k}
    ),
    hits AS (
      SELECT t.p, count(*) AS n_hits FROM topk t
      JOIN exact x ON t.query_id = x.query_id AND t.vec_id = x.doc_id
      GROUP BY t.p
    ),
    nc AS (SELECT p, count(*) AS n_cand FROM scand GROUP BY p)
    SELECT ag.p AS n_probe_super,
           ag.agree_frac,
           round(coalesce(h.n_hits, 0) / {float(10 * k)}, 6)
             AS avg_recall_at_10,
           round(nc.n_cand / 10.0, 6) AS avg_candidates
    FROM agree ag
    JOIN nc USING (p)
    LEFT JOIN hits h ON h.p = ag.p
    ORDER BY n_probe_super"""


oracle("p52_two_level_operating_points", _p52_oracle())


# ---------------------------------------------------------------------------
# P53: FULL IMI SEARCH — both halves of the two-level recipe in one
# serving DAG, completing the arm (p49 = assignment, p52 = committed
# operating point, p53 = serving). The BUILD side assigns the corpus
# through two_level_assign at the committed n_probe_super=4 (RECALL.md
# "Two-level arm"); the QUERY side picks its probe cells through
# two_level_probe_cells — score 8 supers, then only the top-2 supers'
# member cells — so per-query coarse work is O(√k + probed members)
# instead of ivf_probe_cells' O(k) codebook scan (at 4M cells: ~4k rows
# scored per query instead of 4M). Candidates = corpus rows whose
# assigned cell is probed, exact cosine rescore, top-10 — the standard
# IVF serve tail. Geometry is p52's 64-cell / 8-super codebook (the
# real two-level regime). Oracle replays assignment (dist argmin,
# multi-probe NULLS-LAST sentinel ordering) and probe (cosine ranked
# picks at both levels) end-to-end.
# ---------------------------------------------------------------------------
_P53_NPROBE = 8
_P53_PROBE_SUPER = 2


@query("p53_imi_search")
def p53_imi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        ivf_assign,
        two_level_assign,
        two_level_probe_cells,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir)
    seeds = emb.filter(F.col("vec_id") < _P52_CELLS).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    supers = emb.filter(F.col("vec_id") < _P52_NSUPER).select(
        F.col("vec_id").cast("int").alias("super_cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    casg = ivf_assign(
        seeds.select(
            F.col("cell").alias("vec_id"),
            F.col("centroid").alias("embedding"),
        ),
        supers,
        cluster_col="super_cell",
        centroid_col="centroid",
    ).select(F.col("vec_id").alias("cell"), "super_cell")
    cents_sup = seeds.join(F.broadcast(casg), "cell")

    probed = two_level_probe_cells(
        cents_sup, supers, qv,
        nprobe=_P53_NPROBE, n_probe_super=_P53_PROBE_SUPER,
    )
    assigned = two_level_assign(
        emb, seeds, n_super=_P52_NSUPER, n_probe_super=_P49_PROBE
    )
    sim = F.round(cosine_similarity(F.col("embedding"), qv), R)
    return (
        assigned.join(F.broadcast(probed), "cell", "left_semi")
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(_P52_K)
    )


def _p53_oracle() -> str:
    cells, nsuper = _P52_CELLS, _P52_NSUPER
    k, nprobe, psuper = _P52_K, _P53_NPROBE, _P53_PROBE_SUPER
    aprobe = _P49_PROBE
    return f"""
    WITH c AS MATERIALIZED (
      SELECT CAST(vec_id AS INT) AS cell,
             CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < {cells}
    ),
    s AS MATERIALIZED (
      SELECT CAST(vec_id AS INT) AS super_cell,
             CAST(embedding AS DOUBLE[]) AS svec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS sn2
      FROM embeddings WHERE vec_id < {nsuper}
    ),
    casg AS MATERIALIZED (
      SELECT cell, cvec, n2, super_cell FROM (
        SELECT c.cell, c.cvec, c.n2, s.super_cell,
               row_number() OVER (PARTITION BY c.cell
                 ORDER BY s.sn2 - 2 * list_inner_product(s.svec,
                   list_transform(c.cvec,
                     x -> x / sqrt(list_inner_product(c.cvec, c.cvec)))),
                 s.super_cell) AS rn
        FROM c CROSS JOIN s) WHERE rn = 1
    ),
    n AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(
                 CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[])))) AS nx
      FROM embeddings
    ),
    vsup AS MATERIALIZED (
      SELECT vec_id, nx, super_cell FROM (
        SELECT n.vec_id, n.nx, s.super_cell,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY s.sn2 - 2 * list_inner_product(s.svec, n.nx),
                 s.super_cell) AS rn
        FROM n CROSS JOIN s) WHERE rn <= {aprobe}
    ),
    asg AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, m.cell,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY coalesce(m.n2
                     - 2 * list_inner_product(m.cvec, v.nx),
                     CAST('infinity' AS DOUBLE)),
                   coalesce(m.cell, 2147483647),
                   v.super_cell) AS rn
        FROM vsup v LEFT JOIN casg m USING (super_cell)) WHERE rn = 1
    ),
    q AS MATERIALIZED (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = 0
    ),
    spick AS MATERIALIZED (
      SELECT super_cell FROM (
        SELECT s.super_cell,
               row_number() OVER (ORDER BY
                 list_cosine_similarity(s.svec, (SELECT qv FROM q)) DESC,
                 s.super_cell ASC) AS rn
        FROM s) WHERE rn <= {psuper}
    ),
    probed AS MATERIALIZED (
      SELECT cell FROM (
        SELECT m.cell,
               row_number() OVER (ORDER BY
                 list_cosine_similarity(m.cvec, (SELECT qv FROM q)) DESC,
                 m.cell ASC) AS rn
        FROM casg m JOIN spick USING (super_cell)) WHERE rn <= {nprobe}
    )
    SELECT e.vec_id AS doc_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                 (SELECT qv FROM q)), {R}) AS sim
    FROM asg a
    JOIN probed p ON a.cell = p.cell
    JOIN embeddings e ON e.vec_id = a.vec_id
    ORDER BY sim DESC, doc_id ASC LIMIT {k}"""


oracle("p53_imi_search", _p53_oracle())


# ---------------------------------------------------------------------------
# P54 (round-8 VERDICT #1): HARD-NEGATIVE MINING SERVED FROM THE STORED
# IVF LAYOUT — the mining workloads are the 100 TB consumers of ANN, and
# until now they re-derived their candidate blocks in-plan (p26 runs
# ivf_multi_assign over the whole corpus per run) while the p45 artifact
# already holds the corpus cell-partitioned on identical geometry. This
# query is p26's semantics on the p45 serving discipline: a query TABLE
# of anchors (50 vectors) is assigned its nprobe cells map-side
# (ivf_ranked_assign against the frozen dynamic seed cells — the same
# quantizer the artifact froze), the probe side is broadcast, and the
# stored layout scan is confined to the union of probed cells by DYNAMIC
# PARTITION PRUNING (plan-asserted in tests/test_artifacts.py) — bytes
# read ∝ probed cells, never the corpus. Candidates are band-filtered
# (below the positive threshold, above the trivial floor) and ranked
# per anchor. Candidate generation differs from p26 deliberately:
# candidates come from the layout's SINGLE stored assignment (each
# vector in exactly one cell — the artifact's grain), so each
# (anchor, candidate) pair arises at most once and needs no distinct.
# Reference analogy: the embed-once/fan-out pattern of
# /root/reference/db/search_with_reranker.py:249-290 generalized to a
# query table. Oracle: p45's assignment/probe CTE chain + the band
# filter + the per-anchor rank window.
# ---------------------------------------------------------------------------
_P54_HI = 0.5   # sim >= HI is a positive, not a negative
_P54_LO = 0.15  # sim < LO is a trivial negative (uninformative)
_P54_K = 5
_P54_ANCHORS = 50
_P54_NPROBE = 3


@query("p54_hard_negatives_served_stored")
def p54_hard_negatives_served_stored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_ranked_assign,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    layout = spark.read.parquet(_stored_ivf_path(spark, sf_dir))
    cents = dynamic_seed_cells(emb)
    anchors = emb.filter(F.col("vec_id") < _P54_ANCHORS)
    pcells = ivf_ranked_assign(anchors, cents, nprobe=_P54_NPROBE).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("query_vec"),
        "cell",
    )
    # Probe side broadcast → DPP prunes the layout scan to probed cells.
    sim = F.round(
        cosine_similarity(F.col("embedding"), F.col("query_vec")), R
    )
    banded = (
        layout.join(F.broadcast(pcells), "cell")
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            sim.alias("sim"),
        )
        .filter((F.col("sim") >= _P54_LO) & (F.col("sim") < _P54_HI))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("sim"), F.asc("neg_id")
    )
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _P54_K)
        .orderBy("anchor_id", "rank")
    )


def _p54_oracle() -> str:
    return f"""
    WITH kc AS (
      SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS INT)) AS k
      FROM embeddings
    ),
    c AS (
      SELECT CAST(vec_id AS INT) AS cell,
             CAST(embedding AS DOUBLE[]) AS cvec,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS n2
      FROM embeddings WHERE vec_id < (SELECT k FROM kc)
    ),
    n AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(
                     CAST(embedding AS DOUBLE[]),
                     CAST(embedding AS DOUBLE[])))) AS nx
          FROM embeddings),
    d AS (SELECT n.vec_id, c.cell,
                 c.n2 - 2 * list_inner_product(c.cvec, n.nx) AS dist
          FROM n CROSS JOIN c),
    assigned AS (SELECT vec_id, cell FROM (
                   SELECT vec_id, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cell) AS rn
                   FROM d) WHERE rn = 1),
    probe AS (SELECT vec_id AS anchor_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cell) AS rn
                FROM d WHERE vec_id < {_P54_ANCHORS})
              WHERE rn <= {_P54_NPROBE}),
    q AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < {_P54_ANCHORS}),
    banded AS (
      SELECT p.anchor_id, a.vec_id AS neg_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), {R}) AS sim
      FROM assigned a
      JOIN probe p USING (cell)
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN q ON q.anchor_id = p.anchor_id
      WHERE a.vec_id <> p.anchor_id
    )
    SELECT anchor_id, neg_id, sim, rank FROM (
      SELECT anchor_id, neg_id, sim,
             row_number() OVER (PARTITION BY anchor_id
               ORDER BY sim DESC, neg_id) AS rank
      FROM banded
      WHERE sim >= {_P54_LO} AND sim < {_P54_HI})
    WHERE rank <= {_P54_K}
    ORDER BY anchor_id, rank
    """


oracle("p54_hard_negatives_served_stored", _p54_oracle())
