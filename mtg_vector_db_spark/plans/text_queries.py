"""Text/string queries (SURVEY.md §2.8 T-group, §2.7 V10 tiered search,
plus the text-analysis pipeline operators: token stats, quality scoring,
language ID, fingerprinting).

``part.p_name`` (word-pair names like "blue bolt", with duplicates across
partkeys) plays the card-name corpus; ``documents.text`` plays the document
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mtg_vector_db_spark.functions import text as T
from mtg_vector_db_spark.functions import textstats as TS
from mtg_vector_db_spark.functions.trigram import (
    duckdb_trigram_similarity_sql,
    trigram_similarity,
)
from mtg_vector_db_spark.operators.tiered import tiered_name_search
from mtg_vector_db_spark.plans.registry import oracle, query, tables

R = 6


# ---------------------------------------------------------------------------
# T1+K2/K3: pg_trgm similarity ranking (the fuzzy tier's ORDER BY
# name <-> q, db/search_strategies.py:97-106).
# ---------------------------------------------------------------------------
@query("t01_trigram_topk")
def t01_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    sim = F.round(trigram_similarity(F.col("p_name"), F.lit("blu bolt")), R)
    return (
        part.select("p_name")
        .distinct()
        .withColumn("sim", sim)
        .filter(F.col("sim") > 0.0)
        .orderBy(F.desc("sim"), F.asc("p_name"))
        .limit(10)
    )


_TRI_BLU = duckdb_trigram_similarity_sql("p_name", "'blu bolt'")
oracle(
    "t01_trigram_topk",
    f"""
    SELECT p_name, round({_TRI_BLU}, {R}) AS sim
    FROM (SELECT DISTINCT p_name FROM part)
    WHERE round({_TRI_BLU}, {R}) > 0.0
    ORDER BY sim DESC, p_name ASC LIMIT 10
    """,
)


def _tiered_oracle(q: str, k: int = 10) -> str:
    """Full 3-tier cascade as one SQL statement: the driver-side gating of
    tiered_name_search expressed with NOT EXISTS guards, so the oracle
    reproduces whichever tier the Spark operator settles on."""
    sim = duckdb_trigram_similarity_sql("p_name", f"'{q}'")
    return f"""
    WITH exact_t AS (
      SELECT p_partkey, p_name, 'exact' AS match_type, 1.0 AS sim
      FROM part WHERE lower(p_name) = lower('{q}')
    ), prefix_t AS (
      SELECT p_partkey, p_name, 'prefix' AS match_type, round({sim}, {R}) AS sim
      FROM part WHERE lower(p_name) LIKE lower('{q}') || '%'
      ORDER BY sim DESC, p_name ASC, p_partkey ASC LIMIT {k}
    ), fuzzy_t AS (
      SELECT p_partkey, p_name, 'fuzzy' AS match_type, round({sim}, {R}) AS sim
      FROM part WHERE round({sim}, {R}) > 0.3
      ORDER BY sim DESC, p_name ASC, p_partkey ASC LIMIT {k}
    )
    SELECT * FROM exact_t
    UNION ALL
    SELECT * FROM prefix_t WHERE NOT EXISTS (SELECT 1 FROM exact_t)
      AND (SELECT max(sim) FROM prefix_t) > 0.5
    UNION ALL
    SELECT * FROM fuzzy_t WHERE NOT EXISTS (SELECT 1 FROM exact_t)
      AND coalesce((SELECT max(sim) FROM prefix_t), 0.0) <= 0.5
    """


def _tiered(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    return tiered_name_search(
        part.select("p_partkey", "p_name"),
        q,
        name_col="p_name",
        k=10,
        tiebreak=("p_partkey",),
    ).select("p_partkey", "p_name", "match_type", "sim")


# V10 tier 1: exact-match hit.
@query("t02_tiered_exact")
def t02_tiered_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tiered(spark, sf_dir, "Blue Bolt")


oracle("t02_tiered_exact", _tiered_oracle("Blue Bolt"))


# V10 tier 2: prefix tier (acceptance gate on best trigram sim).
@query("t03_tiered_prefix")
def t03_tiered_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tiered(spark, sf_dir, "small")


oracle("t03_tiered_prefix", _tiered_oracle("small"))


# V10 tier 3: fuzzy trigram tier (typo'd query).
@query("t04_tiered_fuzzy")
def t04_tiered_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tiered(spark, sf_dir, "blu bolt")


oracle("t04_tiered_fuzzy", _tiered_oracle("blu bolt"))


# ---------------------------------------------------------------------------
# T5-T9/T14: string-transformation showcase (ingestion field extraction,
# db/ingest_cards.py:13-109, as column expressions).
# ---------------------------------------------------------------------------
@query("t05_string_ops")
def t05_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    faced = F.concat(F.col("p_name"), F.lit(" // "), F.col("p_type"))
    return (
        part.filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            T.strip_braces(
                F.concat(F.lit("{"), F.col("p_brand"), F.lit("}"))
            ).alias("brand_clean"),
            T.back_face_name(faced).alias("back_face"),
            T.coalesce_name(
                F.nullif(F.col("p_type"), F.lit("")), F.col("p_name")
            ).alias("display_name"),
            T.power_toughness(
                F.col("p_size").cast("string"),
                F.floor(F.col("p_retailprice")).cast("long").cast("string"),
            ).alias("pt"),
            T.truncate_ellipsis(F.col("p_type"), 8).alias("type_short"),
        )
        .orderBy("p_partkey")
    )


oracle(
    "t05_string_ops",
    """
    SELECT p_partkey,
           regexp_replace('{' || p_brand || '}', '[{}]', '', 'g') AS brand_clean,
           trim(string_split_regex(p_name || ' // ' || p_type, '//')[2]) AS back_face,
           coalesce(nullif(p_type, ''), p_name) AS display_name,
           CAST(p_size AS VARCHAR) || '/' || CAST(CAST(floor(p_retailprice) AS BIGINT) AS VARCHAR) AS pt,
           CASE WHEN length(p_type) > 8 THEN substring(p_type, 1, 8) || '...'
                ELSE p_type END AS type_short
    FROM part WHERE p_partkey < 100 ORDER BY p_partkey
    """,
)


# ---------------------------------------------------------------------------
# K5: natural sort of rule-number-shaped strings ("100.2" before "100.10").
# ---------------------------------------------------------------------------
@query("t06_natural_sort")
def t06_natural_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    rn = F.concat(
        (F.col("o_orderkey") % 120).cast("string"),
        F.lit("."),
        (F.col("o_custkey") % 15).cast("string"),
    )
    major, minor, _ = T.rule_sort_key(F.col("rule_number"))
    return (
        orders.filter(F.col("o_orderkey") < 500)
        .select(rn.alias("rule_number"))
        .distinct()
        .select("rule_number", major.alias("major"), minor.alias("minor"))
        .orderBy("major", "minor", "rule_number")
        .limit(60)
    )


oracle(
    "t06_natural_sort",
    """
    SELECT rule_number,
           CAST(regexp_extract(rule_number, '^(\\d+)', 1) AS INT) AS major,
           CAST(regexp_extract(rule_number, '^\\d+\\.(\\d+)', 1) AS INT) AS minor
    FROM (
      SELECT DISTINCT CAST(o_orderkey % 120 AS VARCHAR) || '.' ||
                      CAST(o_custkey % 15 AS VARCHAR) AS rule_number
      FROM orders WHERE o_orderkey < 500
    )
    ORDER BY major, minor, rule_number LIMIT 60
    """,
)


_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)"
_TOKS_L = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0)"


# ---------------------------------------------------------------------------
# Token statistics per language (corpus-pipeline op; exact-integer
# aggregation so results are partition-order invariant).
# ---------------------------------------------------------------------------
@query("t07_token_stats")
def t07_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    per_doc = docs.select(
        "lang",
        F.size(toks).alias("n_tokens"),
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).alias(
            "n_token_chars"
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), R
            ).alias("avg_tokens_per_doc"),
            F.round(
                F.sum("n_token_chars").cast("double") / F.sum("n_tokens"), R
            ).alias("avg_token_len"),
        )
        .orderBy("lang")
    )


oracle(
    "t07_token_stats",
    f"""
    WITH per_doc AS (
      SELECT lang, len({_TOKS}) AS n_tokens,
             list_sum(list_transform({_TOKS}, t -> len(t))) AS n_token_chars
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / count(*), {R}) AS avg_tokens_per_doc,
           round(CAST(sum(n_token_chars) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE), {R}) AS avg_token_len
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# Per-document quality scoring (corpus-pipeline op).
# ---------------------------------------------------------------------------
@query("t08_quality_scores")
def t08_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            TS.token_count(F.col("text")).alias("n_tokens"),
            F.round(TS.stopword_ratio(F.col("text")), R).alias("stopword_ratio"),
            F.round(TS.non_alnum_ratio(F.col("text")), R).alias("noise_ratio"),
            TS.quality_score(F.col("text")).alias("quality"),
        )
        .orderBy("doc_id")
    )


_SW = "['" + "','".join(TS.EN_STOPWORDS) + "']"
# CASE guards mirror the Spark builders (textstats.py): a doc with zero
# tokens / zero characters scores 0.0, never NaN from 0/0 (fuzz-parity
# finding — the committed fixtures have no empty docs, so the unguarded
# form never fired there).
_SW_RATIO = (
    f"CASE WHEN len({_TOKS_L}) > 0 THEN "
    f"len(list_filter({_TOKS_L}, t -> list_contains({_SW}, t))) * 1.0"
    f" / len({_TOKS_L}) ELSE 0.0 END"
)
_NOISE = (
    "CASE WHEN length(text) > 0 THEN "
    "length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0"
    " / length(text) ELSE 0.0 END"
)
_NTOK = f"len({_TOKS})"
oracle(
    "t08_quality_scores",
    f"""
    SELECT doc_id, {_NTOK} AS n_tokens,
           round({_SW_RATIO}, {R}) AS stopword_ratio,
           round({_NOISE}, {R}) AS noise_ratio,
           round(least(1.0, 0.3 + 0.4 * least(1.0, ({_SW_RATIO}) * 4)
                 + 0.3 * least(1.0, ({_NTOK}) / 100.0)
                 - 0.5 * ({_NOISE})), {R}) AS quality
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# Language identification vs the labeled lang column (confusion counts).
# ---------------------------------------------------------------------------
@query("t09_lang_id_confusion")
def t09_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return (
        docs.select("lang", TS.lang_id(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


def _duck_lang_case() -> str:
    scores = {
        lang: f"len(list_filter({_TOKS_L}, t -> list_contains(['"
        + "','".join(markers)
        + "'], t)))"
        for lang, markers in TS.LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}'"
        for lang in TS.LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'und' END"


oracle(
    "t09_lang_id_confusion",
    f"""
    SELECT lang, {_duck_lang_case()} AS predicted, count(*) AS n
    FROM documents GROUP BY 1, 2 ORDER BY lang, predicted
    """,
)


# ---------------------------------------------------------------------------
# Document fingerprinting (md5 over normalized text — exact-dedup key).
# ---------------------------------------------------------------------------
@query("t10_fingerprints")
def t10_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select("doc_id", TS.fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


oracle(
    "t10_fingerprints",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# BPE-ish token accounting (the LLM-budget counterpart of t07's whitespace
# tokens): per language, total pretokens and their ratio to whitespace
# tokens — the corpus-level "tokens per word" fertility metric.
# ---------------------------------------------------------------------------
@query("t11_bpe_token_stats")
def t11_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        TS.bpe_token_count(F.col("text")).alias("n_bpe"),
        F.size(T.tokens(F.col("text"))).alias("n_ws"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(
                F.sum("n_bpe").cast("double") / F.sum("n_ws"), R
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )


oracle(
    "t11_bpe_token_stats",
    rf"""
    WITH per_doc AS (
      SELECT lang,
             len(regexp_extract_all(lower(text),
                 '''(?:s|t|re|ve|m|ll|d)| ?\p{{L}}+| ?\p{{N}}+| ?[^\s\p{{L}}\p{{N}}]+')) AS n_bpe,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> len(t) > 0)) AS n_ws
      FROM documents
    )
    SELECT lang, CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
           round(sum(n_bpe) * 1.0 / sum(n_ws), 6) AS tokens_per_word
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# Corpus cleaning + PII scrub (functions/text.py clean_text / mask_pii):
# HTML/URL/control stripping, whitespace collapse, email/phone masking.
# Noise is synthesized around the real text so every rule fires; the
# oracle replays the identical regex chain (DuckDB needs the 'g' flag —
# its regexp_replace is first-match by default, Spark's is global).
# ---------------------------------------------------------------------------
@query("t12_clean_and_mask")
def t12_clean_and_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import clean_text, mask_pii

    (docs,) = tables(spark, sf_dir, "documents")
    noisy = F.concat(
        F.lit('<div class="doc"> '),
        F.col("text"),
        F.lit(
            " </div> see https://ex.com/a?b=1 or www.t.org "
            "mail bob.smith+1@ex.co.uk call +1 (555) 123-4567 done"
        ),
    )
    return (
        docs.filter(F.col("doc_id") < 100)
        .select("doc_id", mask_pii(clean_text(noisy)).alias("cleaned"))
        .orderBy("doc_id")
    )


oracle(
    "t12_clean_and_mask",
    r"""
    WITH noisy AS (
      SELECT doc_id,
             '<div class="doc"> ' || text ||
             ' </div> see https://ex.com/a?b=1 or www.t.org mail bob.smith+1@ex.co.uk call +1 (555) 123-4567 done' AS t
      FROM documents WHERE doc_id < 100
    ), cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '<[^>]{0,500}>', ' ', 'g'),
                   'https?://\S+|www\.\S+', ' ', 'g'),
                 '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'),
               '\s+', ' ', 'g')) AS t
      FROM noisy
    ), masked AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?\d[\d ()-]{7,}\d', '<PHONE>', 'g') AS cleaned
      FROM cleaned
    )
    SELECT doc_id, cleaned FROM masked ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# Corpus vocabulary: document frequency + total frequency of the most
# common tokens (explode → one hash aggregation — the classic inverted
# vocabulary build).
# ---------------------------------------------------------------------------
@query("t13_vocab_topk")
def t13_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(20)
    )


_TOKS_SQL = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> len(t) > 0)"
)
oracle(
    "t13_vocab_topk",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
    )
    SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM tok GROUP BY token
    ORDER BY tf DESC, token ASC LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# BM25 keyword scoring (operators/text_search.py) — the lexical arm the
# reference's trigram tier (db/search_strategies.py:97-106) approximates;
# term explode is filtered to query terms before any shuffle.
# ---------------------------------------------------------------------------
BM25_TERMS = ("vector", "join", "spark")


def bm25_sql_ctes(terms: tuple[str, ...] = BM25_TERMS) -> str:
    """DuckDB CTE block replaying operators/text_search.py:bm25_scores
    (ends with ``bm(doc_id, bm25)``); shared with the hybrid-fusion oracle."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    st AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM tok),
    tf AS (SELECT doc_id, doclen, term, count(*) AS tf
           FROM (SELECT doc_id, len(toks) AS doclen, unnest(toks) AS term
                 FROM tok)
           WHERE term IN ({in_list})
           GROUP BY doc_id, doclen, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (SELECT t.doc_id,
                  round(sum(ln((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0) + 1)
                        * t.tf * 2.2e0
                        / (t.tf + 1.2e0 * (0.25e0
                           + 0.75e0 * t.doclen / s.avgdl))), {R}) AS bm25
           FROM tf t JOIN dfq d USING (term) CROSS JOIN st s
           GROUP BY t.doc_id)
    """


@query("t14_bm25_topk")
def t14_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.text_search import bm25_topk

    (docs,) = tables(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=10, round_digits=R).orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )


oracle(
    "t14_bm25_topk",
    f"""
    WITH {bm25_sql_ctes()}
    SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Trigram set-similarity JOIN (operators/fuzzy_join.py): the many-to-many
# entity-resolution form of the fuzzy tier — exact pg_trgm similarity from
# posting counts alone (sim = inter/(|A|+|B|-inter)), no cross join, no
# per-pair array re-intersection. Disjoint partkey slices stand in for two
# tables being resolved against each other; id bounds keep the demo
# scale-stable.
# ---------------------------------------------------------------------------
@query("t15_fuzzy_name_join")
def t15_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.fuzzy_join import trigram_join

    (part,) = tables(spark, sf_dir, "part")
    left = part.filter(F.col("p_partkey") < 500)
    right = part.filter(
        (F.col("p_partkey") >= 500) & (F.col("p_partkey") < 1000)
    )
    return trigram_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name",
        threshold=0.6, round_digits=R,
    ).orderBy(F.desc("sim"), F.asc("id_l"), F.asc("id_r"))


def _t15_oracle() -> str:
    from mtg_vector_db_spark.functions.trigram import duckdb_trigram_set_sql

    tris = duckdb_trigram_set_sql("p_name")
    return f"""
    WITH l AS (SELECT p_partkey AS id_l, {tris} AS tris FROM part
               WHERE p_partkey < 500),
    lp AS (SELECT id_l, len(tris) AS n_l, unnest(tris) AS tri FROM l),
    r AS (SELECT p_partkey AS id_r, {tris} AS tris FROM part
          WHERE p_partkey >= 500 AND p_partkey < 1000),
    rp AS (SELECT id_r, len(tris) AS n_r, unnest(tris) AS tri FROM r),
    j AS (SELECT id_l, id_r, n_l, n_r, count(*) AS inter
          FROM lp JOIN rp USING (tri) GROUP BY 1, 2, 3, 4)
    SELECT id_l, id_r,
           round(inter * 1.0 / (n_l + n_r - inter), {R}) AS sim
    FROM j
    WHERE round(inter * 1.0 / (n_l + n_r - inter), {R}) >= 0.6
    ORDER BY sim DESC, id_l ASC, id_r ASC
    """


oracle("t15_fuzzy_name_join", _t15_oracle())


# ---------------------------------------------------------------------------
# Python UDTF surface (SURVEY §2.11): the reference's table-function shape
# (plpgsql RETURNS TABLE, init.sql:159-237) as a registered UDTF composed
# in SQL via LATERAL. Names are synthesized '//' pairs so the oracle can
# replay the expansion with string_split + correlated unnest. UDTF rows
# are Arrow-batched per partition — the expansion is data-parallel, and
# nothing else in the plan leaves the JVM.
# ---------------------------------------------------------------------------
@query("t16_expand_faces_udtf")
def t16_expand_faces_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    (docs,) = tables(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat(
            F.lit("Face"), F.col("doc_id").cast("string"),
            F.lit(" // Back"), F.col("doc_id").cast("string"),
        ).alias("name"),
    ).createOrReplaceTempView("named_docs")
    return spark.sql(
        """
        SELECT n.doc_id, f.face, f.face_index, f.is_back
        FROM named_docs n, LATERAL expand_faces(n.name) f
        ORDER BY n.doc_id, f.face_index
        """
    )


oracle(
    "t16_expand_faces_udtf",
    """
    WITH named AS (
      SELECT doc_id,
             'Face' || CAST(doc_id AS VARCHAR)
               || ' // Back' || CAST(doc_id AS VARCHAR) AS name
      FROM documents WHERE doc_id < 50
    ), split AS (
      SELECT doc_id, string_split(name, '//') AS parts FROM named
    )
    SELECT doc_id, trim(parts[i]) AS face,
           CAST(i - 1 AS INT) AS face_index,
           (i - 1) > 0 AS is_back
    FROM split, unnest(range(1, len(parts) + 1)) AS t(i)
    ORDER BY doc_id, face_index
    """,
)


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate (extension): per language, the share of
# token OCCURRENCES covered by the corpus-global top-100 vocabulary —
# the tokenizer-fit metric run before freezing a vocab. The vocabulary
# is a top-k aggregate (tiny) broadcast into a left-semi-style flag
# join on the exploded tokens; both aggregations key the token, so the
# explode shuffles once. Ties at the top-k boundary break on the token
# string, making the vocab deterministic.
# ---------------------------------------------------------------------------
@query("t17_vocab_coverage")
def t17_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(T.tokens(F.lower(F.col("text")))).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(100)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(False)).cast("long")).alias(
                "covered"
            ),
        )
        .select(
            "lang",
            "n_tokens",
            "covered",
            F.round(1.0 - F.col("covered") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
        .orderBy("lang")
    )


oracle(
    "t17_vocab_coverage",
    f"""
    WITH tok AS (
      SELECT lang, unnest({_TOKS_SQL}) AS token FROM documents
    ), vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS tf FROM tok GROUP BY 1
        ORDER BY tf DESC, token ASC LIMIT 100)
    ), flagged AS (
      SELECT lang, (token IN (SELECT token FROM vocab)) AS in_vocab FROM tok
    )
    SELECT lang, count(*) AS n_tokens,
           CAST(sum(CASE WHEN in_vocab THEN 1 ELSE 0 END) AS BIGINT)
             AS covered,
           round(1.0 - sum(CASE WHEN in_vocab THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS oov_rate
    FROM flagged GROUP BY 1 ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# T19 (extension): character-bigram LM cross-entropy — the CCNet-style
# perplexity filter with a self-trained model instead of an external LM:
# train add-1-smoothed bigram probabilities on the train split, score the
# eval split per language. Model size is bounded by the normalized
# alphabet (≤38² bigrams), so it broadcasts at ANY corpus size; scoring
# is one bigram explode + two broadcast joins + an exact DECIMAL
# aggregation (log₂ values rounded to 12 digits, then summed exactly —
# partition-order-independent, hence oracle-hashable).
# ---------------------------------------------------------------------------
_T19_V = 38  # alphabet: a-z, 0-9, space, '_' (everything else folds to '_')


@query("t19_charlm_crossentropy")
def t19_charlm_crossentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction

    (docs,) = tables(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "_")
    base = docs.select(
        "lang",
        (hash_fraction(F.col("doc_id")) < 0.8).alias("is_train"),
        norm.alias("s"),
    )
    # Guard: F.sequence(1, length-1) on a 0/1-char doc would generate a
    # DESCENDING sequence ([1,0,-1]) and phantom '' bigrams — DuckDB's
    # half-open range(1, len) is empty there (fuzz-parity finding).
    big_idx = F.when(
        F.length("s") >= 2, F.sequence(F.lit(1), F.length("s") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = base.select(
        "lang",
        "is_train",
        F.explode(
            F.transform(big_idx, lambda i: F.col("s").substr(i, F.lit(2)))
        ).alias("big"),
    )
    cnt = bigrams.groupBy("is_train", "lang", "big").agg(
        F.count(F.lit(1)).alias("n")
    )
    model_big = (
        cnt.filter("is_train")
        .groupBy("big")
        .agg(F.sum("n").alias("c"))
    )
    model_pre = model_big.groupBy(F.substring("big", 1, 1).alias("pre")).agg(
        F.sum("c").alias("cp")
    )
    ev = (
        cnt.filter(~F.col("is_train"))
        .groupBy("lang", "big")
        .agg(F.sum("n").alias("e"))
        .withColumn("pre", F.substring("big", 1, 1))
    )
    scored = (
        ev.join(F.broadcast(model_big), "big", "left")
        .join(F.broadcast(model_pre), "pre", "left")
        .withColumn(
            "logp",
            F.round(
                F.log2(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("cp"), F.lit(0)) + _T19_V)
                ),
                12,
            ),
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.sum("e").alias("n_bigrams"),
            # decimal(20,12) × decimal(14,0) → decimal(35,12): fits in
            # precision 38, so the product keeps all 12 fractional
            # digits. (28,12) × bigint would ideally need precision 49;
            # Spark resolves that overflow by REDUCING THE SCALE to 6,
            # silently rounding each term — while DuckDB's same multiply
            # stays exact at scale 12 (t28 fuzz-seed-2007 finding).
            F.sum(
                (
                    F.col("logp").cast("decimal(20,12)")
                    * F.col("e").cast("decimal(14,0)")
                ).cast("decimal(38,12)")
            ).alias("_bits"),
        )
        .select(
            "lang",
            "n_bigrams",
            F.round(-F.col("_bits").cast("double") / F.col("n_bigrams"), 6).alias(
                "bits_per_char"
            ),
        )
        .orderBy("lang")
    )


_T19_FRAC = (
    "list_sum(list_transform(range(1, 9),"
    " i -> (strpos('0123456789abcdef',"
    " substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)"
    " * power(16, 8 - i))) / 4294967296.0"
)

oracle(
    "t19_charlm_crossentropy",
    f"""
    WITH base AS (
      SELECT lang, ({_T19_FRAC}) < 0.8 AS is_train,
             regexp_replace(lower(text), '[^a-z0-9 ]', '_', 'g') AS s
      FROM documents
    ),
    bg AS (
      SELECT lang, is_train, unnest(list_transform(range(1, len(s)),
             i -> substring(s, i, 2))) AS big
      FROM base
    ),
    cnt AS (SELECT is_train, lang, big, count(*) AS n
            FROM bg GROUP BY 1, 2, 3),
    model_big AS (SELECT big, CAST(sum(n) AS BIGINT) AS c
                  FROM cnt WHERE is_train GROUP BY big),
    model_pre AS (SELECT substring(big, 1, 1) AS pre,
                         CAST(sum(c) AS BIGINT) AS cp
                  FROM model_big GROUP BY 1),
    ev AS (SELECT lang, big, substring(big, 1, 1) AS pre,
                  CAST(sum(n) AS BIGINT) AS e
           FROM cnt WHERE NOT is_train GROUP BY 1, 2, 3),
    scored AS (
      SELECT ev.lang, ev.e,
             round(log2((coalesce(mb.c, 0) + 1) * 1.0
                        / (coalesce(mp.cp, 0) + {_T19_V})), 12) AS logp
      FROM ev LEFT JOIN model_big mb USING (big)
              LEFT JOIN model_pre mp USING (pre)
    )
    SELECT lang, CAST(sum(e) AS BIGINT) AS n_bigrams,
           round(-CAST(sum(CAST(logp AS DECIMAL(28,12)) * e) AS DOUBLE)
                 / sum(e), 6) AS bits_per_char
    FROM scored GROUP BY lang ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# T20 (extension): token-distribution drift between splits — Jensen-
# Shannon divergence of train-vs-eval token frequencies per language,
# the monitoring metric a corpus refresh pipeline gates on. One (lang,
# token) aggregation, then a lang-keyed exact-DECIMAL reduction over
# rounded log terms (t19's determinism discipline), so the float math is
# partition-order-independent and oracle-hashable.
# ---------------------------------------------------------------------------
@query("t20_token_drift")
def t20_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction, tokens

    (docs,) = tables(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        (hash_fraction(F.col("doc_id")) < 0.8).alias("is_train"),
        F.explode(tokens(F.lower(F.col("text")))).alias("tok"),
    )
    cnt = base.groupBy("lang", "tok").agg(
        F.sum(F.col("is_train").cast("long")).alias("a"),
        F.sum((~F.col("is_train")).cast("long")).alias("b"),
    )
    totals = cnt.groupBy("lang").agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    j = cnt.join(F.broadcast(totals), "lang")
    p = F.col("a") / F.col("ta")
    q = F.col("b") / F.col("tb")
    m = (p + q) / 2
    term = (
        F.when(F.col("a") > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("b") > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    )
    return (
        j.select("lang", "ta", "tb", F.round(term, 12).alias("t"))
        .groupBy("lang", "ta", "tb")
        .agg(
            F.sum(F.col("t").cast("decimal(28,12)")).alias("_s"),
        )
        .select(
            "lang",
            F.col("ta").alias("n_tokens_train"),
            F.col("tb").alias("n_tokens_eval"),
            F.round(F.col("_s").cast("double") / 2, 6).alias("js_divergence"),
        )
        .orderBy("lang")
    )


oracle(
    "t20_token_drift",
    f"""
    WITH base AS (
      SELECT lang, ({_T19_FRAC}) < 0.8 AS is_train,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                t -> len(t) > 0)) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT lang, tok,
             CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM base GROUP BY 1, 2
    ),
    totals AS (SELECT lang, CAST(sum(a) AS BIGINT) AS ta,
                      CAST(sum(b) AS BIGINT) AS tb
               FROM cnt GROUP BY lang),
    terms AS (
      SELECT cnt.lang, ta, tb,
             round(
               (CASE WHEN a > 0 THEN (a * 1.0 / ta)
                 * log2((a * 1.0 / ta) / (((a * 1.0 / ta) + (b * 1.0 / tb)) / 2))
                 ELSE 0.0 END)
               + (CASE WHEN b > 0 THEN (b * 1.0 / tb)
                 * log2((b * 1.0 / tb) / (((a * 1.0 / ta) + (b * 1.0 / tb)) / 2))
                 ELSE 0.0 END), 12) AS t
      FROM cnt JOIN totals USING (lang)
    )
    SELECT lang, ta AS n_tokens_train, tb AS n_tokens_eval,
           round(CAST(sum(CAST(t AS DECIMAL(28,12))) AS DOUBLE) / 2, 6)
             AS js_divergence
    FROM terms GROUP BY lang, ta, tb ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# T21 (extension): Zipf fit — log-log regression of rank vs frequency
# over the top-200 corpus tokens, the corpus-linguistics sanity check
# (natural text slopes ≈ −1; synthetic/degenerate corpora drift). The
# candidate set is a bounded TakeOrdered (never a global rank over the
# vocabulary); regression terms are rounded then summed through exact
# DECIMAL (t19's discipline) so the closed form is partition-order-
# independent.
# ---------------------------------------------------------------------------
_T21_TOP = 200


@query("t21_zipf_fit")
def t21_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.text import tokens as toks_fn

    (docs,) = tables(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(toks_fn(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(_T21_TOP)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    xy = freq.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log2("rank"), 12).cast("decimal(28,12)").alias("x"),
        F.round(F.log2("freq"), 12).cast("decimal(28,12)").alias("y"),
        F.round(F.log2("rank") * F.log2("freq"), 12)
        .cast("decimal(28,12)")
        .alias("xy"),
        F.round(F.log2("rank") * F.log2("rank"), 12)
        .cast("decimal(28,12)")
        .alias("xx"),
        F.round(F.log2("freq") * F.log2("freq"), 12)
        .cast("decimal(28,12)")
        .alias("yy"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
        F.sum("yy").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return agg.select(
        F.col("n").alias("n_tokens_fit"),
        F.round(cov_n / var_x, 6).alias("zipf_slope"),
        F.round(cov_n * cov_n / (var_x * var_y), 6).alias("r2"),
    )


oracle(
    "t21_zipf_fit",
    f"""
    WITH freq AS (
      SELECT tok, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  t -> len(t) > 0)) AS tok
        FROM documents)
      GROUP BY tok ORDER BY freq DESC, tok ASC LIMIT {_T21_TOP}
    ),
    ranked AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
      FROM freq
    ),
    terms AS (
      SELECT CAST(round(log2(rank), 12) AS DECIMAL(28,12)) AS x,
             CAST(round(log2(freq), 12) AS DECIMAL(28,12)) AS y,
             CAST(round(log2(rank) * log2(freq), 12) AS DECIMAL(28,12)) AS xy,
             CAST(round(log2(rank) * log2(rank), 12) AS DECIMAL(28,12)) AS xx,
             CAST(round(log2(freq) * log2(freq), 12) AS DECIMAL(28,12)) AS yy
      FROM ranked
    ),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(xy) AS sxy, sum(xx) AS sxx, sum(yy) AS syy
          FROM terms)
    SELECT n AS n_tokens_fit,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS zipf_slope,
           round(pow(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS r2
    FROM s
    """,
)


# ---------------------------------------------------------------------------
# Within-document repetition gate (Gopher §A1.1 analog; extension — the
# reference has no per-document quality screen). Cross-document dedup is
# the d-family; this is the intra-document arm a training pipeline runs
# in the same quality pass as t08.
# ---------------------------------------------------------------------------
@query("t22_doc_repetition")
def t22_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    prof = doc_repetition_profile(docs)
    return prof.select(
        "doc_id",
        F.round("top2_frac", R).alias("top2_frac"),
        F.round("top3_frac", R).alias("top3_frac"),
        F.round("dup5_frac", R).alias("dup5_frac"),
        "keep",
    ).orderBy("doc_id")


# CTE chain shared with p31's curation funnel (ends at rep_prof:
# doc_id → unrounded top2/top3/dup5).
T22_PROF_CTES = f"""tk AS (SELECT doc_id, {_TOKS_L} AS t FROM documents),
    grams AS (
      SELECT doc_id, 2 AS n, t[i] || ' ' || t[i+1] AS gram
      FROM tk, unnest(range(1, len(t))) AS u(i)
      UNION ALL
      SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      FROM tk, unnest(range(1, len(t) - 1)) AS u(i)
      UNION ALL
      SELECT doc_id, 5,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                  || ' ' || t[i+4]
      FROM tk, unnest(range(1, len(t) - 3)) AS u(i)
    ),
    counts AS (
      SELECT doc_id, n, gram, len(gram) - (n - 1) AS gchars,
             count(*) AS cnt
      FROM grams GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id, n ORDER BY cnt DESC, gram DESC) AS rn
      FROM counts
    ),
    per_n AS (
      SELECT doc_id, n,
             sum(CASE WHEN cnt > 1 THEN cnt * gchars ELSE 0 END) AS dup_chars,
             sum(cnt * gchars) AS tot_chars,
             max(CASE WHEN rn = 1 THEN cnt * gchars END) AS top_chars
      FROM ranked GROUP BY 1, 2
    ),
    rep_prof AS (
      SELECT doc_id,
        coalesce(max(CASE WHEN n = 2
          THEN CAST(top_chars AS DOUBLE) / tot_chars END), 0.0) AS top2,
        coalesce(max(CASE WHEN n = 3
          THEN CAST(top_chars AS DOUBLE) / tot_chars END), 0.0) AS top3,
        coalesce(max(CASE WHEN n = 5
          THEN CAST(dup_chars AS DOUBLE) / tot_chars END), 0.0) AS dup5
      FROM per_n GROUP BY 1
    )"""

oracle(
    "t22_doc_repetition",
    f"""
    WITH {T22_PROF_CTES}
    -- LEFT JOIN + coalesce: rep_prof has no row for docs with < 2 tokens
    -- (no grams at all); the operator is total over its input and scores
    -- them 0.0/0.0/0.0 keep=true, so the oracle defaults the same way.
    SELECT d.doc_id, round(coalesce(top2, 0.0), {R}) AS top2_frac,
           round(coalesce(top3, 0.0), {R}) AS top3_frac,
           round(coalesce(dup5, 0.0), {R}) AS dup5_frac,
           coalesce(top2 <= 0.20 AND top3 <= 0.18 AND dup5 <= 0.30, true)
             AS keep
    FROM documents d LEFT JOIN rep_prof p USING (doc_id)
    ORDER BY d.doc_id
    """,
)


# ---------------------------------------------------------------------------
# T23: one BPE-training iteration — frequency-weighted adjacent symbol-
# pair counts over word types (Sennrich et al. 2016). The top row is the
# pair a tokenizer trainer would merge first. Two map-side-combinable
# shuffles (word types, then pairs); the word-type table is the classic
# BPE optimization that keeps pair counting off the raw token stream.
# t11 tokenizes with a fixed BPE-ish regex; this is the *training* side.
# ---------------------------------------------------------------------------
@query("t23_bpe_merge_pairs")
def t23_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    char_pairs = F.when(
        F.length("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("tok") - 1),
            lambda i: F.substr(F.col("tok"), i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select("freq", F.explode(char_pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


oracle(
    "t23_bpe_merge_pairs",
    f"""
    WITH words AS (
      SELECT tok, count(*) AS freq
      FROM (SELECT unnest({_TOKS_L}) AS tok FROM documents)
      GROUP BY tok
    ),
    pairs AS (
      SELECT substring(tok, i, 2) AS pair, freq
      FROM words, unnest(range(1, len(tok))) AS u(i)
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# T24: train + apply a hashed-bag-of-words Naive Bayes language
# classifier wholly in-engine (operators/nbayes.py) — the fastText-style
# cheap-classifier filter stage of a training-data pipeline, with exact
# DECIMAL log-prob scores so even the argmax is engine-portable. Train
# on doc_id % 5 != 0, evaluate on the held-out fifth; output is the
# confusion matrix against the labeled lang column (t09's marker-based
# lang-id is the untrained counterpart).
# ---------------------------------------------------------------------------
@query("t24_nb_langid")
def t24_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.nbayes import nb_train_apply

    (docs,) = tables(spark, sf_dir, "documents")
    pred = nb_train_apply(docs, F.col("doc_id") % 5 != 0)
    return (
        pred.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


_T24_BUCKET = (
    "CAST(list_sum(list_transform(range(1, 9), i -> "
    "(strpos('0123456789abcdef', substring(md5(tok), i, 1)) - 1)"
    " * power(16, 8 - i))) AS BIGINT) % 64"
)
# CTE chain shared with p32's margin sampling (ends at scored:
# (doc_id, cls, score) with exact DECIMAL scores over held-out docs).
T24_SCORE_CTES = f"""base AS (
      SELECT doc_id, lang, (doc_id % 5 <> 0) AS is_tr, {_TOKS_L} AS toks
      FROM documents
    ),
    tok_tr AS (
      SELECT lang AS cls, {_T24_BUCKET} AS bucket
      FROM (SELECT lang, unnest(toks) AS tok FROM base WHERE is_tr)
    ),
    class_docs AS (
      SELECT lang AS cls, count(*) AS docs_c FROM base WHERE is_tr GROUP BY 1
    ),
    tot AS (SELECT sum(docs_c) AS docs_tot, count(*) AS n_classes
            FROM class_docs),
    priors AS (
      SELECT cls, CAST(round(ln((docs_c + 1.0) / (docs_tot + n_classes)), 12)
                       AS DECIMAL(28,12)) AS prior
      FROM class_docs, tot
    ),
    cell AS (SELECT cls, bucket, count(*) AS cb_cnt FROM tok_tr GROUP BY 1, 2),
    ccnt AS (SELECT cls, count(*) AS c_cnt FROM tok_tr GROUP BY 1),
    grid AS (SELECT cls, c_cnt, i AS bucket
             FROM ccnt, unnest(range(0, 64)) AS u(i)),
    lik AS (
      SELECT g.cls, g.bucket,
             CAST(round(ln((coalesce(cb_cnt, 0) + 1.0) / (c_cnt + 64.0)), 12)
                  AS DECIMAL(28,12)) AS loglik
      FROM grid g LEFT JOIN cell ON g.cls = cell.cls AND g.bucket = cell.bucket
    ),
    tok_te AS (
      SELECT doc_id, {_T24_BUCKET} AS bucket
      FROM (SELECT doc_id, unnest(toks) AS tok FROM base WHERE NOT is_tr)
    ),
    doc_cls AS (
      SELECT t.doc_id, l.cls, sum(l.loglik) AS s
      FROM tok_te t JOIN lik l USING (bucket) GROUP BY 1, 2
    ),
    scored AS (SELECT doc_id, d.cls, s + prior AS score
               FROM doc_cls d JOIN priors USING (cls)
               UNION ALL
               -- prior-only fallback: held-out docs with zero tokens
               -- still get one row per class (operator totality)
               SELECT doc_id, cls, prior AS score
               FROM (SELECT doc_id FROM base
                     WHERE NOT is_tr AND coalesce(len(toks), 0) = 0)
               CROSS JOIN priors)"""

oracle(
    "t24_nb_langid",
    f"""
    WITH {T24_SCORE_CTES},
    pred AS (
      SELECT doc_id, cls AS predicted FROM (
        SELECT doc_id, cls, row_number() OVER (
                 PARTITION BY doc_id ORDER BY score DESC, cls DESC) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT b.lang, p.predicted, count(*) AS n
    FROM pred p JOIN base b USING (doc_id)
    GROUP BY 1, 2 ORDER BY lang, predicted
    """,
)


# ---------------------------------------------------------------------------
# T25: per-source distinguishing terms by TF-IDF — t13 ranks the global
# vocabulary; this ranks what makes each source distinct (the corpus-
# triage view a data curator reads before weighting sources). Token
# shuffle with map-side combine, document-frequency table joined back on
# the token key, top-5 per source via a source-partitioned window (rank
# on the ROUNDED score so the ordering is engine-portable).
# ---------------------------------------------------------------------------
@query("t25_tfidf_terms")
def t25_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", "source",
        F.explode(T.tokens(F.lower(F.col("text")))).alias("token"),
    )
    df_tbl = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    tf_tbl = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scored = tf_tbl.join(df_tbl, "token").select(
        "source", "token", "tf", "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), R
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "token", "tf", "df", "tfidf")
        .orderBy("source", F.desc("tfidf"), "token")
    )


oracle(
    "t25_tfidf_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest({_TOKS_L}) AS token FROM documents
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    tfq AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    scored AS (
      SELECT source, tfq.token, tf, df,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), {R}) AS tfidf
      FROM tfq JOIN dfq ON tfq.token = dfq.token CROSS JOIN n
    )
    SELECT source, token, tf, df, tfidf FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY tfidf DESC, token ASC) AS rn
      FROM scored) WHERE rn <= 5
    ORDER BY source, tfidf DESC, token
    """,
)


# ---------------------------------------------------------------------------
# T26: weak-supervision diagnostic — treat each language's marker list
# as a labeling function (fires when any marker appears, else abstains)
# and report the standard Snorkel-style table: per-LF coverage and
# accuracy-when-fired against the gold lang label, plus the ALL row for
# the majority-vote model (t09's argmax, 'und' = abstain). On this
# fixture the table reads exactly as the diagnostic is meant to: four
# dead LFs (zero coverage, NULL accuracy) and one over-firing LF whose
# precision sits at the class prior — the dead-LF/over-firing-LF
# failure modes this report exists to catch. One scan, one 1-row
# aggregate, reshaped to rows via the native unpivot.
# ---------------------------------------------------------------------------
@query("t26_weak_label_report")
def t26_weak_label_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    scores = TS.lang_scores(F.col("text"))
    base = docs.select(
        "lang",
        TS.lang_id(F.col("text")).alias("pred"),
        *[
            (scores[lg] > 0).alias(f"fired_{lg}")
            for lg in TS.LANG_MARKERS
        ],
    )
    aggs = []
    for lg in TS.LANG_MARKERS:
        fired = F.col(f"fired_{lg}").cast("long")
        correct = (F.col(f"fired_{lg}") & (F.col("lang") == lg)).cast(
            "long"
        )
        aggs.append(
            F.round(F.sum(fired) / F.count(F.lit(1)), 6).alias(
                f"cov_{lg}"
            )
        )
        aggs.append(
            F.round(
                F.when(
                    F.sum(fired) > 0, F.sum(correct) / F.sum(fired)
                ),
                6,
            ).alias(f"acc_{lg}")
        )
    voted = (F.col("pred") != "und").cast("long")
    hit = ((F.col("pred") != "und") & (F.col("pred") == F.col("lang"))).cast(
        "long"
    )
    aggs.append(
        F.round(F.sum(voted) / F.count(F.lit(1)), 6).alias("cov_ALL")
    )
    aggs.append(F.round(F.sum(hit) / F.sum(voted), 6).alias("acc_ALL"))
    wide = base.agg(*aggs)
    names = list(TS.LANG_MARKERS) + ["ALL"]
    pairs = wide.unpivot(
        [],
        [c for lg in names for c in (f"cov_{lg}", f"acc_{lg}")],
        "metric",
        "value",
    )
    return (
        pairs.select(
            F.regexp_extract("metric", r"^(cov|acc)_(.*)$", 2).alias("lf"),
            F.regexp_extract("metric", r"^(cov|acc)_(.*)$", 1).alias("m"),
            "value",
        )
        .groupBy("lf")
        .agg(
            F.max(F.when(F.col("m") == "cov", F.col("value"))).alias(
                "coverage"
            ),
            F.max(F.when(F.col("m") == "acc", F.col("value"))).alias(
                "accuracy"
            ),
        )
        .orderBy("lf")
    )


def _t26_oracle() -> str:
    score = {
        lang: f"len(list_filter({_TOKS_L}, t -> list_contains(['"
        + "','".join(markers)
        + "'], t)))"
        for lang, markers in TS.LANG_MARKERS.items()
    }
    per_lf = " UNION ALL ".join(
        f"""SELECT '{lg}' AS lf,
               round(sum(CASE WHEN {score[lg]} > 0 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS coverage,
               round(CASE WHEN sum(CASE WHEN {score[lg]} > 0
                                     THEN 1 ELSE 0 END) > 0
                          THEN sum(CASE WHEN {score[lg]} > 0 AND lang = '{lg}'
                                    THEN 1 ELSE 0 END) * 1.0
                               / sum(CASE WHEN {score[lg]} > 0
                                      THEN 1 ELSE 0 END)
                          END, 6) AS accuracy
        FROM documents"""
        for lg in TS.LANG_MARKERS
    )
    return f"""
    SELECT * FROM (
      {per_lf}
      UNION ALL
      SELECT 'ALL',
             round(sum(CASE WHEN pred <> 'und' THEN 1 ELSE 0 END) * 1.0
                   / count(*), 6),
             round(sum(CASE WHEN pred <> 'und' AND pred = lang
                        THEN 1 ELSE 0 END) * 1.0
                   / sum(CASE WHEN pred <> 'und' THEN 1 ELSE 0 END), 6)
      FROM (SELECT lang, {_duck_lang_case()} AS pred FROM documents)
    ) ORDER BY lf
    """


oracle("t26_weak_label_report", _t26_oracle())


# ---------------------------------------------------------------------------
# T27: Heaps'-law vocabulary growth — V(n) ≈ K·n^β fit over ten corpus
# prefixes, the companion diagnostic to t21's Zipf fit (β near 0 = the
# vocabulary has saturated — synthetic/closed corpora; β ≈ 0.4-0.6 =
# natural text). ONE token shuffle: per-token first-occurrence doc →
# prefix bucket → cumulative vocab per prefix → log-log regression with
# the t21 exact-DECIMAL sums (no per-prefix rescans).
# ---------------------------------------------------------------------------
@query("t27_heaps_fit")
def t27_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    n_docs = docs.count()
    step = max(n_docs // 10, 1)
    tok = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    )
    first = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    bucket = F.least(F.col("first_doc") / step, F.lit(9)).cast("int")
    per_bucket = (
        first.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    # Token totals per prefix boundary (map-side; same single pass).
    tok_bucket = tok.select(
        F.least(F.col("doc_id") / step, F.lit(9)).cast("int").alias("b")
    ).groupBy("b").agg(F.count(F.lit(1)).alias("new_tokens"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        per_bucket.join(tok_bucket, "b", "full")
        .select(
            "b",
            F.sum(F.coalesce("new_tokens", F.lit(0))).over(w).alias("n"),
            F.sum(F.coalesce("new_types", F.lit(0))).over(w).alias("v"),
        )
    )
    x = F.round(F.log2("n"), 12).cast("decimal(28,12)")
    y = F.round(F.log2("v"), 12).cast("decimal(28,12)")
    xy = F.round(F.log2("n") * F.log2("v"), 12).cast("decimal(28,12)")
    xx = F.round(F.log2("n") * F.log2("n"), 12).cast("decimal(28,12)")
    agg = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(xy).alias("sxy"),
        F.sum(xx).alias("sxx"),
        F.max("v").alias("vocab_size"),
        F.max("n").alias("total_tokens"),
    )
    k = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return agg.select(
        F.col("k").alias("n_points"),
        "total_tokens",
        "vocab_size",
        # + 0.0 canonicalizes IEEE negative zero (a saturated vocabulary
        # fits slope -0.0 in one engine and +0.0 in the other).
        (F.round(beta, 6) + F.lit(0.0)).alias("heaps_beta"),
    )


oracle(
    "t27_heaps_fit",
    f"""
    WITH nd AS (SELECT greatest(count(*) // 10, 1) AS step FROM documents),
    tok AS (SELECT doc_id, unnest({_TOKS_L}) AS tok FROM documents),
    first AS (SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok),
    -- floor before CAST: DuckDB's double→INT cast rounds to nearest
    -- while Spark's truncates, so bucket assignment would diverge on
    -- any x.5+ quotient without the explicit floor (round-3 ADVICE fix).
    pb AS (SELECT least(CAST(floor(first_doc * 1.0 / step) AS INT), 9) AS b,
                  count(*) AS new_types
           FROM first CROSS JOIN nd GROUP BY 1),
    tb AS (SELECT least(CAST(floor(doc_id * 1.0 / step) AS INT), 9) AS b,
                  count(*) AS new_tokens
           FROM tok CROSS JOIN nd GROUP BY 1),
    pts AS (
      SELECT b,
             sum(coalesce(new_tokens, 0)) OVER (
               ORDER BY b ROWS UNBOUNDED PRECEDING) AS n,
             sum(coalesce(new_types, 0)) OVER (
               ORDER BY b ROWS UNBOUNDED PRECEDING) AS v
      FROM pb FULL JOIN tb USING (b)
    ),
    terms AS (
      SELECT CAST(round(log2(n), 12) AS DECIMAL(28,12)) AS x,
             CAST(round(log2(v), 12) AS DECIMAL(28,12)) AS y,
             CAST(round(log2(n) * log2(v), 12) AS DECIMAL(28,12)) AS xy,
             CAST(round(log2(n) * log2(n), 12) AS DECIMAL(28,12)) AS xx,
             v, n
      FROM pts
    ),
    s AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
                 sum(xy) AS sxy, sum(xx) AS sxx,
                 max(v) AS vocab_size, max(n) AS total_tokens
          FROM terms)
    SELECT k AS n_points, CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(vocab_size AS BIGINT) AS vocab_size,
           round((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             + 0.0 AS heaps_beta
    FROM s
    """,
)


# ---------------------------------------------------------------------------
# T28 (extension): CCNet quality buckets — per-document char-LM
# perplexity, docs ranked per language and cut into head/middle/tail
# terciles (Wenzek et al. 2020 release exactly these three bands; head
# is the usual pre-training slice). Reuses t19's self-trained add-1
# char-bigram model (train split = hash_fraction < 0.8, scored docs =
# the eval split with ≥1 bigram). Exact-DECIMAL per-doc bit sums make
# bpc identical across engines; ranks break ties on doc_id, so the
# tercile cuts are engine-exact. Shape: bounded-alphabet model
# broadcast, one (doc, bigram) reduce, one lang-keyed rank window.
# ---------------------------------------------------------------------------
@query("t28_ccnet_buckets")
def t28_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.text import hash_fraction

    (docs,) = tables(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "_")
    base = docs.select(
        "doc_id",
        "lang",
        (hash_fraction(F.col("doc_id")) < 0.8).alias("is_train"),
        norm.alias("s"),
    )
    # Same descending-sequence guard as t19 (fuzz-parity finding).
    big_idx = F.when(
        F.length("s") >= 2, F.sequence(F.lit(1), F.length("s") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = base.select(
        "doc_id",
        "lang",
        "is_train",
        F.explode(
            F.transform(big_idx, lambda i: F.col("s").substr(i, F.lit(2)))
        ).alias("big"),
    )
    model_big = (
        bigrams.filter("is_train")
        .groupBy("big")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    model_pre = model_big.groupBy(
        F.substring("big", 1, 1).alias("pre")
    ).agg(F.sum("c").alias("cp"))
    ev = (
        bigrams.filter(~F.col("is_train"))
        .groupBy("doc_id", "lang", "big")
        .agg(F.count(F.lit(1)).alias("e"))
        .withColumn("pre", F.substring("big", 1, 1))
    )
    logp = F.round(
        F.log2(
            (F.coalesce(F.col("c"), F.lit(0)) + 1)
            / (F.coalesce(F.col("cp"), F.lit(0)) + _T19_V)
        ),
        12,
    )
    per_doc = (
        ev.join(F.broadcast(model_big), "big", "left")
        .join(F.broadcast(model_pre), "pre", "left")
        .withColumn("logp", logp)
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("e").alias("n_big"),
            # Same exact-product discipline as t19: (20,12) × (14,0) →
            # (35,12) fits precision 38 with no scale reduction, so each
            # logp×e term keeps all 12 fractional digits like DuckDB's
            # DECIMAL(38,12) multiply does.
            F.sum(
                (
                    F.col("logp").cast("decimal(20,12)")
                    * F.col("e").cast("decimal(14,0)")
                ).cast("decimal(38,12)")
            ).alias("_bits"),
        )
        .select(
            "doc_id",
            "lang",
            # Integer-micro-bit quotient (see r05's integer-cents note):
            # round(exact_decimal / n, 6) can land on a true decimal tie,
            # where Spark rounds the shortest repr and DuckDB the binary
            # value. Rounding (-_bits × 1e6) to an exact integer first and
            # then rounding the integer ratio keeps every tie on an
            # exactly-representable .5, which both engines round away
            # from zero identically (t28 fuzz-seed-2007 finding).
            F.round(
                F.round(
                    F.round(-F.col("_bits") * 1000000)
                    .cast("double")
                    / F.col("n_big")
                )
                / 1000000,
                6,
            ).alias("bpc"),
        )
    )
    w = Window.partitionBy("lang").orderBy("bpc", "doc_id")
    nlang = Window.partitionBy("lang")
    bucketed = per_doc.select(
        "lang",
        "bpc",
        F.floor(
            (F.row_number().over(w) - 1) * 3 / F.count(F.lit(1)).over(nlang)
        ).alias("bucket"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # Same integer-micro tie guard as bpc above: the decimal sum
            # × 1e6 is an exact integer, so the average's round-to-6 tie
            # is an exactly-representable .5 in both engines.
            F.round(
                F.round(
                    (F.sum(F.col("bpc").cast("decimal(18,6)")) * 1000000)
                    .cast("double")
                    / F.count(F.lit(1))
                )
                / 1000000,
                6,
            ).alias("avg_bpc"),
        )
        .orderBy("lang", "bucket")
    )


oracle(
    "t28_ccnet_buckets",
    f"""
    WITH base AS (
      SELECT doc_id, lang, ({_T19_FRAC}) < 0.8 AS is_train,
             regexp_replace(lower(text), '[^a-z0-9 ]', '_', 'g') AS s
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang, is_train,
             unnest(list_transform(range(1, len(s)),
                    i -> substring(s, i, 2))) AS big
      FROM base
    ),
    model_big AS (SELECT big, count(*) AS c FROM bg WHERE is_train
                  GROUP BY big),
    model_pre AS (SELECT substring(big, 1, 1) AS pre,
                         CAST(sum(c) AS BIGINT) AS cp
                  FROM model_big GROUP BY 1),
    ev AS (SELECT doc_id, lang, big, substring(big, 1, 1) AS pre,
                  count(*) AS e
           FROM bg WHERE NOT is_train GROUP BY 1, 2, 3, 4),
    per_doc AS (
      -- Integer-micro-bit quotient: exact decimal sum scaled to integer
      -- micro-bits before the divide, so round-to-6 ties land on an
      -- exactly-representable .5 (mirrors the Spark plan).
      SELECT doc_id, lang,
             round(round(CAST(round(-sum(CAST(round(log2(
                       (coalesce(mb.c, 0) + 1) * 1.0
                       / (coalesce(mp.cp, 0) + {_T19_V})), 12)
                     AS DECIMAL(28,12)) * e) * 1000000) AS DOUBLE)
                   / sum(e)) / 1000000, 6) AS bpc
      FROM ev LEFT JOIN model_big mb USING (big)
              LEFT JOIN model_pre mp USING (pre)
      GROUP BY 1, 2
    ),
    bucketed AS (
      SELECT lang, bpc,
             CAST(floor((row_number() OVER (
                     PARTITION BY lang ORDER BY bpc, doc_id) - 1) * 3.0
                   / (count(*) OVER (PARTITION BY lang))) AS BIGINT)
               AS bucket
      FROM per_doc
    )
    SELECT lang, bucket, count(*) AS n_docs,
           round(round(CAST(sum(CAST(bpc AS DECIMAL(18,6))) * 1000000
                            AS DOUBLE) / count(*)) / 1000000, 6) AS avg_bpc
    FROM bucketed GROUP BY 1, 2 ORDER BY lang, bucket
    """,
)


# ---------------------------------------------------------------------------
# T29 (extension): HyperLogLog distinct-text cardinality per source —
# the sketch that replaces exact COUNT(DISTINCT) at 100 TB, where the
# exact form shuffles every distinct value and the sketch shuffles at
# most groups × 4096 register rows (map-side combined max). Registers
# are md5-derived (operators/sketches.py), so re-runs never drift and
# the DuckDB oracle replays the registers AND the estimate bit-exactly
# (Spark's own approx_count_distinct is HLL too, but its hashing is not
# SQL-replayable — the sketch here is the auditable twin). The exact
# distinct rides along as the accuracy report; production drops it.
# ---------------------------------------------------------------------------
@query("t29_hll_source_cardinality")
def t29_hll_source_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    nn = docs.filter(F.col("text").isNotNull())
    regs = hll_registers(nn, F.col("text"), ["source"])
    est = hll_estimate(regs, ["source"])
    # Distinct over the 128-bit fingerprint, not the raw text: the
    # comparison column must not shuffle multi-KB documents as keys
    # (the p19/p24 discipline; pinned by the raw-text plan gate).
    exact = nn.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_exact"),
    )
    # Integer-milli error ratio (the r05 integer-ratio tie guard): the
    # estimate has 3 dp, so est×1000 and exact×1000 are exact integers
    # and the rounded relative error can only tie on representable .5s.
    diff = F.abs(
        F.round(F.col("n_hll") * 1000).cast("long")
        - F.col("n_exact") * 1000
    )
    rel = F.round(
        F.round(diff * F.lit(1000000.0) / (F.col("n_exact") * 1000))
        / 1000000,
        6,
    )
    return (
        exact.join(est, "source")
        .select(
            "source",
            "n_rows",
            "n_exact",
            "n_hll",
            F.when(F.col("n_exact") > 0, rel).alias("rel_err"),
        )
        .orderBy("source")
    )


def _t29_oracle() -> str:
    from mtg_vector_db_spark.operators.sketches import hll_oracle_sql

    est = hll_oracle_sql(
        "text", "(SELECT * FROM documents WHERE text IS NOT NULL)", "source"
    )
    return f"""
    WITH est AS ({est}),
    ex AS (
      SELECT source, count(*) AS n_rows,
             count(DISTINCT md5(text)) AS n_exact
      FROM documents WHERE text IS NOT NULL GROUP BY 1
    )
    SELECT source, n_rows, n_exact, n_hll,
           CASE WHEN n_exact > 0 THEN
             round(round(abs(CAST(round(n_hll * 1000) AS BIGINT)
                             - n_exact * 1000) * 1000000.0
                         / (n_exact * 1000)) / 1000000, 6)
           END AS rel_err
    FROM ex JOIN est USING (source)
    ORDER BY source
    """


oracle("t29_hll_source_cardinality", _t29_oracle())


# ---------------------------------------------------------------------------
# T30 (extension): count-min heavy hitters — the frequency sketch for
# token / n-gram / URL hot-list probes at corpus scale. The token
# stream is shuffled ONCE (the exact count the report compares
# against); the sketch itself is depth×width = 4×1024 cells (32 KiB),
# merges across shards by per-cell SUM, and estimates are a broadcast
# map-side min over 4 cells. Estimates are ≥ exact by construction;
# the report shows the overestimate on the true top-15. All integer
# arithmetic on md5-derived cells — no float parity surface at all.
# ---------------------------------------------------------------------------
@query("t30_cms_heavy_hitters")
def t30_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("token")
    )
    # Pinned: the token-count relation feeds the sketch build, the
    # probe set, AND the report join — one token shuffle, shared by all
    # three (the p24 pattern; without it Spark re-runs the groupBy per
    # consumer). pin releases the blocks with the query's refs.
    from mtg_vector_db_spark.session import pin

    tc = pin(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    sketch = cms_build(tc)
    est = cms_estimate(tc, sketch)
    return (
        tc.join(est, "token")
        .orderBy(F.desc("cnt"), "token")
        .limit(15)
        .select(
            "token",
            F.col("cnt").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


oracle(
    "t30_cms_heavy_hitters",
    f"""
    WITH toks AS (SELECT unnest({_TOKS_L}) AS token FROM documents),
    tc AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    rws AS (SELECT unnest(range(4)) AS row),
    cells AS (
      SELECT rws.row,
             CAST(concat('0x', substring(md5(concat(
                    CAST(rws.row AS VARCHAR), ':', token)), 1, 8))
                  AS BIGINT) % 1024 AS cell,
             cnt
      FROM tc CROSS JOIN rws
    ),
    sk AS (SELECT row, cell, sum(cnt) AS total FROM cells GROUP BY 1, 2),
    probe AS (
      SELECT tc.token, tc.cnt, min(sk.total) AS cms_est
      FROM tc CROSS JOIN rws
      JOIN sk ON sk.row = rws.row
             AND sk.cell = CAST(concat('0x', substring(md5(concat(
                    CAST(rws.row AS VARCHAR), ':', tc.token)), 1, 8))
                  AS BIGINT) % 1024
      GROUP BY 1, 2
    )
    SELECT token, cnt AS exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - cnt AS BIGINT) AS overestimate
    FROM probe ORDER BY exact_cnt DESC, token LIMIT 15
    """,
)


# ---------------------------------------------------------------------------
# T31 (extension): distinct-n diversity — the standard text-diversity
# report (distinct-1/2/3: unique n-grams over total n-gram occurrences
# per source; low values flag templated / repetitive corpora and mode
# collapse in synthetic data). One generator explodes all three gram
# sizes tagged with n, so ONE shuffle (groupBy source + conditional
# distinct aggs) serves all six measures. Grams fold to md5-prefix
# bigints before the shuffle — the SAME function both engines run, so
# countDistinct is exact-parity by construction AND the shuffle moves
# fixed-width keys, not strings.
# ---------------------------------------------------------------------------
_T31_NS = (1, 2, 3)


@query("t31_ngram_diversity")
def t31_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.session import widen

    (docs,) = tables(spark, sf_dir, "documents")

    def tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = widen(docs).select(
        "source",
        F.explode(
            F.concat(
                *[
                    F.transform(TS.word_ngrams(F.col("text"), n), tag(n))
                    for n in _T31_NS
                ]
            )
        ).alias("x"),
    ).select(
        "source",
        F.col("x.n").alias("n"),
        F.conv(F.substring(F.md5(F.col("x.g")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    aggs = []
    for n in _T31_NS:
        aggs.append(
            F.count(F.when(F.col("n") == n, 1)).alias(f"total_{n}")
        )
        aggs.append(
            F.countDistinct(
                F.when(F.col("n") == n, F.col("h"))
            ).alias(f"distinct_{n}")
        )
    out = tagged.groupBy("source").agg(*aggs)
    ratios = [
        F.round(
            F.col(f"distinct_{n}")
            / F.greatest(F.col(f"total_{n}"), F.lit(1)).cast("double"),
            6,
        ).alias(f"distinct_{n}_ratio")
        for n in _T31_NS
    ]
    return out.select(
        "source",
        *[F.col(f"total_{n}") for n in _T31_NS],
        *[F.col(f"distinct_{n}") for n in _T31_NS],
        *ratios,
    ).orderBy("source")


def _t31_oracle() -> str:
    h = (
        "CAST(list_sum(list_transform(range(1, 16),"
        " i -> (strpos('0123456789abcdef', substring(md5(g), i, 1)) - 1)"
        " * power(16.0, 15 - i))) AS BIGINT)"
    )
    grams = []
    for n in _T31_NS:
        if n == 1:
            g = f"SELECT source, 1 AS n, unnest({_TOKS_L}) AS g FROM documents"
        else:
            g = (
                f"SELECT source, {n} AS n, unnest(CASE WHEN len({_TOKS_L}) >= {n} THEN "
                f"list_transform(range(1, len({_TOKS_L}) - {n} + 2),"
                f" i -> array_to_string(list_slice({_TOKS_L}, i, i + {n} - 1), ' '))"
                f" ELSE [] END) AS g FROM documents"
            )
        grams.append(g)
    union = " UNION ALL ".join(grams)
    cols = []
    for n in _T31_NS:
        cols.append(f"count(CASE WHEN n = {n} THEN 1 END) AS total_{n}")
        cols.append(
            f"count(DISTINCT CASE WHEN n = {n} THEN {h} END) AS distinct_{n}"
        )
    ratio = ", ".join(
        f"round(distinct_{n} * 1.0 / greatest(total_{n}, 1), 6)"
        f" AS distinct_{n}_ratio"
        for n in _T31_NS
    )
    tot = ", ".join(
        f"CAST(total_{n} AS BIGINT) AS total_{n}" for n in _T31_NS
    )
    dis = ", ".join(
        f"CAST(distinct_{n} AS BIGINT) AS distinct_{n}" for n in _T31_NS
    )
    return f"""
    WITH grams AS ({union}),
    agg AS (SELECT source, {', '.join(cols)} FROM grams GROUP BY source)
    SELECT source, {tot}, {dis}, {ratio} FROM agg ORDER BY source
    """


oracle("t31_ngram_diversity", _t31_oracle())


# ---------------------------------------------------------------------------
# T32 (extension): robust length-outlier screen — per-source median /
# MAD of document length and the count of docs beyond 3×MAD (the
# robust cousin of z-score gates: crawler glitches and truncated docs
# don't inflate the cut-off the way they inflate a stddev). Two keyed
# aggregations on source + one broadcast join of the #sources-row
# stats table back onto the corpus; all arithmetic is exact in
# float64 (integer lengths, .5-interpolated medians), so there is no
# rounding tie for engines to disagree on.
# ---------------------------------------------------------------------------
@query("t32_length_outliers")
def t32_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("median_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    dev = docs.join(F.broadcast(med), "source").select(
        "source",
        "n_docs",
        "median_chars",
        F.abs(F.col("n_chars") - F.col("median_chars")).alias("dev"),
    )
    mad = dev.groupBy("source", "n_docs", "median_chars").agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad_chars")
    )
    flagged = dev.join(
        F.broadcast(mad.select("source", "mad_chars")), "source"
    ).groupBy("source").agg(
        F.sum(
            F.when(F.col("dev") > 3.0 * F.col("mad_chars"), 1).otherwise(0)
        ).alias("n_outliers")
    )
    return (
        mad.join(flagged, "source")
        .select(
            "source",
            "n_docs",
            F.round(F.col("median_chars"), 1).alias("median_chars"),
            F.round(F.col("mad_chars"), 1).alias("mad_chars"),
            "n_outliers",
            F.round(
                F.col("n_outliers") / F.col("n_docs").cast("double"), 6
            ).alias("outlier_ratio"),
        )
        .orderBy("source")
    )


oracle(
    "t32_length_outliers",
    """
    WITH med AS (
      SELECT source, quantile_cont(n_chars, 0.5) AS median_chars,
             count(*) AS n_docs
      FROM documents GROUP BY source
    ),
    dev AS (
      SELECT d.source, med.n_docs, med.median_chars,
             abs(d.n_chars - med.median_chars) AS dev
      FROM documents d JOIN med USING (source)
    ),
    mad AS (
      SELECT source, any_value(n_docs) AS n_docs,
             any_value(median_chars) AS median_chars,
             quantile_cont(dev, 0.5) AS mad_chars
      FROM dev GROUP BY source
    ),
    fl AS (
      SELECT dev.source,
             sum(CASE WHEN dev.dev > 3.0 * mad.mad_chars
                 THEN 1 ELSE 0 END) AS n_outliers
      FROM dev JOIN mad USING (source) GROUP BY dev.source
    )
    SELECT mad.source, CAST(mad.n_docs AS BIGINT) AS n_docs,
           round(mad.median_chars, 1) AS median_chars,
           round(mad.mad_chars, 1) AS mad_chars,
           CAST(fl.n_outliers AS BIGINT) AS n_outliers,
           round(fl.n_outliers * 1.0 / mad.n_docs, 6) AS outlier_ratio
    FROM mad JOIN fl USING (source) ORDER BY mad.source
    """,
)


# ---------------------------------------------------------------------------
# T33 (extension): field-completeness profile — the first report any
# ingest pipeline runs: per source, the fraction of NULL/empty values
# per column plus basic payload stats. One conditional-aggregation
# pass (no explode, no joins); at 100 TB this is a map-side-combined
# scan whatever the column count.
# ---------------------------------------------------------------------------
@query("t33_completeness_profile")
def t33_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    def null_frac(c, empty_aware):
        bad = F.col(c).isNull()
        if empty_aware:
            bad = bad | (F.length(F.trim(F.col(c))) == 0)
        return F.round(
            F.sum(bad.cast("long")) / F.count(F.lit(1)).cast("double"), 6
        )

    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            null_frac("text", True).alias("text_missing_frac"),
            null_frac("lang", True).alias("lang_missing_frac"),
            F.round(
                F.sum(
                    (F.col("n_chars").isNull() | (F.col("n_chars") <= 0))
                    .cast("long")
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("n_chars_invalid_frac"),
            F.round(
                F.sum(
                    (
                        F.col("n_chars")
                        != F.length(F.coalesce(F.col("text"), F.lit("")))
                    ).cast("long")
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("n_chars_mismatch_frac"),
        )
        .orderBy("source")
    )


oracle(
    "t33_completeness_profile",
    """
    SELECT source, count(*) AS n_docs,
           round(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS text_missing_frac,
           round(sum(CASE WHEN lang IS NULL OR length(trim(lang)) = 0
                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS lang_missing_frac,
           round(sum(CASE WHEN n_chars IS NULL OR n_chars <= 0
                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS n_chars_invalid_frac,
           round(sum(CASE WHEN n_chars <> length(coalesce(text, ''))
                 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS n_chars_mismatch_frac
    FROM documents GROUP BY source ORDER BY source
    """,
)


# ---------------------------------------------------------------------------
# T34 (extension): per-source language entropy — H = −Σ p·ln p over the
# language mix within each source (0 = monolingual, ln(5) ≈ 1.609 =
# uniform over this corpus's five languages), plus the majority
# language and its share. The mixture-health metric read next to c24's
# allocator. Two keyed aggregations; entropy terms are rounded to 12 dp
# and summed as DECIMAL(28,12) (associative, engine-exact).
# ---------------------------------------------------------------------------
@query("t34_source_lang_entropy")
def t34_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("source")
    terms = sl.select(
        "source",
        "lang",
        "n",
        F.round(
            -(F.col("n") / F.sum("n").over(tot))
            * F.log(F.col("n") / F.sum("n").over(tot)),
            12,
        )
        .cast("decimal(28,12)")
        .alias("term"),
        F.sum("n").over(tot).alias("n_src"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    top = terms.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    ent = terms.groupBy("source").agg(
        F.round(F.sum("term").cast("double"), 6).alias("lang_entropy")
    )
    return (
        top.select(
            "source",
            F.col("n_src").alias("n_docs"),
            F.col("lang").alias("majority_lang"),
            F.round(F.col("n") / F.col("n_src").cast("double"), 6).alias(
                "majority_share"
            ),
        )
        .join(ent, "source")
        .orderBy("source")
    )


oracle(
    "t34_source_lang_entropy",
    """
    WITH sl AS (
      SELECT source, lang, count(*) AS n FROM documents
      GROUP BY source, lang
    ),
    t AS (
      SELECT source, lang, n,
             CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_src,
             CAST(round(-(n * 1.0 / sum(n) OVER (PARTITION BY source))
                  * ln(n * 1.0 / sum(n) OVER (PARTITION BY source)), 12)
               AS DECIMAL(28,12)) AS term,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, lang ASC) AS rk
      FROM sl
    ),
    ent AS (SELECT source, round(CAST(sum(term) AS DOUBLE), 6)
                     AS lang_entropy
            FROM t GROUP BY source)
    SELECT t.source, t.n_src AS n_docs, t.lang AS majority_lang,
           round(t.n * 1.0 / t.n_src, 6) AS majority_share,
           ent.lang_entropy
    FROM t JOIN ent ON t.source = ent.source
    WHERE t.rk = 1 ORDER BY t.source
    """,
)


# ---------------------------------------------------------------------------
# T35 (extension): readability profile — Flesch reading ease with the
# standard cheap proxies (sentences = terminator runs, syllables =
# vowel groups), aggregated per language. A pure column-expression
# scan (two regexp_extract_all counts + one tokenize), no UDFs; the
# classic quality-filter feature family (readability gates in C4/
# RefinedWeb-style cleaning). Guards: floors of 1 on sentences/words/
# syllables so empty docs score the formula's constants, not NaN.
# ---------------------------------------------------------------------------
@query("t35_readability")
def t35_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    words = F.greatest(
        F.size(T.tokens(F.col("text"))), F.lit(1)
    ).cast("double")
    sentences = F.greatest(
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col("text"), F.lit("")), F.lit("[.!?]+"), 0
            )
        ),
        F.lit(1),
    ).cast("double")
    syllables = F.greatest(
        F.size(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col("text"), F.lit(""))),
                F.lit("[aeiou]+"),
                0,
            )
        ),
        F.lit(1),
    ).cast("double")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words),
        6,
    )
    per_doc = docs.select("lang", flesch.alias("flesch"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(
                    F.round(F.col("flesch"), 12).cast("decimal(28,12)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_flesch"),
            F.round(F.min("flesch"), 6).alias("min_flesch"),
            F.round(F.max("flesch"), 6).alias("max_flesch"),
        )
        .orderBy("lang")
    )


oracle(
    "t35_readability",
    f"""
    WITH per AS (
      SELECT lang,
             round(206.835
               - 1.015 * (greatest(len({_TOKS}), 1) * 1.0
                          / greatest(len(regexp_extract_all(
                              coalesce(text, ''), '[.!?]+')), 1))
               - 84.6 * (greatest(len(regexp_extract_all(
                            lower(coalesce(text, '')), '[aeiou]+')), 1)
                         * 1.0 / greatest(len({_TOKS}), 1)), 6) AS flesch
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           round(CAST(sum(CAST(round(flesch, 12) AS DECIMAL(28,12)))
                 AS DOUBLE) / count(*), 6) AS avg_flesch,
           round(min(flesch), 6) AS min_flesch,
           round(max(flesch), 6) AS max_flesch
    FROM per GROUP BY lang ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# T36: multi-round BPE merge TRAINING (Sennrich et al. 2016) — t23 counts
# the pairs one training iteration would see; this runs the training loop
# itself for a fixed number of merges: argmax pair over the word-type
# table → corpus-wide greedy left-to-right merge → recount. Fully
# declarative (no driver loop state): each round's winner is a 1-row
# broadcast crossJoined into a `replace()` rewrite of the symbol strings,
# so the whole train is one DAG and the DuckDB oracle replays it as
# nested MATERIALIZED CTEs (the v17 chained-CTE discipline).
#
# Encoding: a word's symbol sequence is a single string — symbols joined
# by a DOUBLE 0x1f sentinel with single-0x1f padding at both ends. The
# merge of pair (x, y) is then exactly
# replace(w, ␟x␟␟y␟ → ␟xy␟): the leading/trailing single sentinels
# anchor complete symbols (no suffix/prefix false matches), interior
# separators stay well-formed after substitution, and both engines'
# replace() scans left-to-right over non-overlapping occurrences — which
# IS greedy BPE merge order ("aaaa" + (a,a) → [aa, aa]).
#
# Scale posture: everything past tokenization runs on the word-TYPE
# table (the classic BPE-trainer optimization — vocabulary-bounded, not
# corpus-bounded), each round is one map-side-combinable pair count +
# one broadcast rewrite, and every round is pinned so round r+1 reads
# materialized blocks (iterative-family discipline). At 100 TB the one
# corpus-scale stage is the initial token count; rounds cost O(|vocab|).
# ---------------------------------------------------------------------------
_BPE_TRAIN_ROUNDS = 6
_BPE_SEP = "\x1f"  # == operators/bpe.py SEP (oracle SQL hardcodes chr(31))


def _bpe_train_chain(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The shared train loop (operators/bpe.py): returns ``(merges,
    words)`` where ``merges`` is the six-row merge table (round, x, y,
    cnt) and ``words`` is the word-TYPE table after all merges (tok, w,
    freq) — ``w`` the sentinel-encoded symbol string. t36 reports the
    merges; t37 applies ``words`` back to the corpus (train -> encode)."""
    from mtg_vector_db_spark.operators import bpe

    return bpe.bpe_train(bpe.word_types(docs), rounds=_BPE_TRAIN_ROUNDS)


@query("t36_bpe_merge_train")
def t36_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    merges, _ = _bpe_train_chain(docs)
    return merges.select(
        "round", "x", "y", F.concat("x", "y").alias("merged"), "cnt"
    ).orderBy("round")


def _bpe_chain_ctes() -> list[str]:
    """The train loop as DuckDB CTEs (shared by the t36 and t37 oracles):
    word types -> sentinel-encoded w0 -> R rounds of (pair count, 1-row
    argmax, replace-merge), all MATERIALIZED (the v17 chained-CTE
    discipline — without it each round re-derives the whole prefix)."""
    sep = "chr(31)"
    sep2 = f"{sep} || {sep}"
    ctes = [
        f"""wt AS (
      SELECT tok, count(*) AS freq
      FROM (SELECT unnest({_TOKS_L}) AS tok FROM documents)
      WHERE NOT contains(tok, {sep}) GROUP BY tok
    )""",
        f"""w0 AS MATERIALIZED (
      SELECT tok, {sep} || array_to_string(
               list_transform(range(1, len(tok) + 1),
                              i -> substring(tok, i, 1)), {sep2})
             || {sep} AS w, freq
      FROM wt
    )""",
    ]
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        ctes.append(f"""p{r} AS (
      SELECT syms[i] AS x, syms[i + 1] AS y, freq
      FROM (SELECT string_split(w[2:len(w) - 1], {sep2}) AS syms, freq
            FROM w{r - 1}) s,
           unnest(range(1, len(syms))) AS u(i)
    )""")
        ctes.append(f"""t{r} AS MATERIALIZED (
      SELECT x, y, CAST(sum(freq) AS BIGINT) AS cnt
      FROM p{r} GROUP BY x, y
      ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
    )""")
        ctes.append(f"""w{r} AS MATERIALIZED (
      SELECT tok, replace(w, {sep} || x || {sep2} || y || {sep},
                             {sep} || x || y || {sep}) AS w, freq
      FROM w{r - 1}, t{r}
    )""")
    return ctes


def _bpe_train_oracle() -> str:
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, x, y, x || y AS merged, cnt FROM t{r}"
        for r in range(1, _BPE_TRAIN_ROUNDS + 1)
    )
    return (
        "WITH " + ",\n    ".join(_bpe_chain_ctes())
        + f"\n    SELECT * FROM ({unions}) ORDER BY round"
    )


oracle("t36_bpe_merge_train", _bpe_train_oracle())


# ---------------------------------------------------------------------------
# T37: ENCODE with the t36-trained tokenizer — the apply side of the
# train->apply loop (what a pipeline runs to budget token counts under
# its own learned vocab rather than t11's fixed regex proxy). The final
# word-type table already carries each word's merged symbol string, so
# encoding is a length computation per TYPE (n_tokens = sentinels/2,
# n_chars = len minus sentinels) broadcast-joined back onto the token
# stream — the corpus is never re-segmented, and the per-language
# compression report (tokens/word, chars/token) is one aggregate scan.
# ---------------------------------------------------------------------------
@query("t37_bpe_encode_stats")
def t37_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = tables(spark, sf_dir, "documents")
    _, words = _bpe_train_chain(docs)
    nosep = F.replace(F.col("w"), F.lit(_BPE_SEP), F.lit(""))
    enc = words.select(
        "tok",
        ((F.length("w") - F.length(nosep)) / F.lit(2))
        .cast("long")
        .alias("n_syms"),
        F.length(nosep).cast("long").alias("n_chr"),
    )
    stream = docs.select(
        "lang", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    )
    return (
        stream.join(F.broadcast(enc), "tok")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_tokens"),
            F.sum("n_chr").alias("n_chars"),
            F.round(
                F.sum("n_syms") / F.count(F.lit(1)), 6
            ).alias("tokens_per_word"),
            F.round(
                F.sum("n_chr") / F.sum("n_syms"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def _bpe_encode_oracle() -> str:
    r = _BPE_TRAIN_ROUNDS
    return (
        "WITH " + ",\n    ".join(_bpe_chain_ctes())
        + f""",
    enc AS (
      SELECT tok,
             CAST((len(w) - len(replace(w, chr(31), ''))) / 2 AS BIGINT)
               AS n_syms,
             CAST(len(replace(w, chr(31), '')) AS BIGINT) AS n_chr
      FROM w{r}
    ),
    stream AS (
      SELECT lang, unnest({_TOKS_L}) AS tok FROM documents
    )
    SELECT lang, count(*) AS n_words,
           CAST(sum(n_syms) AS BIGINT) AS n_tokens,
           CAST(sum(n_chr) AS BIGINT) AS n_chars,
           round(sum(n_syms) * 1.0 / count(*), 6) AS tokens_per_word,
           round(sum(n_chr) * 1.0 / sum(n_syms), 6) AS chars_per_token
    FROM stream JOIN enc USING (tok)
    GROUP BY lang ORDER BY lang
    """
    )


oracle("t37_bpe_encode_stats", _bpe_encode_oracle())


# ---------------------------------------------------------------------------
# T38: BPE INFERENCE on out-of-vocabulary text — encode part.p_name
# under the DOCUMENTS-trained merge table (operators/bpe.py:bpe_encode).
# This is the production tokenizer path: the trainer compressed word
# TYPES of one corpus; serving must encode strings it never saw. Applies
# each merge once in training-rank order (topologically consistent by
# construction of training, so it equals apply-by-priority-to-fixpoint
# inference); each rank is a 1-row broadcast replace over the name
# token stream. Output: the 10 costliest names under the learned vocab.
# ---------------------------------------------------------------------------
@query("t38_bpe_oov_encode")
def t38_bpe_oov_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.bpe import bpe_encode

    docs, part = tables(spark, sf_dir, "documents", "part")
    merges, _ = _bpe_train_chain(docs)
    names = part.select(F.lower(F.col("p_name")).alias("name")).distinct()
    toks = names.select(
        "name", F.explode(T.tokens(F.col("name"))).alias("tok")
    )
    enc = bpe_encode(toks, merges, rounds=_BPE_TRAIN_ROUNDS)
    return (
        enc.groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy(F.desc("n_tokens"), F.asc("name"))
        .limit(10)
    )


def _bpe_oov_oracle() -> str:
    sep = "chr(31)"
    sep2 = f"{sep} || {sep}"
    name_toks = (
        "list_filter(string_split_regex(trim(name), '\\s+'), t -> len(t) > 0)"
    )
    enc_ctes = [
        """names AS (SELECT DISTINCT lower(p_name) AS name FROM part)""",
        f"""e0 AS (
      SELECT name, CASE WHEN contains(tok, {sep}) OR len(tok) = 0
             THEN NULL
             ELSE {sep} || array_to_string(
                    list_transform(range(1, len(tok) + 1),
                                   i -> substring(tok, i, 1)), {sep2})
                  || {sep} END AS w
      FROM (SELECT name, unnest({name_toks}) AS tok FROM names)
    )""",
    ]
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        enc_ctes.append(f"""e{r} AS MATERIALIZED (
      SELECT name, replace(w, {sep} || x || {sep2} || y || {sep},
                              {sep} || x || y || {sep}) AS w
      FROM e{r - 1}, t{r}
    )""")
    return (
        "WITH " + ",\n    ".join(_bpe_chain_ctes() + enc_ctes)
        + f"""
    SELECT name, count(*) AS n_words,
           CAST(sum(CAST((len(w) - len(replace(w, {sep}, ''))) / 2
                         AS BIGINT)) AS BIGINT) AS n_tokens,
           CAST(sum(len(replace(w, {sep}, ''))) AS BIGINT) AS n_chars
    FROM e{_BPE_TRAIN_ROUNDS} GROUP BY name
    ORDER BY n_tokens DESC, name ASC LIMIT 10
    """
    )


oracle("t38_bpe_oov_encode", _bpe_oov_oracle())


# ---------------------------------------------------------------------------
# T39: BATCHED BPE training, oracle-replayed — the multi-merge-per-round
# scale path (operators/bpe.py:bpe_train_batched; round-4 VERDICT #3)
# as a registered, driver-checked query. Per batch round: top-M
# symbol-DISJOINT pairs among the top-4M candidates (conflicting pairs
# defer to the next recount), applied in one rewrite pass. The oracle
# replays the whole thing in SQL: the greedy non-interacting selection
# is a RECURSIVE CTE walking candidate ranks while accumulating the
# used-symbol set as a sentinel-wrapped string (symbols never contain
# the sentinel, so `contains(used, ␟sym␟)` IS set membership), and the
# batch rewrite is a second recursive CTE folding the picked merges in
# rank order — both engines then agree merge-for-merge (the planted
# test pins batched ≡ sequential on independent pairs; THIS query pins
# batched ≡ batched across engines on real corpora, every round).
#
# Constants satisfy n_merges = batch_m * rounds so the per-round pick
# budget is the constant batch_m on both sides (the Spark trainer's
# `want` = min(batch_m, remaining) can otherwise shrink — keep the
# invariant if retuning).
# ---------------------------------------------------------------------------
_T39_M = 4
_T39_ROUNDS = 2
_T39_MERGES = _T39_M * _T39_ROUNDS


@query("t39_bpe_batched_train")
def t39_bpe_batched_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators import bpe

    (docs,) = tables(spark, sf_dir, "documents")
    merges, _ = bpe.bpe_train_batched(
        bpe.word_types(docs),
        n_merges=_T39_MERGES,
        batch_m=_T39_M,
        max_rounds=_T39_ROUNDS,
    )
    return merges.select(
        "round", "batch_round", "x", "y", "cnt"
    ).orderBy("round")


def _t39_round_ctes(r: int) -> str:
    sep = "chr(31)"
    sep2 = f"{sep} || {sep}"
    m, cands = _T39_M, 4 * _T39_M
    ok = (
        f"s.picked < {m}"
        f" AND NOT contains(s.used, {sep} || c.x || {sep})"
        f" AND NOT contains(s.used, {sep} || c.y || {sep})"
        f" AND NOT contains(s.used, {sep} || c.x || c.y || {sep})"
    )
    return f""",
    p{r} AS (
      SELECT syms[i] AS x, syms[i + 1] AS y, freq
      FROM (SELECT string_split(w[2:len(w) - 1], {sep2}) AS syms, freq
            FROM b{r - 1}) s,
           unnest(range(1, len(syms))) AS u(i)
    ),
    cand{r} AS MATERIALIZED (
      SELECT x, y, cnt,
             row_number() OVER (ORDER BY cnt DESC, x ASC, y ASC) AS rn
      FROM (SELECT x, y, CAST(sum(freq) AS BIGINT) AS cnt
            FROM p{r} GROUP BY x, y)
      ORDER BY rn LIMIT {cands}
    ),
    sel{r} AS (
      SELECT 0 AS rn, 0 AS picked, '' AS used,
             CAST(NULL AS VARCHAR) AS x, CAST(NULL AS VARCHAR) AS y,
             CAST(NULL AS BIGINT) AS cnt, FALSE AS take
      UNION ALL
      SELECT c.rn,
             s.picked + CASE WHEN {ok} THEN 1 ELSE 0 END,
             s.used || CASE WHEN {ok}
                        THEN {sep} || c.x || {sep} || {sep} || c.y || {sep}
                             || {sep} || c.x || c.y || {sep}
                        ELSE '' END,
             c.x, c.y, c.cnt,
             ({ok}) AS take
      FROM sel{r} s JOIN cand{r} c ON c.rn = s.rn + 1
    ),
    picks{r} AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY rn) AS k, x, y, cnt
      FROM sel{r} WHERE take
    ),
    apply{r} AS (
      SELECT tok, w, freq, 0 AS k FROM b{r - 1}
      UNION ALL
      SELECT a.tok,
             replace(a.w, {sep} || m.x || {sep2} || m.y || {sep},
                          {sep} || m.x || m.y || {sep}),
             a.freq, a.k + 1
      FROM apply{r} a JOIN picks{r} m ON m.k = a.k + 1
    ),
    b{r} AS MATERIALIZED (
      SELECT tok, w, freq FROM apply{r}
      WHERE k = (SELECT count(*) FROM picks{r})
    )"""


def _t39_oracle() -> str:
    sep = "chr(31)"
    sep2 = f"{sep} || {sep}"
    sql = f"""
    WITH RECURSIVE wt AS (
      SELECT tok, count(*) AS freq
      FROM (SELECT unnest({_TOKS_L}) AS tok FROM documents)
      WHERE NOT contains(tok, {sep}) GROUP BY tok
    ),
    b0 AS MATERIALIZED (
      SELECT tok, {sep} || array_to_string(
               list_transform(range(1, len(tok) + 1),
                              i -> substring(tok, i, 1)), {sep2})
             || {sep} AS w, freq
      FROM wt
    )"""
    for r in range(1, _T39_ROUNDS + 1):
        sql += _t39_round_ctes(r)
    unions = []
    for r in range(1, _T39_ROUNDS + 1):
        off = " + ".join(
            ["0"] + [f"(SELECT count(*) FROM picks{j})" for j in range(1, r)]
        )
        unions.append(
            f"SELECT CAST(k + {off} AS INT) AS round,"
            f" {r} AS batch_round, x, y, cnt FROM picks{r}"
        )
    return (
        sql
        + "\n    SELECT * FROM ("
        + "\n    UNION ALL ".join(unions)
        + ") ORDER BY round"
    )


oracle("t39_bpe_batched_train", _t39_oracle())


# ---------------------------------------------------------------------------
# T40: TRIGRAM SEARCH FROM A STORED POSTING LIST — the GIN-index analog,
# completing reference parity for its SECOND index: the reference builds
# a pg_trgm GIN index at schema create (/root/reference/db/init.sql:32)
# and every fuzzy-tier query only probes it
# (db/search_strategies.py:97-106); t01 reproduces the similarity math
# but re-derives every name's trigram set per execution. Here the
# posting list (tg, p_name, n_d) is a content-addressed artifact,
# range-partitioned and sorted by trigram so the serving scan's
# `tg IN (<query trigrams>)` filter is PUSHED to parquet (plan-asserted
# — only row groups containing the query's ~8 trigrams are read, the
# GIN posting-fetch access pattern). Shared-count aggregation then
# reconstructs EXACT pg_trgm similarity relationally:
# |A∩B| = shared postings, |A∪B| = nq + n_d − shared — so t40's top-10
# equals t01's scan answer bit-for-bit (pinned), the same way p44/p45/
# p46 serve the vector arms from their stored indexes.
# ---------------------------------------------------------------------------
_T40_Q = "blu bolt"
_T40_K = 10


def _pg_trgm_set(s: str) -> list[str]:
    """pg_trgm trigram set in Python — mirrors functions/trigram.py
    operation-for-operation (lowercase, split on non-alphanumeric runs,
    pad '  w ', all 3-substrings, dedup) for QUERY literals only; any
    divergence from the engine construction would break the t40↔t01
    equality test and the oracle compare, both pinned."""
    import re

    out: list[str] = []
    seen = set()
    for w in re.split("[^a-z0-9]+", s.lower()):
        if not w:
            continue
        p = "  " + w + " "
        for i in range(len(p) - 2):
            t = p[i : i + 3]
            if t not in seen:
                seen.add(t)
                out.append(t)
    return out


def _stored_trgm_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing path of the frozen trigram posting list over
    distinct part names. Sorted+range-partitioned by trigram: parquet
    min/max stats make the serving IN-filter skip every row group that
    holds none of the query's trigrams."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/part.parquet")
    key = artifact_key("trgm_postings", "v1", fp)
    path = os.path.join(artifact_root(), "trgm_postings", key)

    def build(tmp: str) -> None:
        from mtg_vector_db_spark.functions.trigram import trigram_set

        (part,) = tables(spark, sf_dir, "part")
        names = part.select("p_name").distinct()
        tris = trigram_set(F.col("p_name"))
        (
            names.select(
                "p_name",
                F.size(tris).alias("n_d"),
                F.explode(tris).alias("tg"),
            )
            .repartitionByRange(8, "tg")
            .sortWithinPartitions("tg")
            .write.parquet(tmp)
        )

    ensure_artifact(path, build)
    return path


@query("t40_trigram_serve_stored")
def t40_trigram_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    qtris = _pg_trgm_set(_T40_Q)
    nq = len(qtris)
    post = spark.read.parquet(_stored_trgm_path(spark, sf_dir))
    shared = (
        post.filter(F.col("tg").isin(qtris))  # pushed to the parquet scan
        .groupBy("p_name", "n_d")
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    sim = F.round(
        F.col("sh").cast("double")
        / (F.lit(nq) + F.col("n_d") - F.col("sh")).cast("double"),
        R,
    )
    return (
        shared.select("p_name", sim.alias("sim"))
        .filter(F.col("sim") > 0.0)
        .orderBy(F.desc("sim"), F.asc("p_name"))
        .limit(_T40_K)
    )


def _t40_oracle() -> str:
    from mtg_vector_db_spark.functions.trigram import duckdb_trigram_set_sql

    tri_name = duckdb_trigram_set_sql("p_name")
    tri_q = duckdb_trigram_set_sql(f"'{_T40_Q}'")
    return f"""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    post AS MATERIALIZED (
      SELECT p_name, len({tri_name}) AS n_d, unnest({tri_name}) AS tg
      FROM names),
    q AS (SELECT unnest({tri_q}) AS tg),
    nq AS (SELECT count(*) AS n_q FROM q),
    shared AS (
      SELECT p_name, n_d, count(*) AS sh
      FROM post JOIN q USING (tg) GROUP BY p_name, n_d)
    SELECT p_name,
           round(CAST(sh AS DOUBLE)
                 / CAST(nq.n_q + n_d - sh AS DOUBLE), {R}) AS sim
    FROM shared CROSS JOIN nq
    WHERE round(CAST(sh AS DOUBLE)
                / CAST(nq.n_q + n_d - sh AS DOUBLE), {R}) > 0.0
    ORDER BY sim DESC, p_name ASC LIMIT {_T40_K}"""


oracle("t40_trigram_serve_stored", _t40_oracle())


# ---------------------------------------------------------------------------
# T41: BM25 SEARCH FROM A STORED POSTING INDEX — the keyword arm gets the
# t40 treatment (round-5 VERDICT #7): t14/p37/p39 rebuild the postings
# and corpus stats inside every execution; a deployed keyword engine
# builds (term, doc, tf, doclen) + (n_docs, avgdl) ONCE and every query
# only fetches the query terms' posting rows. Two content-addressed
# artifacts (postings range-partitioned + sorted by term → the serving
# `term IN (...)` filter is PUSHED to parquet and row groups without the
# query's terms are skipped — the inverted-index access pattern;
# 1-row corpus stats). df(term) needs no third artifact: the fetched
# posting rows for a term ARE the docs containing it, so df = count per
# term over the fetch. Scoring from that point is operation-identical to
# operators/text_search.py:bm25_scores, so t41's top-10 equals t14's
# full-scan answer bit-for-bit (pinned), and the oracle replays the
# whole build+score in CTEs exactly like t40's.
# ---------------------------------------------------------------------------
_T41_K = 10


def _stored_bm25_paths(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build-if-missing (postings, stats) artifact paths for the frozen
    BM25 index over documents. Postings are the FULL term explode
    (term, doc_id, tf, doclen) — built once per corpus fingerprint;
    stats is the 1-row (n_docs, avgdl) table computed with the same
    expressions as the in-query build (doubles round-trip parquet
    exactly, so serving arithmetic is bit-identical)."""
    import os

    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    fp = dataset_fingerprint(f"{sf_dir}/documents.parquet")
    pkey = artifact_key("bm25_postings", "v1", fp)
    skey = artifact_key("bm25_stats", "v1", fp)
    ppath = os.path.join(artifact_root(), "bm25_postings", pkey)
    spath = os.path.join(artifact_root(), "bm25_stats", skey)

    def tok_df():
        (docs,) = tables(spark, sf_dir, "documents")
        return docs.select(
            "doc_id", T.tokens(F.lower(F.col("text"))).alias("toks")
        )

    def build_postings(tmp: str) -> None:
        (
            tok_df()
            .select(
                "doc_id",
                F.size("toks").alias("doclen"),
                F.explode("toks").alias("term"),
            )
            .groupBy("doc_id", "doclen", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .repartitionByRange(8, "term")
            .sortWithinPartitions("term")
            .write.parquet(tmp)
        )

    def build_stats(tmp: str) -> None:
        (
            tok_df()
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg(F.size("toks")).alias("avgdl"),
            )
            .coalesce(1)
            .write.parquet(tmp)
        )

    ensure_artifact(ppath, build_postings)
    ensure_artifact(spath, build_stats)
    return ppath, spath


@query("t41_bm25_serve_stored")
def t41_bm25_serve_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.text_search import bm25_from_postings

    ppath, spath = _stored_bm25_paths(spark, sf_dir)
    post = spark.read.parquet(ppath)
    stats = spark.read.parquet(spath)
    return bm25_from_postings(
        post, stats, BM25_TERMS, _T41_K, round_digits=R
    ).orderBy(F.desc("bm25"), F.asc("doc_id"))


oracle(
    "t41_bm25_serve_stored",
    f"""
    WITH {bm25_sql_ctes()}
    SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_T41_K}
    """,
)
