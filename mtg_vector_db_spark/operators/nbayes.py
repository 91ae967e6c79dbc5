"""In-engine Naive Bayes training + scoring (hashed bag-of-words).

Trains a multinomial Naive Bayes classifier wholly inside the engine —
class priors and per-hash-bucket token likelihoods are one aggregation
pass over the training split — then applies it to a held-out split with
a broadcast of the (n_classes × n_buckets)-row model. The reference has
no model training at all; a training-data pipeline uses exactly this
shape for cheap quality/language/domain classifiers (the fastText-style
filter stage) at 100 TB, where the model is KBs and the scoring pass is
one token-grain shuffle.

Determinism across engines: log-probabilities are rounded to 12 decimals
and accumulated as DECIMAL(28,12) (exact, associative — the t21/t19
trick), so per-document class scores are bit-identical in Spark and
DuckDB, and the argmax (max over a (score, class) struct) has no float
tie risk at all.

Scale posture: training is two map-side-combinable aggregations (class
doc counts; (class, bucket) token counts). Scoring joins the token
stream to the broadcast likelihood table (one row per class per bucket,
so the stream fans out ×n_classes — bounded, documented) and reduces at
(doc, class) then doc grain. No windows, no driver loops; the only
``crossJoin`` folds 1-row totals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.text import tokens
from mtg_vector_db_spark.operators.importance import token_bucket
from mtg_vector_db_spark.session import widen

N_BUCKETS = 64


def nb_doc_scores(
    docs: DataFrame,
    is_train: Column,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-(held-out doc, class) Naive Bayes log-score table:
    ``(id_col, cls, score)`` with exact DECIMAL scores — the shared
    core behind prediction (:func:`nb_train_apply`, argmax) and
    active-learning margin sampling (top-1 minus top-2 per doc).

    Total over the held-out split: a doc whose text tokenizes to zero
    tokens has no likelihood evidence, so it gets prior-only scores
    (one row per class, score = prior) instead of silently vanishing
    from the output — its argmax is the majority-prior class and its
    margin is the prior gap. The fallback branch is a map-side filter
    crossed with the broadcast prior table: no extra shuffle.
    """
    # widen(): tokenization + md5 bucketing are CPU-bound per row; fan a
    # single-split small scan across the cluster (no-op at real scale).
    base = widen(docs.select(id_col, label_col, text_col)).select(
        F.col(id_col),
        F.col(label_col),
        is_train.alias("is_tr"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    train = base.filter(F.col("is_tr"))

    # Priors: ln((docs_c + 1) / (docs + n_classes)) as exact DECIMAL.
    class_docs = train.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("docs_c")
    )
    tot = class_docs.agg(
        F.sum("docs_c").alias("docs_tot"),
        F.count(F.lit(1)).alias("n_classes"),
    )
    priors = class_docs.crossJoin(F.broadcast(tot)).select(
        F.col(label_col).alias("cls"),
        F.round(
            F.log(
                (F.col("docs_c") + 1.0)
                / (F.col("docs_tot") + F.col("n_classes"))
            ),
            12,
        )
        .cast("decimal(28,12)")
        .alias("prior"),
    )

    # Likelihoods: ln((cnt[c,b] + 1) / (cnt[c] + B)) for EVERY (class,
    # bucket) cell — absent cells get the smoothed floor, so the dense
    # model table is n_classes × n_buckets rows, built by outer-joining
    # observed counts onto the full grid.
    tok_tr = train.select(
        F.col(label_col).alias("cls"),
        F.explode("toks").alias("tok"),
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets))
    cell_cnt = tok_tr.groupBy("cls", "bucket").agg(
        F.count(F.lit(1)).alias("cb_cnt")
    )
    class_cnt = tok_tr.groupBy("cls").agg(
        F.count(F.lit(1)).alias("c_cnt")
    )
    grid = class_cnt.crossJoin(
        docs.sparkSession.range(n_buckets).select(
            F.col("id").cast("long").alias("bucket")
        )
    )
    lik = (
        grid.join(cell_cnt, ["cls", "bucket"], "left")
        .select(
            "cls",
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("cb_cnt"), F.lit(0)) + 1.0)
                    / (F.col("c_cnt") + F.lit(float(n_buckets)))
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("loglik"),
        )
    )

    # Score held-out docs: token stream × broadcast model, reduce at
    # (doc, class), add prior, argmax by exact (score, class) struct.
    test = base.filter(~F.col("is_tr"))
    tok_te = test.select(
        F.col(id_col), F.explode("toks").alias("tok")
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets))
    scored = (
        tok_te.join(F.broadcast(lik), "bucket")
        .groupBy(id_col, "cls")
        .agg(F.sum("loglik").alias("s"))
        .join(F.broadcast(priors), "cls")
        .select(
            id_col,
            "cls",
            (F.col("s") + F.col("prior")).alias("score"),
        )
    )
    # Prior-only fallback for token-less held-out docs (see docstring).
    score_type = scored.schema["score"].dataType
    tokless = (
        # coalesce: null text tokenizes to a null array (size null),
        # which is just as token-less as an empty one.
        test.filter(F.coalesce(F.size("toks"), F.lit(0)) <= 0)
        .select(F.col(id_col))
        .crossJoin(F.broadcast(priors))
        .select(
            id_col, "cls", F.col("prior").cast(score_type).alias("score")
        )
    )
    return scored.unionByName(tokless)


def nb_train_apply(
    docs: DataFrame,
    is_train: Column,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Train on ``is_train`` rows, score the rest; returns one row per
    held-out document: ``(id_col, label_col, predicted)``.

    Add-one smoothing on both priors and likelihoods; prediction is
    argmax of ``prior(c) + Σ_tokens loglik(c, bucket)``, ties broken
    toward the lexicographically greatest class (exact DECIMAL scores,
    same rule both engines).
    """
    doc_cls = nb_doc_scores(
        docs, is_train, label_col, id_col, text_col, n_buckets
    )
    pred = doc_cls.groupBy(id_col).agg(
        F.max(F.struct(F.col("score"), F.col("cls"))).alias("best")
    )
    held = docs.filter(~is_train).select(id_col, label_col)
    return pred.join(held, id_col).select(
        id_col, label_col, F.col("best.cls").alias("predicted")
    )


def nb_counts(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """The classifier's sufficient statistics as one additive table:
    ``(kind, cls, key, cnt)`` where kind='doc' rows carry per-class
    document counts (key = -1) and kind='tok' rows carry (class, hash
    bucket) token counts. The whole model (priors + likelihoods; the
    per-class token total is the bucket-row sum) is a pure function of
    this table, and the table is ADDITIVE: counts over a union of
    corpora equal the merged counts of each part (``nb_merge``) — so
    incremental retraining on appended data is a count merge, never a
    re-scan of the historical corpus.
    """
    base = widen(docs.select(label_col, text_col)).select(
        F.col(label_col).alias("cls"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    doc_rows = base.groupBy("cls").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(F.lit("doc").alias("kind"), "cls", F.lit(-1).cast("long").alias("key"), "cnt")
    tok_rows = (
        base.select("cls", F.explode("toks").alias("tok"))
        .withColumn("key", token_bucket(F.col("tok"), n_buckets))
        .groupBy("cls", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("tok").alias("kind"), "cls", "key", "cnt")
    )
    return doc_rows.unionByName(tok_rows)


def nb_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two ``nb_counts`` tables (counts are additive)."""
    return (
        a.unionByName(b)
        .groupBy("kind", "cls", "key")
        .agg(F.sum("cnt").alias("cnt"))
    )
