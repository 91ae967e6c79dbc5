"""Margin-based bitext mining — the cross-lingual parallel-pair miner
(Artetxe & Schwenk 2019, the scoring rule behind the CCMatrix/LASER
mined corpora). For a candidate cross-language pair (x, y),

    margin(x, y) = cos(x, y) / ((mean_k cos(x, NN_k(x)) +
                                 mean_k cos(y, NN_k(y))) / 2)

— raw cosine divided by the average of each side's local similarity
neighborhood, so a pair only scores high when the two docs are much
closer to EACH OTHER than either is to its background neighbors. That
ratio test is what separates true translations from hubs (docs near
everything), the failure mode of plain cosine thresholds at mining
scale.

Spark-first shape: candidates come from the same corpus-sized IVF
soft-assignment blocking as d06/c23 (``dynamic_seed_cells`` +
``ivf_multi_assign`` — cells ∝ corpus, candidate volume ∝ n, the only
shuffle keys on cell), exactly the role FAISS plays in the reference
pipelines; the k-NN normalizers are computed over the SAME candidate
set with one window + one aggregate per side, so no second pass and no
exact all-pairs anywhere. Top-k sums ride DECIMAL(12,6) (sims are
pre-rounded to 6 digits) so the means are addition-order-independent —
bit-identical between Spark and the SQL oracle.

No reference analog (the reference is monolingual); this is the
beyond-reference training-data mandate (multilingual corpus mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from mtg_vector_db_spark.functions.vector import dot, l2_normalize
from mtg_vector_db_spark.operators.ann import dynamic_seed_cells, ivf_multi_assign


def margin_bitext_pairs(
    docs: DataFrame,
    emb: DataFrame,
    src_lang: str,
    tgt_lang: str,
    k: int = 4,
    nprobe: int = 3,
    min_margin: float = 1.05,
    round_digits: int = 6,
) -> DataFrame:
    """Mine (src_lang → tgt_lang) document pairs by margin score.

    Returns one row per source doc that has a margin-passing partner:
    (src_id, tgt_id, sim, margin), the forward-best pair (highest
    margin, tgt_id tie-break). Only positively-similar candidates
    (rounded cos > 0) participate, which also keeps every denominator
    strictly positive.
    """
    lang = docs.select("doc_id", "lang")
    seeds = dynamic_seed_cells(emb)
    blocked = (
        ivf_multi_assign(emb, seeds, nprobe=nprobe)
        .select("vec_id", "cell")
        .join(lang, F.col("vec_id") == F.col("doc_id"))
    )
    src = blocked.filter(F.col("lang") == src_lang).select(
        F.col("vec_id").alias("src_id"), "cell"
    )
    tgt = blocked.filter(F.col("lang") == tgt_lang).select(
        F.col("vec_id").alias("tgt_id"), "cell"
    )
    cand = src.join(tgt, "cell").select("src_id", "tgt_id").distinct()

    nx = emb.select("vec_id", l2_normalize(F.col("embedding")).alias("nx"))
    na = nx.select(F.col("vec_id").alias("src_id"), F.col("nx").alias("nxa"))
    nb = nx.select(F.col("vec_id").alias("tgt_id"), F.col("nx").alias("nxb"))
    scored = (
        cand.join(na, "src_id")
        .join(nb, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(dot(F.col("nxa"), F.col("nxb")), round_digits).alias("sim"),
        )
        .filter(F.col("sim") > 0)
    )

    def topk_mean(df: DataFrame, side: str) -> DataFrame:
        w = Window.partitionBy(side).orderBy(
            F.desc("sim"), F.asc("tgt_id" if side == "src_id" else "src_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .groupBy(side)
            .agg(
                (
                    F.sum(F.col("sim").cast("decimal(12,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias(f"den_{side[0]}")
            )
        )

    da = topk_mean(scored, "src_id")
    db = topk_mean(scored, "tgt_id")
    margin = F.round(
        F.col("sim") / ((F.col("den_s") + F.col("den_t")) / F.lit(2.0)),
        round_digits,
    )
    best = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    return (
        scored.join(da, "src_id")
        .join(db, "tgt_id")
        .select("src_id", "tgt_id", "sim", margin.alias("margin"))
        .filter(F.col("margin") >= min_margin)
        .withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select("src_id", "tgt_id", "sim", "margin")
    )
