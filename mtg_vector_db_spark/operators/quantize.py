"""Binary quantization for embedding search (sign-bit signatures +
Hamming-distance candidate generation, exact-cosine rescore).

The reference's ANN is a pgvector HNSW index (db/init.sql:50-53); pgvector's
own scale path past HNSW-in-RAM is bit-quantized vectors reranked by exact
distance, and that two-stage shape is what fits Spark: a 64-dim float
embedding becomes two 32-bit words (16× smaller scan), candidates come from
a TakeOrdered over popcount(xor) — cheap JVM bit ops, no floats — and only
the ~k·oversample survivors touch full-precision cosine.

Signature packing is ONE nested higher-order expression (transform over
words, aggregate over bits) — deliberately not N sibling HOF columns, which
this Spark version miscompiles (see tests/test_properties.py pins).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.vector import cosine_similarity

WORD_BITS = 32  # 32 bits per packed word: stays positive in a signed long


def binary_signature(c: Column, dim: int) -> Column:
    """Sign-bit signature of an ``array<float>``: array of ceil(dim/32)
    longs, bit b of word w set iff ``c[w*32+b] > 0``.

    MSB-first Horner fold (``acc*2 + indicator``) — pure long arithmetic.
    An LSB-first ``acc + pow(2, b)`` formulation computes the same values
    but its 32 POWER() calls per word cost ~0.7 s more codegen/JIT on the
    first run of a plan (measured cold-process at sf0.1)."""
    n_words = math.ceil(dim / WORD_BITS)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(WORD_BITS - 1), F.lit(0), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2
            + F.when(
                F.element_at(c, (w * WORD_BITS + b + 1).cast("int")) > 0,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def signature_of(vec: Sequence[float]) -> list[int]:
    """Driver-side signature of a literal query vector (same packing)."""
    words = [0] * math.ceil(len(vec) / WORD_BITS)
    for i, x in enumerate(vec):
        if x > 0:
            words[i // WORD_BITS] |= 1 << (i % WORD_BITS)
    return words


def hamming_packed(a: Column, b: Column) -> Column:
    """popcount(xor) summed over packed words → bigint."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def hamming_unpacked(a: Column, b: Column) -> Column:
    """Reference formulation straight off the float arrays (count of dims
    whose signs disagree) — the form the DuckDB oracle replays; equals
    :func:`hamming_packed` over :func:`binary_signature` (property test)."""
    return F.size(
        F.filter(
            F.zip_with(a, b, lambda x, y: (x > 0) != (y > 0)),
            lambda v: v,
        )
    ).cast("long")


def bq_search(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int,
    oversample: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage binary-quantized search: top ``k*oversample`` by packed
    Hamming distance (ascending, id tie-break), exact-cosine rescore to
    top ``k`` → ``(doc_id, hamming, sim)``.

    At 100 TB the candidate stage scans only the signature column
    (ReadSchema-pruned) and plans TakeOrderedAndProject; the rescore
    touches ``k*oversample`` rows.
    """
    dim = len(query_vec)
    q_sig = F.array(*[F.lit(w).cast("long") for w in signature_of(query_vec)])
    sig = binary_signature(F.col(emb_col), dim)
    cand = (
        emb.select(
            F.col(id_col).alias("doc_id"),
            F.col(emb_col),
            hamming_packed(sig, q_sig).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("doc_id"))
        .limit(k * oversample)
    )
    sim = F.round(
        cosine_similarity(F.col(emb_col), list(query_vec)), round_digits
    )
    return (
        cand.withColumn("sim", sim)
        .select("doc_id", "hamming", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Scalar (int8) quantization — pgvector's halfvec/int8 storage analog: 4x
# smaller vectors at a measurable reconstruction error, trained from
# per-dimension ranges.
# ---------------------------------------------------------------------------
def sq_train(
    emb: DataFrame, emb_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) ranges — the SQ "codebook". One
    posexplode + 64-group aggregation; the 2×dim result is collected to
    the driver and re-broadcast as literals (same pattern as IVF
    centroids: train-then-apply, stats are tiny)."""
    mm = (
        emb.select(F.posexplode(emb_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("i")
        .collect()
    )
    return [float(r["lo"]) for r in mm], [float(r["hi"]) for r in mm]


def sq_quantize(c: Column, lo: Sequence[float], hi: Sequence[float]) -> Column:
    """array<float> → array<int> of 0..255 codes:
    ``floor((x-lo)/(hi-lo)*255 + 0.5)`` (explicit half-up — identical
    SQL semantics everywhere, unlike engine-specific round())."""
    lo_a = F.array(*[F.lit(v) for v in lo])
    hi_a = F.array(*[F.lit(v) for v in hi])
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(lo))),
        lambda i: F.when(
            F.element_at(hi_a, i) == F.element_at(lo_a, i), F.lit(0)
        )
        .otherwise(
            F.floor(
                (F.element_at(c, i).cast("double") - F.element_at(lo_a, i))
                / (F.element_at(hi_a, i) - F.element_at(lo_a, i))
                * 255
                + 0.5
            )
        )
        .cast("int"),
    )


def sq_dequantize(
    q: Column, lo: Sequence[float], hi: Sequence[float]
) -> Column:
    """Codes → reconstructed doubles: ``lo + q/255*(hi-lo)``."""
    lo_a = F.array(*[F.lit(v) for v in lo])
    hi_a = F.array(*[F.lit(v) for v in hi])
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(lo))),
        lambda i: F.element_at(lo_a, i)
        + F.element_at(q, i) / 255.0
        * (F.element_at(hi_a, i) - F.element_at(lo_a, i)),
    )


def sq_reconstruction_error(
    emb: DataFrame,
    lo: Sequence[float],
    hi: Sequence[float],
    emb_col: str = "embedding",
) -> Column:
    """Squared L2 reconstruction error per row (fold over dims — fixed
    evaluation order, so an SQL engine replays it exactly)."""
    deq = sq_dequantize(sq_quantize(F.col(emb_col), lo, hi), lo, hi)
    dbl = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(dbl, deq, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
