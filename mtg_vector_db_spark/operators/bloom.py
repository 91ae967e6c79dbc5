"""Bloom-filter membership testing for corpus decontamination.

The scale problem: decontaminating a 100 TB training corpus against a
benchmark suite means testing every training-document shingle against the
benchmark's shingle set. A semi-join works but shuffles the full corpus on
the shingle key; the classic fix is a Bloom filter — build a fixed-size
bitset over the benchmark shingles once, broadcast it, and probe map-side
with zero shuffle on the corpus. The corpus-side plan is then a pure
map + broadcast-hash-join against a ≤``n_bits/64``-row build side
(128 KiB of bitset at the default 2^20 bits), regardless of corpus size.

Everything is md5-deterministic (same universal-hash family as MinHash,
``dedup.minhash_coeffs``) so the DuckDB oracle replays the EXACT filter,
false positives included: a bit is set iff some build shingle hashed to
that position, so bit-membership is literally position-set membership and
the oracle can check it without 64-bit bitset arithmetic.

Reference anchor: the reference has no decontamination tooling at all
(its dedup surface is `db/ingest_cards.py:240-258` exact-key skip); this
family is part of the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mtg_vector_db_spark.operators.dedup import (
    MINHASH_P,
    minhash_coeffs,
    widen,
    word_shingles,
)

BLOOM_N_BITS = 1 << 20  # 2^20 bits = 16384 longs = 128 KiB broadcast
BLOOM_K = 3  # hash functions per element


def _base_hash(s: Column) -> Column:
    """60-bit md5 fold of a string, reduced mod MINHASH_P (one md5 per
    shingle; the k position variants are integer mixes of this value)."""
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % MINHASH_P
    )


def bloom_positions(s: Column, n_bits: int = BLOOM_N_BITS, k: int = BLOOM_K) -> Column:
    """Array of ``k`` bit positions for a shingle: affine mixes of the
    base hash mod ``n_bits`` (products stay < 2^62, no overflow)."""
    h = _base_hash(s)
    return F.array(
        *[((F.lit(a) * h + F.lit(b)) % MINHASH_P) % n_bits for a, b in minhash_coeffs(k)]
    )


def build_bloom(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build the packed bitset: one row per 64-bit word that has any bit
    set — ``(word_idx bigint, word bigint)``.

    Plan shape: shingle explode → position explode (×k) → distinct
    positions (one shuffle, keyed on a value bounded by n_bits) →
    groupBy word_idx bit_or. Output is ≤ n_bits/64 rows — always
    broadcastable no matter how large the benchmark corpus is.
    """
    pos = (
        widen(docs).select(
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh")
        )
        .select(F.explode(bloom_positions(F.col("sh"), n_bits, k)).alias("pos"))
        .distinct()
    )
    return pos.groupBy((F.col("pos") / 64).cast("bigint").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")).alias(
            "word"
        )
    )


def probe_bloom(
    docs: DataFrame,
    bloom: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Per-document probe: how many of the document's distinct shingles
    hit the filter (all ``k`` bits set).

    The probe side never shuffles on data-sized keys: positions
    broadcast-join the bitset, then everything reduces back on the
    document id the rows were already keyed by. Returns
    ``(doc_id, n_shingles, n_hits, hit_ratio)``.
    """
    sh = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    probes = sh.select(
        "doc_id",
        "sh",
        F.explode(F.array_distinct(bloom_positions(F.col("sh"), n_bits, k))).alias("pos"),
    ).withColumn("word_idx", (F.col("pos") / 64).cast("bigint"))
    tested = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "bit_set",
            F.coalesce(
                F.col("word").bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
                )
                != 0,
                F.lit(False),
            ),
        )
        .groupBy("doc_id", "sh")
        .agg(F.bool_and("bit_set").alias("hit"))
    )
    return (
        tested.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("hit").cast("int")).alias("n_hits"),
        )
        .withColumn(
            "hit_ratio", F.round(F.col("n_hits") / F.col("n_shingles"), 6)
        )
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Flag training documents sharing any shingle with a benchmark set,
    via a broadcast Bloom filter built over the benchmark's shingles.

    Returns flagged documents only: ``(doc_id, n_shingles, n_hits,
    hit_ratio)`` — the candidate set a downstream exact check (or a
    drop policy) consumes. Unflagged documents never leave the map side.
    """
    bloom = build_bloom(benchmark, text_col, shingle_n, n_bits, k)
    return probe_bloom(docs, bloom, id_col, text_col, shingle_n, n_bits, k).filter(
        F.col("n_hits") > 0
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two packed bitsets built with the same (n_bits, k) config:
    ``bit_or`` per word. Bloom filters are mergeable sketches — union is
    associative, commutative, and idempotent — so benchmark suites can be
    filtered INCREMENTALLY: build a bitset per new benchmark drop, merge
    into the serving filter, never rebuild over the full history. Exactly
    equivalent to building over the concatenated corpora (pinned by
    test_bloom.py).
    """
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_fill_stats(bloom: DataFrame, n_bits: int = BLOOM_N_BITS, k: int = BLOOM_K) -> DataFrame:
    """One-row filter diagnostic: bits set, fill ratio, and the standard
    expected false-positive rate ``(bits_set/m)^k`` at the current load.
    The operational knob: when expected_fpr drifts above budget, rebuild
    with a larger ``n_bits`` (the build is one cheap pass over the
    benchmark corpus).
    """
    return bloom.agg(
        F.sum(F.bit_count("word")).alias("bits_set"),
    ).select(
        "bits_set",
        F.round(F.col("bits_set") / F.lit(float(n_bits)), 9).alias("fill_ratio"),
        F.round(
            F.pow(F.col("bits_set") / F.lit(float(n_bits)), float(k)), 9
        ).alias("expected_fpr"),
    )
