"""Bloom-filter decontamination: structural guarantees the oracle parity
test (c10 in test_corpus_queries) can't express on its own —
no-false-negatives, bitset/membership equivalence, and broadcastability.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mtg_vector_db_spark.operators import bloom as B
from mtg_vector_db_spark.operators.dedup import word_shingles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_no_false_negatives(spark):
    """Every document probed against a filter built from ITSELF must hit on
    all shingles — Bloom filters can false-positive, never false-negative."""
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "red widget blue bolt hot gear cold ring"),
        ],
    )
    bloom = B.build_bloom(docs)
    out = B.probe_bloom(docs, bloom).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_hits"] == r["n_shingles"], r
        assert r["hit_ratio"] == 1.0


def test_disjoint_vocab_rarely_hits(spark):
    """Disjoint vocabularies should (at 2^20 bits / handful of shingles)
    produce zero hits — collisions at this load factor are ~impossible."""
    build = _docs(spark, [(1, "aa bb cc dd ee ff gg hh")])
    probe = _docs(spark, [(2, "xx yy zz ww vv uu tt ss")])
    out = B.probe_bloom(probe, B.build_bloom(build)).collect()
    assert len(out) == 1
    assert out[0]["n_hits"] == 0


def test_bitset_equals_membership_semantics(spark):
    """The packed-bitset probe must agree exactly with the definitional
    position-set-membership formulation (what the DuckDB oracle replays):
    a shingle hits iff ALL its k positions were set by some build shingle."""
    build = _docs(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog")],
    )
    probe = _docs(
        spark,
        [
            (10, "quick brown fox jumps high above"),
            (11, "entirely different words here now"),
        ],
    )
    bloom = B.build_bloom(build)
    fast = {
        (r["doc_id"], r["n_hits"])
        for r in B.probe_bloom(probe, bloom).collect()
    }

    build_pos = (
        build.select(F.explode(word_shingles(F.col("text"))).alias("sh"))
        .select(F.explode(B.bloom_positions(F.col("sh"))).alias("pos"))
        .distinct()
    )
    probe_sh = probe.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("sh")
    )
    ref = (
        probe_sh.select(
            "doc_id",
            "sh",
            F.explode(F.array_distinct(B.bloom_positions(F.col("sh")))).alias("pos"),
        )
        .join(build_pos.withColumn("present", F.lit(True)), "pos", "left")
        .groupBy("doc_id", "sh")
        .agg(F.bool_and(F.coalesce("present", F.lit(False))).alias("hit"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("hit").cast("int")).alias("n_hits"))
    )
    slow = {(r["doc_id"], r["n_hits"]) for r in ref.collect()}
    assert fast == slow


def test_bloom_build_is_bounded_and_broadcast(spark, sf001):
    """The build side never exceeds n_bits/64 rows regardless of corpus
    size, and the probe plan broadcasts it (no corpus-sized shuffle)."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    bloom = B.build_bloom(docs)
    assert bloom.count() <= B.BLOOM_N_BITS // 64
    plan = B.probe_bloom(docs, bloom)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_merge_blooms_equals_build_on_union(spark):
    """bit_or merge of two filters ≡ one filter over the concatenated
    corpora — the mergeable-sketch property incremental benchmark drops
    rely on."""
    d1 = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    d2 = _docs(spark, [(2, "one two three four five six")])
    merged = B.merge_blooms(B.build_bloom(d1), B.build_bloom(d2))
    full = B.build_bloom(d1.unionByName(d2))
    m = {(r["word_idx"], r["word"]) for r in merged.collect()}
    f = {(r["word_idx"], r["word"]) for r in full.collect()}
    assert m == f


def test_merge_blooms_idempotent(spark):
    d1 = _docs(spark, [(1, "alpha beta gamma delta epsilon")])
    bl = B.build_bloom(d1)
    twice = B.merge_blooms(bl, bl)
    assert {(r["word_idx"], r["word"]) for r in twice.collect()} == {
        (r["word_idx"], r["word"]) for r in bl.collect()
    }


def test_bloom_fill_stats_counts_every_set_bit(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    bloom = B.build_bloom(docs)
    row = B.bloom_fill_stats(bloom).collect()[0]
    from pyspark.sql import functions as F

    n_pos = (
        docs.select(F.explode(word_shingles(F.col("text"))).alias("sh"))
        .select(F.explode(B.bloom_positions(F.col("sh"))).alias("pos"))
        .distinct()
        .count()
    )
    assert row["bits_set"] == n_pos
    assert 0.0 < row["fill_ratio"] < 1.0
    assert abs(row["expected_fpr"] - row["fill_ratio"] ** 3) < 1e-9
