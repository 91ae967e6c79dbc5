"""Dedup suite: oracle parity + LSH recall against the exact baseline."""

from __future__ import annotations

import pytest

from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

DEDUP_QUERIES = [n for n in registry.QUERIES if n.startswith("d")]


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_oracle_parity(spark, sf001, name):
    if name not in registry.ORACLES:
        pytest.skip("rows-only query")
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)


def test_lsh_recall_on_planted_dups(spark, sf001):
    """LSH must recover ~all high-similarity pairs the exact scan finds."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in registry.QUERIES["d02_jaccard_pairs_exact"](spark, sf001).collect()
        if r["jaccard"] >= 0.8
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in registry.QUERIES["d03_minhash_lsh_pairs"](spark, sf001).collect()
    }
    assert exact, "expected planted near-duplicates in the test corpus"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} on j>=0.8 pairs"


def test_simhash_separates_neardups(spark, sf001):
    rows = registry.QUERIES["d05_simhash_neardup"](spark, sf001).collect()
    assert rows, "expected simhash near-dup pairs on planted duplicates"
    assert all(r["hamming"] <= 10 for r in rows)


def test_bucket_cap_guards_skew_but_keeps_planted_pairs(spark, sf001):
    """With a generous cap the planted near-dups still surface; candidates
    from degenerate hot buckets are dropped (subset of the uncapped run)."""
    from mtg_vector_db_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    uncapped = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, max_bucket_size=50).collect()
    }
    assert capped <= uncapped
    assert capped  # the planted duplicate pairs survive a 50-row cap

    fps = simhash_fingerprints(docs)
    un = {(r["id_a"], r["id_b"]) for r in simhash_neardup_pairs(fps).collect()}
    cp = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(fps, max_bucket_size=50).collect()
    }
    assert cp <= un and cp