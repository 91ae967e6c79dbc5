"""The reference-shaped facade: each entry point runs with reference
defaults and returns the reference's result shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from mtg_vector_db_spark import api
from mtg_vector_db_spark.plans.vector_queries import query_vector


def test_search_similar_documents_defaults(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    out = api.search_similar_documents(docs, emb, qv, match_threshold=0.15)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    assert set(out.columns) == {"doc_id", "text", "sim"}
    assert all(r["sim"] > 0.15 for r in rows)


def test_search_by_name_tiers(spark, sf001):
    names = (
        spark.read.parquet(f"{sf001}/part.parquet")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    exact = api.search_by_name(names, names.first()["name"])
    assert exact.collect()[0]["match_type"] == "exact"
    fuzzy = api.search_by_name(names, "zzzz qqqq")
    assert all(r["match_type"] == "fuzzy" for r in fuzzy.collect())


def test_search_by_description_two_stage(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    out = api.search_by_description(spark, docs, emb, "flying creature").collect()
    assert len(out) == 10  # final_k default
    assert [r["rank"] for r in out] == list(range(1, 11))
    assert all(0.0 <= r["rerank_score"] <= 1.0 for r in out)


def test_search_all_sources_per_source_k(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    out = api.search_all_sources(
        spark, docs, emb, "deathtouch", source_values=sources[:3]
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts[sources[0]] <= 10 and counts[sources[2]] <= 5
    assert len(counts) == 3


def test_search_ambiguous_shape(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    rows = api.search_ambiguous(spark, docs, emb, "some vague thing").collect()
    assert len(rows) == 10
    assert all(r["match_type"] == "vector_ambiguous" for r in rows)
    ds = [r["distance"] for r in rows]
    assert ds == sorted(ds)  # nearest first


def test_cli_dispatch_all_types(spark, sf001, capsys):
    """The §3.1 CLI runs every search type end-to-end on a shared session
    and prints reference-style output."""
    from mtg_vector_db_spark import cli

    name = (
        spark.read.parquet(f"{sf001}/part.parquet").first()["p_name"]
    )
    for argv in (
        ["name", name, "--sf-dir", sf001],
        ["desc", "flying creature", "--sf-dir", sf001, "--final-k", "5"],
        ["similar", "deathtouch", "--sf-dir", sf001, "--threshold", "0.0"],
        ["all", "deathtouch", "--sf-dir", sf001],
        ["ambiguous", "counter target spell", "--sf-dir", sf001],
    ):
        assert cli.main(argv, spark=spark) == 0
        out = capsys.readouterr().out
        assert out.strip() and out.strip() != "(no results)"
        assert " 1." in out
