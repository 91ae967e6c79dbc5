"""CLI entry point — the reference's ``search_strategies.py main()``
(db/search_strategies.py:497-604) and ``search_with_reranker.py main``
(db/search_with_reranker.py:330-347) as one dispatcher over the api facade.

Where the reference parses argv, opens a psycopg2 connection, constructs an
OllamaEmbedder, and ships SQL strings to Postgres, this builds a
SparkSession, reads the parquet corpus, and dispatches to the same-named
search functions; the embedder defaults to the deterministic hash stub and
accepts a real backend exactly like :mod:`mtg_vector_db_spark.api`.

    python -m mtg_vector_db_spark.cli name "blue bolt"
    python -m mtg_vector_db_spark.cli desc "flying creature" --final-k 5
    python -m mtg_vector_db_spark.cli all "deathtouch" --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

SEARCH_TYPES = ("name", "desc", "similar", "all", "ambiguous")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mtg-vector-db-spark",
        description="Tiered / semantic / hybrid search over the parquet corpus",
    )
    p.add_argument("search_type", choices=SEARCH_TYPES)
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10, help="top-k (name/similar/ambiguous)")
    p.add_argument("--initial-k", type=int, default=30)
    p.add_argument("--final-k", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    p.add_argument("--master", default="local[4]")
    return p


def _env_embed():
    """``$SPARK_GRAFT_EMBED_URL`` set ⇒ embed queries through the HTTP
    backend (the reference's Ollama call with its retry/backoff contract,
    /root/reference/db/db_utils.py:100-136); unset ⇒ None, and the api
    falls back to the deterministic hash stub. ``$SPARK_GRAFT_EMBED_DIM``
    (default 64) and ``$SPARK_GRAFT_EMBED_MODEL`` ride along."""
    url = os.environ.get("SPARK_GRAFT_EMBED_URL")
    if not url:
        return None
    from mtg_vector_db_spark.functions.backends import http_embed_backend

    be = http_embed_backend(
        url,
        dim=int(os.environ.get("SPARK_GRAFT_EMBED_DIM", "64")),
        model=os.environ.get("SPARK_GRAFT_EMBED_MODEL"),
    )

    def embed(spark, query: str) -> list:
        return [float(x) for x in be([query])[0]]

    return embed


def _env_reranker():
    """``$SPARK_GRAFT_RERANK_URL`` set ⇒ the desc arm reranks through the
    HTTP listwise backend (reference reply format + identity fallback,
    db/db_utils.py:283-344); unset ⇒ None (deterministic stub)."""
    url = os.environ.get("SPARK_GRAFT_RERANK_URL")
    if not url:
        return None
    from mtg_vector_db_spark.functions.backends import http_rerank_backend

    return http_rerank_backend(
        url, model=os.environ.get("SPARK_GRAFT_RERANK_MODEL")
    )


def run_search(spark, args) -> "list":
    """Dispatch on search type (the :540-597 switch) and collect rows."""
    from mtg_vector_db_spark import api

    embed = _env_embed()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    if args.search_type == "name":
        names = (
            spark.read.parquet(f"{args.sf_dir}/part.parquet")
            .select(F.col("p_name").alias("name"))
            .distinct()
        )
        df = api.search_by_name(names, args.query, top_k=args.k)
    elif args.search_type == "desc":
        df = api.search_by_description(
            spark, docs, emb, args.query,
            initial_k=args.initial_k, final_k=args.final_k,
            embed=embed, ranker=_env_reranker(),
        )
    elif args.search_type == "similar":
        qv = (embed or api._embed_query)(spark, args.query)
        df = api.search_similar_documents(
            docs, emb, qv, match_threshold=args.threshold, match_count=args.k
        )
    elif args.search_type == "all":
        sources = sorted(
            r["source"] for r in docs.select("source").distinct().collect()
        )[:3]
        df = api.search_all_sources(
            spark, docs, emb, args.query, source_values=sources,
            embed=embed,
        )
    else:
        df = api.search_ambiguous(
            spark, docs, emb, args.query, top_k=args.k, embed=embed
        )
    return df.collect()


def format_rows(rows) -> str:
    """Reference-style display (db/search_strategies.py:438-461): rank,
    score-ish columns, 150-char text truncation."""
    if not rows:
        return "(no results)"
    lines = []
    for i, r in enumerate(rows, 1):
        d = r.asDict()
        text = d.pop("text", None)
        parts = [f"{i:2d}."] + [f"{k}={d[k]}" for k in d]
        if text is not None:
            t = text if len(text) <= 150 else text[:150] + "..."
            parts.append(f"text={t!r}")
        lines.append("  ".join(parts))
    return "\n".join(lines)


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    owns_session = spark is None
    if owns_session:
        from mtg_vector_db_spark.session import get_spark

        spark = get_spark("mtg-search-cli", master=args.master)
        spark.sparkContext.setLogLevel("ERROR")
    try:
        rows = run_search(spark, args)
        print(format_rows(rows))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
