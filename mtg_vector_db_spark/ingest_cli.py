"""Ingestion CLI — the reference's ``ingest_all.py`` / ``ingest_cards.py``
entry point (SURVEY.md §3.3; /root/reference/db/ingest_all.py:16-30,
db/ingest_cards.py:112-361) as one command over the Spark ingestion DAG.

Where the reference loops batches of 100 through per-row dup probes,
INSERTs, and serial HTTP embedding calls (30-60 min for 30k cards), this
runs sources.readers → operators.ingest.ingest_cards →
sources.sinks as one lineage: the dedup is a single anti-join, the
embedder is an Arrow-batched pandas UDF (deterministic hash stub by
default; a real backend plugs into ``make_embedder``), and rejected rows
land in a quarantine sink instead of a log file.

    python -m mtg_vector_db_spark.ingest_cli cards.json /tmp/out
    python -m mtg_vector_db_spark.ingest_cli cards.json /tmp/out \\
        --existing /tmp/out/documents.parquet   # idempotent re-run
"""

from __future__ import annotations

import argparse
import sys

from mtg_vector_db_spark.operators.ingest import ingest_cards
from mtg_vector_db_spark.sources.readers import read_name_keyed_json
from mtg_vector_db_spark.sources.sinks import overwrite, quarantine


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mtg-vector-db-spark-ingest",
        description="Ingest a name-keyed card JSON file into parquet",
    )
    p.add_argument("cards_json")
    p.add_argument("out_dir")
    p.add_argument(
        "--existing",
        default=None,
        help="prior documents.parquet; its card_names are skipped (S9/J2)",
    )
    p.add_argument("--master", default="local[4]")
    return p


def run_ingest(spark, args) -> dict[str, int]:
    """Execute the DAG and write the three sinks; returns the A6 success
    stats the reference prints (ingest_cards.py:353-359)."""
    raw = read_name_keyed_json(spark, args.cards_json)
    existing = (
        spark.read.parquet(args.existing) if args.existing else None
    )
    docs, embs, rejected = ingest_cards(raw, existing_docs=existing)
    overwrite(docs, f"{args.out_dir}/documents.parquet")
    overwrite(embs, f"{args.out_dir}/embeddings.parquet")
    quarantine(rejected, f"{args.out_dir}/rejected.parquet", "dup-or-invalid")
    return {
        "documents": spark.read.parquet(
            f"{args.out_dir}/documents.parquet"
        ).count(),
        "embeddings": spark.read.parquet(
            f"{args.out_dir}/embeddings.parquet"
        ).count(),
        "rejected": spark.read.parquet(
            f"{args.out_dir}/rejected.parquet"
        ).count(),
    }


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    owns_session = spark is None
    if owns_session:
        from mtg_vector_db_spark.session import get_spark

        spark = get_spark("mtg-ingest-cli", master=args.master)
        spark.sparkContext.setLogLevel("ERROR")
    try:
        stats = run_ingest(spark, args)
        print(
            "ingested: "
            + ", ".join(f"{k}={v}" for k, v in sorted(stats.items()))
        )
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
