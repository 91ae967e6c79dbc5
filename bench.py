#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative subset of the registered query inventory (one per
family: relational agg/join, windowed events, KNN, trigram, MinHash-LSH
dedup, retrieve-rerank pipeline, IVF search) on local[$SPARK_GRAFT_CPUS].

Each query runs SPARK_GRAFT_BENCH_RUNS times (default 2) and reports the
median, so one-off JIT/GC noise can't masquerade as a regression. Each
run is fully materialized via a noop-format write so the timing covers
scan → shuffle → result, not plan construction.

Output contract (round-3 fix — round 2's single line outgrew the
driver's stdout tail capture and recorded ``parsed: null``):

- The FINAL stdout line is ONE COMPACT JSON summary — total wall-clock,
  sf, query count, runs per query, the round-over-round delta total, and
  (round-9 fix, round-8 VERDICT #2: the driver's PERF diff reads
  per-query medians from this line) a space-free per-query map rounded
  to 2 decimals (~2.4 KB for 93 queries) — small enough that any
  plausible tail capture holds it, and still the last line printed.
- The full-precision per-query median map (plus per-run raw timings and
  the per-query delta map) is written to ``BENCH_local_r{N}.json`` next
  to this script (N = latest driver-recorded round + 1), which is
  committed per round.
- ``spark.ui.showConsoleProgress`` is disabled so progress bars can't
  pollute the stdout tail.
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
    "d14_paragraph_dedup",      # CCNet cross-doc paragraph dedup (round 3)
    "c21_semdedup_keep",        # SemDeDup greedy cell-blocked semantic dedup
    "t28_ccnet_buckets",        # per-doc perplexity head/middle/tail bands
    "t29_hll_source_cardinality",  # HLL register sketch + exact-twin report
    "t30_cms_heavy_hitters",    # count-min sketch heavy-hitter report
    "c22_weighted_sample",      # A-ES weighted reservoir sample (0-shuffle)
    "c23_semantic_contamination",  # embedding-space eval decontamination
    "r78_logbin_quantiles",     # integer-bit DDSketch-style quantile sketch
    "c24_unimax_mix",           # UniMax water-filling mix allocation
    "t31_ngram_diversity",      # distinct-n diversity, one-shuffle 6 measures
    "p34_maxsim_late_interaction",  # ColBERT MaxSim multi-vector scoring
    "d16_winnow_overlap",       # MOSS winnowing, array-domain minima
    "d18_containment_pairs",    # asymmetric containment, posting join
    "v13_embedding_dispersion", # O(n*d) closed-form pairwise cosine
    "p35_hard_negatives",       # cross-label hard-negative mining
    "p36_nprobe_sweep",         # one-scan ANN knob sweep (recall curve)
    "p37_cascade_search",       # BM25 -> Hamming -> exact cascade
    "p39_prf_query_expansion",  # RM3 feedback expansion, in-plan loop
    "v16_power_iteration_pca",  # fixed-point spectral diagnostics
    # The iterative family (round-3 VERDICT #2): these are the most
    # expensive queries in the repo — graph construction/append, the
    # spectral top-2, the cluster-resolution chain — and their costs
    # previously lived only in SCALE.md prose, invisible to the
    # round-over-round delta. They dominate the headline total by
    # design; a regression here is exactly what the delta should catch.
    #
    # Round-7 (round-6 VERDICT #3): the graph family benches ONE
    # substrate build. p41/p42/p48 each rebuilt a base NN-Descent graph
    # in-body (~87 s of the r06 build subtotal was repeated substrate
    # construction); they stay registered and correctness-gated, but the
    # bench rows are now p40 (the build-cost row), p44 (beam serving
    # from the stored graph), and p51 (append+refresh maintenance from
    # the stored base graph — p48's serve face, oracle literally p48's).
    "p40_nn_descent_graph",     # O(n·k²) NN-Descent build + recall audit
    "v17_top2_spectrum",        # deflated 2-eigenvector power iteration
    "c01_dup_clusters",         # fixed-round CC over exact pairs
    "c07_dedup_apply",          # CC + keep-set report branches
    "c18_quality_keep",         # CC + per-cluster quality canonical
    "c25_quality_canonical",    # CC + canonical keep/moved report
    "c28_leakage_free_split",   # CC + cluster-hash split leak audit
    "c29_cc_convergence_audit", # fixed-round vs converged CC comparison
    "t36_bpe_merge_train",      # 6-round in-engine BPE merge training
    "t37_bpe_encode_stats",     # encode corpus under the learned vocab
    "t38_bpe_oov_encode",       # rank-order inference on unseen text
    # Stored-index SERVING rows (round-4 VERDICT #1/#5): these two read
    # content-addressed parquet artifacts (artifacts/ — built at most
    # once per corpus fingerprint) so the bench measures QUERY-TIME cost
    # for both serving arms, the number p42/p40 could not isolate.
    "p44_graph_serve_stored",   # beam walk over the FROZEN graph artifact
    "p45_ivf_serve_stored",     # DPP-pruned probe of the stored IVF layout
    "p46_pq_serve_stored",      # code-only scan + bounded rescore (stored PQ)
    "t39_bpe_batched_train",    # multi-merge BPE round w/ recursive-CTE oracle
    "t40_trigram_serve_stored", # GIN-analog posting-list probe (stored index)
    "p47_ivfpq_serve_stored",   # combined IVF-PQ: DPP cells + code-only ADC
    "t41_bm25_serve_stored",    # BM25 from the stored posting index (round 6)
    "v18_mrl_operating_points",    # MRL prefix×oversample recall frontier
    "p49_two_level_assign",        # IMI two-level coarse assignment + agreement
    "p50_lsh_serve_stored",        # E2LSH bucket-table lookup serving
    "v19_mrl_serve_stored",        # MRL prefix-column artifact serving
    "p51_graph_refresh_serve_stored",  # append+refresh from stored graph
    "p52_two_level_operating_points",  # two-level serving-recall sweep
    "p53_imi_search",              # full IMI: 2-level assign + 2-level probe
    "v20_mrl_decayed_frontier",    # MRL sweep on the decayed-spectrum fixture
    # Round 8 (VERDICT #1): mining workloads served from the stored IVF
    # layout — query-TABLE probes, DPP-pruned artifact scans, zero
    # in-plan index rebuild.
    "p54_hard_negatives_served_stored",  # 50-anchor hard-negative mining
    "c31_semdedup_keep_stored",          # SemDeDup on the stored cell layout
]


# Cost-class labels (round-5 VERDICT #3): BUILD rows construct an index
# inside the query body (self-contained oracle forms — a real deployment
# pays them once per corpus, the reference's 45-75 min ingest+index,
# QUICKSTART.md:109); SERVE rows read a frozen artifact / pruned layout
# and measure per-query cost. Everything unlabeled is an ordinary query.
# The split makes "30% of the headline is build-amortizable" a mechanical
# subtotal instead of SCALE.md prose.
CLASSES = {
    "p40_nn_descent_graph": "build",
    "p41_graph_index_append": "build",
    "p42_graph_beam_search": "build",
    "t36_bpe_merge_train": "build",
    "t39_bpe_batched_train": "build",
    "p48_graph_refresh_appended": "build",
    "p04_ivf_search": "serve",
    "p44_graph_serve_stored": "serve",
    "p45_ivf_serve_stored": "serve",
    "p46_pq_serve_stored": "serve",
    "p47_ivfpq_serve_stored": "serve",
    "t40_trigram_serve_stored": "serve",
    "t41_bm25_serve_stored": "serve",
    "p50_lsh_serve_stored": "serve",
    "v19_mrl_serve_stored": "serve",
    # Incremental maintenance from a stored artifact: O(new) work per
    # cycle, no substrate rebuild — serve-class by the same logic as the
    # stored-index probes above.
    "p51_graph_refresh_serve_stored": "serve",
    "p53_imi_search": "serve",
    "p54_hard_negatives_served_stored": "serve",
    "c31_semdedup_keep_stored": "serve",
}

# Machine-state controls (round-5 VERDICT #4): three pinned queries whose
# call paths have not changed since round 1, one per execution family —
# pure JVM codegen agg (r01), HOF/vector arithmetic + TakeOrdered (v01),
# shuffle-heavy band join (d03). Their committed reference medians below
# are the baseline; the index is the median current/reference ratio.
# A cross-round per-query delta divided by this index separates "the host
# is 1.3x slower today" (round 5 burned a manual control sweep proving
# exactly that) from a real regression. Only meaningful at sf0.1.
#
# PROTOCOL-V2 RE-BASELINE (round 8, round-7 VERDICT #2 / ADVICE): the
# reference medians are now from a protocol-v2 run (per-query untimed
# warmup — the round-8 calibration run, machine_state index 0.986
# against the old v1 reference, i.e. host state ≈ the r01 reference
# host), so the index is self-consistent for every v2 round. Historical
# lineage: rounds 1-7 normalized against BENCH_r01.json v1 medians
# (r01 1.802 / v01 0.672 / d03 2.322); v2 reads ~15-25% lower for equal
# host state on warm-sensitive queries, which is why cross-protocol
# normalized deltas (r07→r08) stay biased and only raw deltas are
# comparable across that boundary.
MACHINE_CONTROLS = {
    "r01_pricing_summary": 1.777,   # round-8 v2 calibration run, sf0.1
    "v01_knn_topk": 0.678,
    "d03_minhash_lsh_pairs": 2.141,
}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")), 1)

    registry.load_all()
    # Progress bars write carriage-return spinners to stdout; with a
    # bounded tail capture they can evict the result line. Off for bench
    # (context-build-time config — cannot be set after the JVM starts).
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
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

    # Protocol v2 (round 7): every headline query gets
    # SPARK_GRAFT_BENCH_WARMUP (default 1) UNTIMED warmup run before its
    # timed runs — the round-6 ADVICE's "equivalent untimed warmup per
    # headline query". Why: with 2-run medians and no per-query warmup,
    # a query's number depended on HOW MUCH of the bench ran before it
    # (JIT/code-cache state), so changing the HEADLINE set changed other
    # queries' numbers — removing the ~87 s of redundant graph builds
    # made the c-family read +1-2 s slower on IDENTICAL code (controlled
    # experiment in SCALE.md round-7: c25 cold 14.9 s vs warmed 4.4 s).
    # Steady-state medians are set-composition-independent; the controls
    # get the same treatment, so the machine-state index stays
    # self-consistent (it reads ~15-25% lower than protocol-v1 rounds
    # for equal host state — a one-time calibration shift, documented).
    n_warm = max(int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")), 0)
    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        for _ in range(n_warm):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        med = round(_median(runs), 3)
        timings[name] = med
        raw_runs[name] = runs
        total += med

    # Machine-state index from the HEADLINE-LOOP medians themselves
    # (round-6 ADVICE: a dedicated pre-loop gave exactly the three
    # control queries extra JIT/code-cache warmup that the round-1
    # reference medians — which came from round 1's headline loop —
    # never had, biasing the ratios fast). Reusing the loop medians puts
    # controls and reference in identical JVM conditions, and the
    # per-query deltas the index normalizes come from this same loop.
    machine_state = None
    if sf == 0.1 and all(n in timings for n in MACHINE_CONTROLS):
        ratios = {
            name: round(timings[name] / ref, 3)
            for name, ref in MACHINE_CONTROLS.items()
        }
        machine_state = {
            "controls": ratios,
            # Median ratio: robust to one control drifting for a real
            # (code) reason — two of three families must move together
            # before the index moves.
            "index": _median(sorted(ratios.values())),
            "reference": (
                "round-8 protocol-v2 calibration medians, sf0.1 "
                "(re-baselined from BENCH_r01.json v1 — see "
                "MACHINE_CONTROLS note)"
            ),
            "source": "headline-loop medians, protocol v2",
        }

    classes = {n: CLASSES.get(n, "query") for n in timings}
    subtotals = {
        cls: round(
            sum(t for n, t in timings.items() if classes[n] == cls), 3
        )
        for cls in ("build", "serve", "query")
    }

    detail = {
        "metric": "headline_total_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "runs": raw_runs,
        "runs_per_query": n_runs,
        "warmup_runs_per_query": n_warm,
        "class": classes,
        "class_subtotals": subtotals,
        "sf": sf,
    }
    if machine_state is not None:
        detail["machine_state_index"] = machine_state["index"]
        detail["machine_state"] = machine_state

    # Round-over-round delta: compare per-query medians against the PRIOR
    # round's committed record — prefer BENCH_local_r*.json (full map),
    # fall back to driver BENCH_r*.json (whose bench line is under
    # "parsed"). Only queries present in both runs compare.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))

    # The round this run belongs to: one past the latest driver-recorded
    # BENCH_r{N}.json. Computed BEFORE the delta scan so this round's own
    # local snapshot (from an earlier run in the same round) is never the
    # delta base — round 3's file said "delta_vs: <itself>", which a
    # reader can't reconstruct without git archaeology (VERDICT #3 fix).
    rounds = [
        int(mm.group(1))
        for f in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (mm := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    this_round = max(rounds, default=0) + 1
    local_name = f"BENCH_local_r{this_round:02d}.json"

    def _round_key(f: str) -> tuple[int, bool]:
        mm = re.search(r"BENCH(?:_local)?_r(\d+)\.json$", f)
        # Local rN is written during round N (after the driver's rN-1),
        # so at equal round numbers the local file is the newer record.
        return (
            int(mm.group(1)) if mm else -1,
            "_local_" in os.path.basename(f),
        )

    prev_files = sorted(
        (
            f
            for f in glob.glob(os.path.join(here, "BENCH_local_r*.json"))
            + glob.glob(os.path.join(here, "BENCH_r*.json"))
            # Exclude this round's own snapshot: the delta base must be
            # a file the PRIOR round committed.
            if os.path.basename(f) != local_name
        ),
        key=_round_key,
    )
    # Newest usable record wins; skip any with no queries map (e.g. a
    # parsed:null round) or a different sf (cross-sf deltas are
    # meaningless).
    for prev_file in reversed(prev_files):
        try:
            with open(prev_file) as fh:
                prev = json.load(fh)
            if "queries" not in prev and isinstance(prev.get("parsed"), dict):
                prev = prev["parsed"]
            prev_q = prev.get("queries")
            if not isinstance(prev_q, dict) or prev.get("sf") != sf:
                continue
            delta = {
                n: round(timings[n] - prev_q[n], 3)
                for n in timings
                if n in prev_q
            }
            detail["delta_vs"] = os.path.basename(prev_file)
            detail["delta"] = delta
            detail["delta_total"] = round(sum(delta.values()), 3)
            # Normalized delta (round-5 VERDICT #4): rescale both runs
            # to the round-1 reference machine via their machine-state
            # indexes before differencing, so a uniform host slowdown
            # reads as ~0 here while a real per-query regression
            # survives. Older records without an index normalize only
            # the current side.
            msi_cur = (
                machine_state["index"] if machine_state is not None else None
            )
            if msi_cur:
                msi_prev = prev.get("machine_state_index") or 1.0
                delta_norm = {
                    n: round(
                        timings[n] / msi_cur - prev_q[n] / msi_prev, 3
                    )
                    for n in timings
                    if n in prev_q
                }
                detail["delta_normalized"] = delta_norm
                detail["delta_normalized_total"] = round(
                    sum(delta_norm.values()), 3
                )
            break
        except (OSError, ValueError, KeyError, TypeError):
            continue

    # Full detail goes to a committed per-round snapshot.
    local_path = os.path.join(here, local_name)
    try:
        with open(local_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        local_path = None

    # The FINAL line is the compact machine-parsed summary (the driver's
    # tail capture is bounded — keep this line small and last).
    #
    # Round 9 (round-8 VERDICT #2 / PERF contract): the driver's PERF
    # comparison diffs the per-query map FROM THIS LINE — without it,
    # PERF_r08.json came up with n_common: 0 / per_query: {} and the
    # whole round-over-round analysis had to be reconstructed by hand.
    # The map returns here in its most compact form: medians rounded to
    # 2 decimals, no spaces (json separators), keys sorted — 93 queries
    # ≈ 2.4 KB, well under any plausible tail capture, and the line
    # stays LAST. The full-precision map + raw runs + deltas still live
    # in BENCH_local_r{N}.json (committed per round).
    summary = {
        "metric": "headline_total_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "runs_per_query": n_runs,
        "queries": {n: round(t, 2) for n, t in sorted(timings.items())},
        "queries_file": os.path.basename(local_path) if local_path else None,
    }
    for k in (
        "delta_vs",
        "delta_total",
        "delta_normalized_total",
        "machine_state_index",
        "class_subtotals",
    ):
        if k in detail:
            summary[k] = detail[k]
    spark.stop()
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
