"""Physical-plan shape assertions — the 100 TB contract.

Correctness tests prove the operators compute the right answer at small sf;
these prove the PLANS are the ones that survive a 1000-executor scale-up:

* KNN must plan ``TakeOrderedAndProject`` (k rows per partition, no global
  sort of the corpus);
* dimension joins must broadcast (no shuffle of the fact side's keys);
* filters and projections must reach the parquet scan (``PushedFilters`` /
  ``ReadSchema``) — a scan that reads all columns for a 2-column query is
  wrong at any scale;
* an IVF cell-partitioned layout must prune partitions at the scan
  (the layout IS the index).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mtg_vector_db_spark.operators import knn as K
from mtg_vector_db_spark.plans import registry

registry.load_all()


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qvec(spark, sf0001):
    row = (
        spark.read.parquet(f"{sf0001}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(1)
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def test_knn_plans_take_ordered(spark, sf0001, qvec):
    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    plan = physical(K.knn(emb, qvec, 10))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort anywhere in the KNN plan


def test_knn_embedding_scan_prunes_columns(spark, sf0001, qvec):
    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    plan = physical(K.knn(emb, qvec, 10))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "embedding" in scan and "vec_id" in scan
    assert "label" not in scan  # unused column never leaves the parquet reader


def test_knn_with_documents_broadcasts_topk(spark, sf0001, qvec):
    docs = spark.read.parquet(f"{sf0001}/documents.parquet")
    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    plan = physical(K.knn_with_documents(docs, emb, qvec, 10))
    assert "BroadcastHashJoin" in plan


def test_dim_join_broadcasts(spark, sf001):
    plan = physical(registry.QUERIES["r02_revenue_by_nation"](spark, sf001))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims are broadcast-size


def test_filter_pushdown_reaches_scan(spark, sf001):
    orders = spark.read.parquet(f"{sf001}/orders.parquet")
    q = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    plan = physical(q)
    pushed = plan[plan.index("PushedFilters"):].splitlines()[0]
    assert "o_orderstatus" in pushed


def test_q6_litmus_pushdown_and_pruning(spark, sf001):
    """r39 is the pushdown litmus: every predicate reaches the scan, the
    ReadSchema holds exactly the four columns used, and no shuffle beyond
    the 1-row final aggregate exists."""
    plan = physical(registry.QUERIES["r39_forecast_revenue"](spark, sf001))
    scan = plan[plan.index("FileScan"):].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan[scan.index("PushedFilters"):], col
    schema = scan[scan.index("ReadSchema"):]
    assert all(
        c in schema
        for c in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    )
    assert "l_orderkey" not in schema  # pruned
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_ivf_partitioned_layout_prunes(spark, sf0001, tmp_path):
    """Writing the corpus partitioned by IVF cell turns the nprobe filter
    into scan-time partition pruning — the claim in operators/ann.py."""
    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    path = str(tmp_path / "ivf_layout")
    emb.write.partitionBy("label").mode("overwrite").parquet(path)

    pruned = spark.read.parquet(path).filter(F.col("label").isin([0, 1]))
    plan = physical(pruned)
    scan = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "label" in scan
    # Only the probed cells' files are read.
    n_all = spark.read.parquet(path).count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_all


def test_knn_join_broadcasts_queries(spark, sf0001):
    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = physical(K.knn_join(emb, queries, 5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_explain_tool_lists_and_prints(spark, sf0001, capsys):
    from mtg_vector_db_spark import explain

    assert explain.main(["--list"], spark=spark) == 0
    listing = capsys.readouterr().out
    assert "v01_knn_topk  [oracle]" in listing
    assert (
        explain.main(["v01_knn_topk", "--sf-dir", sf0001], spark=spark) == 0
    )
    plan = capsys.readouterr().out
    assert "TakeOrderedAndProject" in plan and "#x" in plan
    assert explain.main(["nope", "--sf-dir", sf0001], spark=spark) == 2
    assert (
        explain.main(
            ["r13_corpus_stats", "--run", "--sf-dir", sf0001], spark=spark
        )
        == 0
    )
    import json

    rows = [json.loads(x) for x in capsys.readouterr().out.splitlines() if x]
    assert rows and all(isinstance(r, dict) for r in rows)


def test_q21_single_fact_shuffle_no_expand(spark, sf001):
    """r44's two-level aggregation must ride ONE exchange of the joined
    fact (hash(l_orderkey) clusters both grouping keys) and must not use
    the countDistinct Expand path, which triples shuffle volume."""
    plan = physical(registry.QUERIES["r44_waiting_suppliers"](spark, sf001))
    assert "Expand" not in plan
    # One exchange for the fact repartition, one for the tiny per-supplier
    # aggregate — never a third.
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan


def test_latest_state_is_agg_not_window_sort(spark, sf001):
    """r47 compacts via max(struct) hash aggregate: partial fold map-side,
    one shuffle, and no Window/Sort of the log."""
    plan = physical(registry.QUERIES["r47_latest_state_compaction"](spark, sf001))
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_builds_on_one_log_exchange(spark, sf001):
    """r48's lag, running-sum, island agg, and lead all cluster on
    user_id — one exchange of the event log serves the whole history."""
    plan = physical(registry.QUERIES["r48_scd2_history"](spark, sf001))
    assert plan.count("Exchange hashpartitioning") == 1


def test_q5_cycle_is_residual_not_extra_join(spark, sf001):
    """r40's nation-equality cycle must not introduce a SortMergeJoin or
    an exchange keyed on the nation columns."""
    plan = physical(registry.QUERIES["r40_local_supplier_volume"](spark, sf001))
    assert "hashpartitioning(c_nationkey" not in plan
    assert "hashpartitioning(s_nationkey" not in plan


def test_rolling_revenue_single_exchange(spark, sf001):
    """r52's explicit nation repartition serves both the daily aggregate
    and the rolling window — exactly one hash exchange in the plan."""
    plan = physical(registry.QUERIES["r52_rolling_revenue"](spark, sf001))
    assert plan.count("Exchange hashpartitioning") == 1


def test_revenue_share_window_over_compacted_relation(spark, sf001):
    """r63's ratio-to-report window must run over the per-customer
    aggregate, not the fact: the Window sits ABOVE the aggregate in the
    plan, and the fact contributes only one aggregation exchange."""
    plan = physical(registry.QUERIES["r63_revenue_share"](spark, sf001))
    assert "Window" in plan
    agg_pos = plan.index("HashAggregate")
    win_pos = plan.index("Window")
    assert win_pos < agg_pos  # window consumes the aggregate's output


def test_rp_lsh_candidate_filter_is_scan_side(spark, sf0001, qvec):
    """p06's deterministic LSH candidate stage must be a map-side Filter
    over the scan (plane literals folded into the predicate — no join, no
    shuffle, no model broadcast) followed by a TakeOrderedAndProject
    rescore: the plan that stays O(scan) on a 100 TB corpus."""
    from mtg_vector_db_spark.operators.ann import rp_lsh_topk

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    plan = physical(rp_lsh_topk(emb, qvec, 10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # candidate stage: 0 shuffles
    assert "Join" not in plan


def test_d06_blocked_neardup_has_no_cartesian(spark, sf0001):
    """The embedding near-dup pipeline must never plan a cartesian
    product: candidates come from the cell-keyed equi-join, verification
    joins are id-keyed."""
    plan = physical(registry.QUERIES["d06_embedding_neardup"](spark, sf0001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_chunked_two_exchanges(spark, sf001):
    """The skew-hardened sessionization pays exactly its two designed
    exchanges: (key, chunk) for phase 1 and key for phase 2 — no hidden
    extra shuffle from the island windows (they reuse the phase
    partitioning)."""
    from mtg_vector_db_spark.plans.registry import events_df
    from mtg_vector_db_spark.streaming.pipelines import sessionize_chunked

    plan = physical(sessionize_chunked(events_df(spark, sf001)))
    assert plan.count("Exchange hashpartitioning") == 2


def test_d07_span_dedup_joins_on_hash_no_cartesian(spark, sf0001):
    """Repeated-span detection must key every wide stage on the 60-bit
    gram hash — no cartesian/nested-loop, no string-keyed gram shuffle
    (gram strings never appear as join keys; hashes do)."""
    plan = physical(registry.QUERIES["d07_repeated_ngram_spans"](spark, sf0001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d09_incremental_probes_index_not_corpus_pairs(spark, sf0001):
    """Incremental near-dup must be a band-keyed equi join between the
    batch and the corpus index — never a pair enumeration over the
    corpus with itself (no cartesian, no corpus self bucket_pairs)."""
    plan = physical(registry.QUERIES["d09_incremental_neardup"](spark, sf0001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r70_single_fact_shuffle_all_dims_broadcast(spark, sf001):
    """Q20-adapted: the part filter must broadcast into the lineitem
    scan, the fact shuffles once on l_suppkey, and supplier/nation are
    broadcast — zero SortMergeJoin at this scale."""
    plan = physical(registry.QUERIES["r70_excess_shipment_suppliers"](spark, sf001))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "hashpartitioning(l_suppkey" in plan


def test_no_cartesian_in_any_registered_query(spark, sf0001):
    """GLOBAL plan hygiene: no registered query may plan a
    CartesianProduct — the one join shape that cannot survive scale.
    (BroadcastNestedLoopJoin is permitted: Spark only plans it with a
    broadcast side, and every occurrence in the inventory is a 1-row
    scalar fold, a broadcast query table, or d02's intentionally bounded
    exact baseline — see PLAN_AUDIT.md.)"""
    offenders = []
    for name in sorted(registry.QUERIES):
        plan = physical(registry.QUERIES[name](spark, sf0001))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_no_partitioning_on_raw_text_in_any_registered_query(spark, sf0001):
    """GLOBAL plan hygiene (round-3 VERDICT): no registered query may
    shuffle on the raw document text column. A window/groupBy keyed on
    `text` hashes, compares, and sorts multi-KB strings through every
    exchange; the fingerprint (md5) key gives identical groups with a
    fixed 32-char shuffle key (dedup.py exact_dup_stats pattern)."""
    import re as _re

    # hashpartitioning(..., text#N, ...): 'text' as a standalone column
    # reference (not a suffix like qtext#, not n_text#). A text ref
    # already wrapped in a fingerprint hash — md5(cast(text#N as
    # binary)) / xxhash64(...) — IS the sanctioned form (the exchange
    # key is the 128-bit digest, not the document), so those are
    # folded away before matching.
    pat = _re.compile(r"hashpartitioning\([^)]*(?<![\w])text#\d+")
    fp = _re.compile(r"(?:md5|xxhash64|sha2?)\(cast\(text#\d+ as binary\)\)")
    offenders = []
    for name in sorted(registry.QUERIES):
        plan = physical(registry.QUERIES[name](spark, sf0001))
        if pat.search(fp.sub("FINGERPRINT", plan)):
            offenders.append(name)
    assert not offenders, (
        f"raw-text shuffle keys in {offenders}: key the exchange on "
        "md5(text)/fingerprint(text) instead"
    )


def test_no_driver_collect_outside_documented_bounded_artifacts():
    """GLOBAL source hygiene (round-3 VERDICT): every `.collect()` in the
    package must be a documented bounded artifact (k-row centroid or
    codebook fetch that becomes a broadcast literal, a <=16K-row Bloom
    bitset, a one-row-per-source manifest, a recall report over k ids,
    or a CLI/explain display tool). A collect anywhere else is a driver
    bottleneck at scale — add it here ONLY with a boundedness argument
    in a comment at the call site."""
    import ast
    import os as _os

    pkg = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "mtg_vector_db_spark")
    # (relative file, enclosing function) pairs audited as bounded —
    # see PLAN_AUDIT.md and the call-site comments.
    allowed = {
        ("cli.py", "run_search"),            # CLI display of k results
        ("explain.py", "main"),              # explain/limit display tool
        ("plans/corpus_queries.py", "c09_temperature_mix"),  # 1 row/source
        # All bounded-state snapshot reads funnel through snapshot_rows:
        # each caller's store is bounded by construction (sketch cells,
        # HLL registers, 1 manifest row/source, k reservoir rows,
        # 1 row/dim).
        ("streaming/stores.py", "snapshot_rows"),
        # Append-store reset guard: a single-row MAX over the batch_id
        # PARTITION column values — one scalar, never store rows.
        ("streaming/stores.py", "_store_max_batch"),
        # Bucketed CC map: ≤ one row per bucket (a config-sized
        # constant) steering driver-side version-dir selection.
        ("streaming/pipelines.py", "cc_fold"),
        ("operators/quantize.py", "sq_train"),    # per-dim min/max scalars
        # Batched BPE round candidates: <=4*batch_m PAIR-TYPE rows
        # (vocabulary-bounded counts, never corpus rows) fetched for the
        # driver-side greedy non-interaction selection — the same class
        # as the k-row centroid fetches.
        ("operators/bpe.py", "bpe_train_batched"),
        ("operators/quantize.py", "pq_train"),    # m*k codebook rows
        ("operators/quantize.py", "seeded_pq_codebooks"),  # m*k rows
        ("operators/ann.py", "ivf_probe_labels"),     # k centroid rows
        ("operators/ann.py", "lloyd_ivf_build"),      # k centroids/iter
        # ≤ IVF_LITERAL_MAX_CELLS+1 centroid rows: above the threshold
        # the collect never happens — the broadcast-fold strategy keeps
        # centroids JVM-side (round-5 VERDICT #1 fix).
        ("operators/ann.py", "_with_scored_cells"),
        ("operators/ann.py", "recall_report"),        # 2k result ids
        ("operators/quantize.py", "seeded_rq_codebooks"),  # 2*k codebook rows
        # Spectral round artifacts: every collect below is exactly the
        # 64-row per-dim sums of one power-iteration round (the
        # centroid-fetch pattern — d rows, never corpus rows).
        ("plans/vector_queries.py", "_v16_stats"),
        ("plans/vector_queries.py", "_v17_sums_list"),
        ("plans/vector_queries.py", "v16_power_iteration_pca"),
    }
    offenders = []
    for root, _dirs, files in _os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = _os.path.join(root, f)
            rel = _os.path.relpath(path, pkg)
            with open(path) as fh:
                tree = ast.parse(fh.read(), filename=rel)
            # Map line -> innermost enclosing function name.
            funcs = []
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    funcs.append((node.lineno, node.end_lineno, node.name))
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "collect"
                    and not node.args
                ):
                    enclosing = None
                    for lo, hi, nm in funcs:
                        if lo <= node.lineno <= (hi or lo):
                            if enclosing is None or lo > enclosing[0]:
                                enclosing = (lo, nm)
                    key = (rel, enclosing[1] if enclosing else "<module>")
                    if key not in allowed:
                        offenders.append((rel, node.lineno, key[1]))
    assert not offenders, (
        f"undocumented driver collect()s: {offenders} — distribute the "
        "work or document the bound and extend the allowlist"
    )
