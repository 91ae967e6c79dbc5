"""Index-artifact store (operators/artifacts.py) and the two serving
queries that read it: p44 (stored k-NN graph walk) and p45 (stored IVF
cell layout with dynamic partition pruning) — the build-once/serve-many
split of the reference (index built at schema create, init.sql:50-53;
walked per query, search_strategies.py:147-162)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mtg_vector_db_spark.operators.artifacts import (
    artifact_key,
    dataset_fingerprint,
    ensure_artifact,
)
from mtg_vector_db_spark.plans import registry

registry.load_all()


# ---------------------------------------------------------------------------
# Store mechanics
# ---------------------------------------------------------------------------
def test_dataset_fingerprint_stable_and_content_sensitive(spark, tmp_path):
    p1 = str(tmp_path / "t1")
    spark.range(100).write.parquet(p1)
    fp_a = dataset_fingerprint(p1)
    assert fp_a == dataset_fingerprint(p1)  # stable across calls

    p2 = str(tmp_path / "t2")
    spark.range(101).write.parquet(p2)
    assert fp_a != dataset_fingerprint(p2)  # row count differs

    # Single-file parquet (pandas writer) works too.
    import pandas as pd

    f = tmp_path / "one.parquet"
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(f, index=False)
    assert dataset_fingerprint(str(f)) != fp_a


def test_artifact_key_depends_on_every_field():
    a = artifact_key("graph", "v1", 24, 3, "fp")
    assert a == artifact_key("graph", "v1", 24, 3, "fp")
    assert a != artifact_key("graph", "v2", 24, 3, "fp")
    assert a != artifact_key("graph", "v1", 25, 3, "fp")
    assert len(a) == 16


def test_ensure_artifact_builds_once_then_reuses(spark, tmp_path):
    target = str(tmp_path / "store" / "abc123")
    calls = []

    def build(tmp):
        calls.append(tmp)
        spark.range(10).write.parquet(tmp)

    assert ensure_artifact(target, build) == "built"
    assert ensure_artifact(target, build) == "reused"
    assert len(calls) == 1
    assert os.path.exists(os.path.join(target, "_SUCCESS"))
    assert spark.read.parquet(target).count() == 10


def test_ensure_artifact_clears_crashed_half_build(spark, tmp_path):
    target = str(tmp_path / "store" / "half")
    # A dir without _SUCCESS is an aborted build — must be rebuilt.
    os.makedirs(target)
    with open(os.path.join(target, "part-junk.parquet"), "w") as fh:
        fh.write("not parquet")

    def build(tmp):
        spark.range(5).write.parquet(tmp)

    assert ensure_artifact(target, build) == "built"
    assert spark.read.parquet(target).count() == 5


def test_ensure_artifact_rejects_build_without_success_marker(tmp_path):
    target = str(tmp_path / "store" / "nosuccess")

    def build(tmp):
        os.makedirs(tmp)

    with pytest.raises(RuntimeError, match="_SUCCESS"):
        ensure_artifact(target, build)
    assert not os.path.isdir(target)  # nothing renamed into place


# ---------------------------------------------------------------------------
# p44: stored-graph serving
# ---------------------------------------------------------------------------
def test_p44_stored_graph_equals_fresh_build(spark, sf0001):
    """The artifact must be byte-equivalent to a fresh NN-Descent
    build's distinct undirected expansion (the v2 layout stores exactly
    the set the v1 reader derived at query time) — the invariant that
    lets the oracle replay build + reverse-union in CTEs while the
    query reads parquet. The partition column is pmod(a, hop buckets)
    for every row."""
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.operators.ann import (
        nn_descent_init,
        nn_descent_round,
    )
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _P40_BUCKETS,
        _P40_K,
        _P40_ROUNDS,
        _P44_HOPBUCKETS,
        _stored_graph_path,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    path = _stored_graph_path(spark, sf0001, nb)
    stored = spark.read.parquet(path).select(
        "a", "b", F.col("abucket").cast("long").alias("abucket")
    )

    fresh = nn_descent_init(emb, nb, _P40_K)
    for _ in range(_P40_ROUNDS):
        fresh = nn_descent_round(fresh, emb, _P40_K)
    und = (
        fresh.select("a", "b")
        .union(fresh.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .withColumn("abucket", F.pmod(F.col("a"), F.lit(_P44_HOPBUCKETS)))
    )
    assert stored.exceptAll(und).count() == 0
    assert und.exceptAll(stored).count() == 0


def test_beam_search_bucket_by_without_pre_undirected(spark, sf0001):
    """bucket_by on a DIRECTED graph (pre_undirected=False) must derive
    the abucket column on the in-memory reverse-union instead of raising
    AnalysisException (round-5 ADVICE: the bucketed hop join referenced
    und["abucket"], which only the stored v2 layout carries), and the
    walk's answers must be identical to the unbucketed path — bucketing
    is a physical-layout opt-in, never a semantics knob."""
    from mtg_vector_db_spark.operators.ann import (
        graph_beam_search,
        nn_descent_init,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    g = nn_descent_init(emb, n_buckets=8, k=8)
    probes = emb.filter(F.col("vec_id") < 5)
    plain = graph_beam_search(
        g, emb, probes, k=5, n_buckets=8, beam=8, rounds=1
    )
    bucketed = graph_beam_search(
        g, emb, probes, k=5, n_buckets=8, beam=8, rounds=1, bucket_by=4
    )
    assert bucketed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bucketed).count() == 0


def test_p44_second_call_reuses_artifact(spark, sf0001):
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _P40_BUCKETS,
        _stored_graph_path,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    p1 = _stored_graph_path(spark, sf0001, nb)
    mtime = os.path.getmtime(p1)
    p2 = _stored_graph_path(spark, sf0001, nb)
    assert p1 == p2
    assert os.path.getmtime(p2) == mtime  # untouched, not rebuilt


def test_p44_serving_executes_without_rebuilding_artifact(spark, sf0001):
    """Serve-many: executing the registered query end-to-end must leave
    the stored graph untouched (no rebuild, no rewrite) — the build cost
    is paid at most once per corpus. (The beam walk itself is pinned
    per round — session.py:pin — so the final physical plan reads
    checkpointed blocks; the artifact scan is asserted via the store's
    mtime staying frozen across a full execution.)"""
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _P40_BUCKETS,
        _stored_graph_path,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    path = _stored_graph_path(spark, sf0001, nb)
    mtime = os.path.getmtime(path)
    rows = registry.QUERIES["p44_graph_serve_stored"](spark, sf0001).collect()
    assert len(rows) > 0
    assert os.path.getmtime(path) == mtime
    # The stored lists are what the walk reads: the frozen undirected
    # (a, b) adjacency plus its hop-bucket partition column — nothing
    # else is materialized in the store.
    assert set(spark.read.parquet(path).columns) == {"a", "b", "abucket"}


def test_p44_hop_join_is_partition_pruned(spark, sf0001):
    """The serving walk's hop join must carry a DPP filter on the
    stored adjacency's abucket partition (the p45/p47 mechanism applied
    to graph hops): a hop reads only the frontier's buckets, never the
    full edge table. Asserted on the hop join itself — the registered
    query's final plan hides the scans behind the per-round pins."""
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _P40_BUCKETS,
        _P44_HOPBUCKETS,
        _stored_graph_path,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    nb = A.dynamic_bucket_count(emb, min_buckets=_P40_BUCKETS)
    und = spark.read.parquet(_stored_graph_path(spark, sf0001, nb))
    beam = F.broadcast(
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("q"), F.col("vec_id").alias("hop"))
        .withColumn("abucket", F.pmod(F.col("hop"), F.lit(_P44_HOPBUCKETS)))
    )
    hop = und.join(
        beam,
        (und["abucket"] == beam["abucket"]) & (beam["hop"] == und["a"]),
    ).select("q", und["b"].alias("b"))
    plan = hop._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "graph_knn" in ln
    ]
    assert scans, "no FileScan over the stored adjacency"
    assert any("dynamicpruning" in ln for ln in scans), (
        "hop join is not partition-pruned by the frontier's buckets"
    )


def test_p44_answers_are_true_neighbors_mostly(spark, sf0001):
    """Serving recall sanity on the real corpus: top-10-per-probe from the
    stored graph should overlap exact KNN heavily (p42 measured 0.94 at
    sf0.1; assert a conservative floor at sf0.001)."""
    from mtg_vector_db_spark.operators.knn import knn_join
    from mtg_vector_db_spark.plans.pipeline_queries import _P40_PROBES

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    got = registry.QUERIES["p44_graph_serve_stored"](spark, sf0001)
    probes = emb.filter(F.col("vec_id") < _P40_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_join(emb, probes, k=10, round_digits=6).select(
        "query_id", F.col("vec_id").alias("neighbor_id")
    )
    n_hit = got.join(exact, ["query_id", "neighbor_id"]).count()
    n_all = got.count()
    assert n_all > 0
    assert n_hit / n_all >= 0.8


# ---------------------------------------------------------------------------
# p45: stored-IVF serving with dynamic partition pruning
# ---------------------------------------------------------------------------
def test_p45_layout_scan_is_dynamically_pruned(spark, sf0001):
    """The registered serving query's layout scan must carry a DPP
    partition filter on cell — only probed cells' files are read, no
    driver-side cell collect."""
    df = registry.QUERIES["p45_ivf_serve_stored"](spark, sf0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "ivf_cells" in ln
    ]
    assert scan_lines, "no FileScan over the stored IVF layout"
    assert any(
        "dynamicpruning" in ln for ln in scan_lines
    ), "layout scan is not partition-pruned by the probe cells"


def test_p45_layout_partitions_match_assignment(spark, sf0001):
    """Every stored row's hive partition equals its frozen-cell argmin
    assignment (the layout IS the index)."""
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_assign,
    )
    from mtg_vector_db_spark.plans.pipeline_queries import _stored_ivf_path

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    layout = spark.read.parquet(_stored_ivf_path(spark, sf0001))
    want = ivf_assign(emb, dynamic_seed_cells(emb)).select("vec_id", "cell")
    diff = (
        layout.select("vec_id", "cell")
        .exceptAll(want.select("vec_id", F.col("cell").cast("int")))
        .count()
    )
    assert diff == 0
    assert layout.count() == emb.count()


# ---------------------------------------------------------------------------
# p46: stored-PQ-codes serving
# ---------------------------------------------------------------------------
def test_p46_stored_codes_equal_fresh_encode(spark, sf0001):
    """The code artifact must be bit-identical to a fresh pq_encode —
    the invariant that lets the oracle replay codebooks+encode in CTEs
    while the query reads parquet (pq_encode's tie_digits argmin is the
    determinism source)."""
    from mtg_vector_db_spark.operators.quantize import (
        pq_encode,
        seeded_pq_codebooks,
    )
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _PQ_CODES,
        _PQ_M,
        _stored_pq_path,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    stored = spark.read.parquet(_stored_pq_path(spark, sf0001))
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    fresh = pq_encode(emb, cbs).select("vec_id", "codes")
    assert stored.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(stored).count() == 0
    assert set(stored.columns) == {"vec_id", "codes"}


def test_p46_serving_scans_codes_not_corpus_for_ranking(spark, sf0001):
    """Serve-many shape: executing the registered query leaves the code
    store untouched (built at most once per corpus), and the plan's scan
    of the stored artifact reads ONLY (vec_id, codes) — the raw
    embeddings enter the plan solely through the probe slice and the
    bounded top-K*os rescore join."""
    from mtg_vector_db_spark.plans.pipeline_queries import _stored_pq_path

    path = _stored_pq_path(spark, sf0001)
    mtime = os.path.getmtime(path)
    df = registry.QUERIES["p46_pq_serve_stored"](spark, sf0001)
    rows = df.collect()
    assert len(rows) > 0
    assert os.path.getmtime(path) == mtime  # reused, never rebuilt

    plan = df._jdf.queryExecution().executedPlan().toString()
    code_scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "pq_codes" in ln
    ]
    assert code_scans, "no FileScan over the stored code table"
    assert all(
        "ReadSchema: struct<vec_id:bigint,codes:array<int>" in ln
        for ln in code_scans
    ), "code scan reads more than (vec_id, codes)"


def test_p46_answers_are_true_neighbors_mostly(spark, sf0001):
    """Serving recall sanity: top-10-per-probe from the stored codes at
    os=32 should overlap exact KNN heavily (p43's frontier: ~0.85 at
    sf0.1; conservative floor here at sf0.001)."""
    from mtg_vector_db_spark.operators.knn import knn_join
    from mtg_vector_db_spark.plans.pipeline_queries import _P46_PROBES

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    got = registry.QUERIES["p46_pq_serve_stored"](spark, sf0001)
    probes = emb.filter(F.col("vec_id") < _P46_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_join(emb, probes, k=10, round_digits=6).select(
        "query_id", F.col("vec_id").alias("neighbor_id")
    )
    n_hit = got.join(exact, ["query_id", "neighbor_id"]).count()
    n_all = got.count()
    assert n_all > 0
    assert n_hit / n_all >= 0.8


# ---------------------------------------------------------------------------
# t40: stored trigram posting-list serving (the GIN analog)
# ---------------------------------------------------------------------------
def test_t40_serves_exactly_t01s_scan_answer(spark, sf0001):
    """The posting-list reconstruction |A∩B|/(nq + n_d − shared) must
    reproduce pg_trgm similarity EXACTLY: t40's top-10 from the stored
    index equals t01's full-scan answer bit-for-bit."""
    got = sorted(
        (r["p_name"], r["sim"])
        for r in registry.QUERIES["t40_trigram_serve_stored"](
            spark, sf0001
        ).collect()
    )
    want = sorted(
        (r["p_name"], r["sim"])
        for r in registry.QUERIES["t01_trigram_topk"](spark, sf0001).collect()
    )
    assert got == want


def test_t40_scan_pushes_query_trigrams(spark, sf0001):
    """GIN posting-fetch shape: the serving scan carries the query's
    trigram IN-filter down to the parquet source (sorted/range-
    partitioned by tg, so row groups without the query's trigrams are
    skipped via min/max stats), and the store is never rebuilt."""
    from mtg_vector_db_spark.plans.text_queries import _stored_trgm_path

    path = _stored_trgm_path(spark, sf0001)
    mtime = os.path.getmtime(path)
    df = registry.QUERIES["t40_trigram_serve_stored"](spark, sf0001)
    assert df.count() > 0
    assert os.path.getmtime(path) == mtime

    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "trgm_postings" in ln
    ]
    assert scans, "no FileScan over the stored posting list"
    assert any("In(tg" in ln or "IN (" in ln for ln in scans), (
        "query-trigram filter not pushed to the posting scan"
    )


def test_t40_python_trigrams_match_engine_construction(spark):
    """_pg_trgm_set (the query-literal side) must mirror the engine
    trigram_set exactly — checked on strings covering multi-word,
    case folding, punctuation splits, short words, and digits."""
    from mtg_vector_db_spark.functions.trigram import trigram_set
    from mtg_vector_db_spark.plans.text_queries import _pg_trgm_set

    cases = ["blu bolt", "A", "ab-cd 42", "  spaced  out  ", "MiXeD CaSe9"]
    df = spark.createDataFrame([(c,) for c in cases], ["s"]).select(
        "s", trigram_set(F.col("s")).alias("t")
    )
    for r in df.collect():
        assert sorted(r["t"]) == sorted(_pg_trgm_set(r["s"])), r["s"]


# ---------------------------------------------------------------------------
# t41: stored BM25 posting-index serving (the keyword arm's t40)
# ---------------------------------------------------------------------------
def test_t41_serves_exactly_t14s_scan_answer(spark, sf0001):
    """BM25 from the frozen posting artifact must equal t14's full-scan
    answer bit-for-bit: df is reconstructed from the fetched postings
    (the rows for a term ARE the docs containing it), stats round-trip
    parquet exactly, and the scoring DAG is shared code."""
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in registry.QUERIES["t41_bm25_serve_stored"](
            spark, sf0001
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in registry.QUERIES["t14_bm25_topk"](spark, sf0001).collect()
    )
    assert got == want


def test_t41_scan_pushes_query_terms(spark, sf0001):
    """Inverted-index access pattern: the serving scan carries the query
    terms' IN-filter down to the posting parquet (sorted/range-
    partitioned by term, so row groups without the query's terms are
    skipped via min/max stats), and neither artifact is rebuilt."""
    from mtg_vector_db_spark.plans.text_queries import _stored_bm25_paths

    ppath, spath = _stored_bm25_paths(spark, sf0001)
    mtimes = (os.path.getmtime(ppath), os.path.getmtime(spath))
    df = registry.QUERIES["t41_bm25_serve_stored"](spark, sf0001)
    assert df.count() > 0
    assert (os.path.getmtime(ppath), os.path.getmtime(spath)) == mtimes

    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "bm25_postings" in ln
    ]
    assert scans, "no FileScan over the stored posting list"
    assert any("In(term" in ln or "IN (" in ln for ln in scans), (
        "query-term filter not pushed to the posting scan"
    )


# ---------------------------------------------------------------------------
# p50: stored LSH bucket-table serving (completes the serving matrix)
# ---------------------------------------------------------------------------
def test_p50_serves_exactly_p06s_scan_answer(spark, sf0001):
    """The stored bucket table is a materialization of p06's bucketing,
    so the candidate set — and after exact rescore the top-10 — must be
    bit-identical to the in-line full scan."""
    got = sorted(
        (r["doc_id"], r["sim"])
        for r in registry.QUERIES["p50_lsh_serve_stored"](
            spark, sf0001
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["sim"])
        for r in registry.QUERIES["p06_lsh_ann_topk"](spark, sf0001).collect()
    )
    assert got == want


def test_p50_scan_pushes_query_buckets(spark, sf0001):
    """E2LSH hash-table-lookup shape: the query's 8 (table, bucket)
    equality pairs are pushed to the bucket-table parquet scan
    (sorted/range-partitioned by (w, b) → min/max stats skip row groups
    without the probed buckets), and the store is never rebuilt."""
    from mtg_vector_db_spark.plans.pipeline_queries import _stored_lsh_path

    path = _stored_lsh_path(spark, sf0001)
    mtime = os.path.getmtime(path)
    df = registry.QUERIES["p50_lsh_serve_stored"](spark, sf0001)
    assert df.count() > 0
    assert os.path.getmtime(path) == mtime

    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "lsh_buckets" in ln
    ]
    assert scans, "no FileScan over the stored bucket table"
    assert any(
        "PushedFilters" in ln and ("Or(" in ln or "EqualTo(w" in ln)
        for ln in scans
    ), "query-bucket filters not pushed to the bucket scan"


# ---------------------------------------------------------------------------
# v19: stored MRL prefix-column serving
# ---------------------------------------------------------------------------
def test_v19_prefix_artifact_scan_reads_prefix_bytes_only(spark, sf0001):
    """The byte claim made physical: the coarse stage scans the prefix
    ARTIFACT (whose schema holds only vec_id + the 32-dim prefix — half
    the vector bytes), the full 64-dim corpus is reached only through
    the broadcast join of the 200 survivors, and the artifact is never
    rebuilt across executions."""
    from mtg_vector_db_spark.plans.vector_queries import (
        _stored_prefix_path,
    )

    path = _stored_prefix_path(spark, sf0001)
    mtime = os.path.getmtime(path)
    df = registry.QUERIES["v19_mrl_serve_stored"](spark, sf0001)
    assert df.count() > 0
    assert os.path.getmtime(path) == mtime

    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "mrl_prefix" in ln
    ]
    assert scans, "no FileScan over the stored prefix column"
    assert all("embedding" not in ln for ln in scans), (
        "coarse scan must not read the full embedding column"
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# p47: combined IVF-PQ stored serving
# ---------------------------------------------------------------------------
def test_p47_layout_equals_fresh_build(spark, sf0001):
    """The IVF-PQ layout must be bit-identical to a fresh assign+encode
    (both are pure deterministic functions of the corpus) — the oracle
    replays them in CTEs while the query reads parquet."""
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_assign,
    )
    from mtg_vector_db_spark.operators.quantize import (
        pq_encode,
        seeded_pq_codebooks,
    )
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _PQ_CODES,
        _PQ_M,
        _stored_ivfpq_path,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    stored = spark.read.parquet(_stored_ivfpq_path(spark, sf0001)).select(
        "vec_id", "codes", F.col("cell").cast("int").alias("cell")
    )
    cbs = seeded_pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    fresh = (
        pq_encode(emb, cbs)
        .select("vec_id", "codes")
        .join(
            ivf_assign(emb, dynamic_seed_cells(emb)).select(
                "vec_id", F.col("cell").cast("int").alias("cell")
            ),
            "vec_id",
        )
    )
    assert stored.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(stored).count() == 0


def test_p47_scan_is_pruned_and_codes_only(spark, sf0001):
    """The production IVF-PQ serving claim, plan-asserted: the layout
    scan is confined to probed cells by DYNAMIC PARTITION PRUNING and
    reads ONLY (vec_id, codes) — per-query bytes = (nprobe/cells) x
    9 small ints per vector. Raw embeddings enter the plan only via
    the probe slice and the bounded top-K*os rescore."""
    from mtg_vector_db_spark.plans.pipeline_queries import _stored_ivfpq_path

    path = _stored_ivfpq_path(spark, sf0001)
    mtime = os.path.getmtime(path)
    df = registry.QUERIES["p47_ivfpq_serve_stored"](spark, sf0001)
    assert df.count() > 0
    assert os.path.getmtime(path) == mtime  # reused, never rebuilt

    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "ivfpq_layout" in ln
    ]
    assert scans, "no FileScan over the stored IVF-PQ layout"
    assert any("dynamicpruning" in ln for ln in scans), (
        "code scan is not partition-pruned by the probe cells"
    )
    assert all(
        "ReadSchema: struct<vec_id:bigint,codes:array<int>" in ln
        for ln in scans
    ), "code scan reads more than (vec_id, codes)"


def test_p47_recall_within_probed_cells_is_exact(spark, sf0001):
    """Within the probed cells the ADC+rescore chain must not lose
    true neighbors: p47's top-10 equals exact KNN RESTRICTED to the
    same probed cells whenever the candidate pool exceeds the rescore
    depth is not binding (os=32 rescore depth >= pool here), i.e. the
    only recall loss vs exact KNN is the IVF cell selection itself."""
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_assign,
        ivf_ranked_assign,
    )
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _P47_K,
        _P47_NPROBE,
        _P47_PROBES,
    )

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    got = registry.QUERIES["p47_ivfpq_serve_stored"](spark, sf0001)

    cents = dynamic_seed_cells(emb)
    probes = emb.filter(F.col("vec_id") < _P47_PROBES)
    pcells = ivf_ranked_assign(probes, cents, nprobe=_P47_NPROBE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "cell",
    )
    pool = (
        ivf_assign(emb, cents)
        .join(F.broadcast(pcells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("embedding"), F.col("query_vec")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    exact = pool.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _P47_K
    )
    a = sorted(
        (r["query_id"], r["neighbor_id"], r["sim"]) for r in got.collect()
    )
    b = sorted(
        (r["query_id"], r["neighbor_id"], r["sim"]) for r in exact.collect()
    )
    assert a == b


def test_round_half_up_matches_spark_round_exactly(spark):
    """Round-6 ADVICE: driver-side bucket ids must round like the
    Spark-built artifact. Python's round() is HALF_EVEN; Spark's F.round
    is HALF_UP over BigDecimal.valueOf's shortest round-trip decimal.
    Pin round_half_up ≡ F.round on .5-tie values at the 9th digit (where
    the two conventions split), signs, and a random spread."""
    import random

    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.ann import round_half_up

    rng = random.Random(99)
    values = [
        5e-10, -5e-10, 1.5e-9, 2.5e-9, -2.5e-9, 3.5e-9,
        0.1234567895, -0.1234567895, 1.0000000005, 0.0,
    ] + [rng.uniform(-2, 2) for _ in range(200)]
    df = spark.createDataFrame(
        [(v,) for v in values], "x double"
    ).select(F.round(F.col("x"), 9).alias("r"))
    spark_r = [r["r"] for r in df.collect()]
    ours = [round_half_up(v, 9) for v in values]
    assert ours == spark_r
    # And the convention actually differs from builtin round() on the
    # ties above — otherwise this test pins nothing.
    assert round_half_up(1.5e-9, 9) != round(1.5e-9, 9)
    assert round_half_up(0.1234567895, 9) != round(0.1234567895, 9)


# ---------------------------------------------------------------------------
# p51: append+refresh served from the STORED base graph (p48's serve face)
# ---------------------------------------------------------------------------
def test_p51_serves_exactly_p48s_answer(spark, sf0001):
    """The stored base substrate is bit-identical to p48's in-query
    build (deterministic md5 buckets, round(·,6) sims, exact double
    parquet round-trip), so append + refresh + audit downstream of it
    must reproduce p48's two stage rows bit-for-bit — the p50≡p06 /
    t41≡t14 serving-twin discipline."""
    got = sorted(
        tuple(r)
        for r in registry.QUERIES["p51_graph_refresh_serve_stored"](
            spark, sf0001
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in registry.QUERIES["p48_graph_refresh_appended"](
            spark, sf0001
        ).collect()
    )
    assert got == want


def test_p51_reuses_stored_base_graph(spark, sf0001):
    """Serving never rebuilds the substrate: a second execution leaves
    the artifact untouched (mtime pin, the p50/t40 discipline)."""
    from mtg_vector_db_spark.operators import ann as A
    from mtg_vector_db_spark.plans.pipeline_queries import (
        _P40_BUCKETS,
        _stored_p48_base_path,
    )
    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.plans.pipeline_queries import _P48_FRAC
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    corpus = emb.filter(
        ~(
            hash_fraction(
                F.concat(F.col("vec_id").cast("string"), F.lit(":new"))
            )
            < _P48_FRAC
        )
    )
    nb = A.dynamic_bucket_count(corpus, min_buckets=_P40_BUCKETS)
    path = _stored_p48_base_path(spark, sf0001, nb)
    mtime = os.path.getmtime(path)
    df = registry.QUERIES["p51_graph_refresh_serve_stored"](spark, sf0001)
    assert df.count() == 2
    assert os.path.getmtime(path) == mtime


# ---------------------------------------------------------------------------
# p54/c31: mining served from the stored IVF layout (round-8 VERDICT #1)
# ---------------------------------------------------------------------------
def test_p54_layout_scan_is_dynamically_pruned(spark, sf0001):
    """The hard-negative miner's layout scan must carry a DPP partition
    filter on cell — the query-TABLE probe set (50 anchors × nprobe
    cells) prunes the artifact scan, no driver-side cell collect."""
    df = registry.QUERIES["p54_hard_negatives_served_stored"](spark, sf0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "ivf_cells" in ln
    ]
    assert scan_lines, "no FileScan over the stored IVF layout"
    assert any(
        "dynamicpruning" in ln for ln in scan_lines
    ), "layout scan is not partition-pruned by the anchor probe cells"


def test_c31_stored_semdedup_equals_fresh_c21(spark, sf0001):
    """The stored-layout SemDeDup twin must answer EXACTLY like c21's
    fresh-geometry build (same frozen seed cells by construction) while
    reading its clusters from the artifact instead of re-assigning."""
    fresh = {
        tuple(r)
        for r in registry.QUERIES["c21_semdedup_keep"](
            spark, sf0001
        ).collect()
    }
    stored = {
        tuple(r)
        for r in registry.QUERIES["c31_semdedup_keep_stored"](
            spark, sf0001
        ).collect()
    }
    assert fresh == stored and fresh
