"""Pipeline queries: oracle parity + rerank invariants + ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mtg_vector_db_spark.operators.rerank import parse_ranking, parse_score
from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

PIPE_QUERIES = [n for n in registry.QUERIES if n.startswith("p")]


@pytest.mark.parametrize("name", PIPE_QUERIES)
def test_oracle_parity(spark, sf001, name):
    if name not in registry.ORACLES:
        pytest.skip("rows-only query")
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)


# --- reference parsing invariants (db_utils.py:384-397, 487-495) ---------
@pytest.mark.parametrize(
    "text,n",
    [
        ("3, 1, 2", 3),
        ("ranking: 2 > 1 > 5 > 4 > 3", 5),
        ("garbage", 4),
        ("1,1,1,2", 3),
        ("9, 2, 1", 3),  # out-of-range dropped
        ("", 5),
    ],
)
def test_parse_ranking_is_permutation(text, n):
    perm = parse_ranking(text, n)
    assert sorted(perm) == list(range(n))


@pytest.mark.parametrize(
    "text,expected",
    [
        ("85%", 0.85),
        ("7/10", 0.7),
        ("95/100", 0.95),
        ("0.42", 0.42),
        ("150%", 1.0),
        ("no digits here", 0.5),
    ],
)
def test_parse_score(text, expected):
    assert abs(parse_score(text) - expected) < 1e-9


def test_rerank_with_applyinpandas(spark, sf001):
    """The Arrow-batched real-ranker hook: reverse-order ranker."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.rerank import rerank_with

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    cands = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            F.lit(0).cast("long").alias("query_id"),
            "doc_id",
            "text",
            (F.col("doc_id") * 1.0).alias("sim"),
        )
    )
    out = rerank_with(cands, lambda texts: list(range(len(texts) - 1, -1, -1)),
                      final_k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    # reverse of sim-desc order = sim-asc order
    ids = [r["doc_id"] for r in out]
    assert ids == sorted(ids)


def test_ivf_probe_invariants(spark, sf001):
    """IVF = exact KNN over the probed cells: results stay inside the probed
    labels and are exactly the brute-force top-k of that subset. (Labels in
    the synthetic data are NOT real clusters, so recall vs global exact KNN
    is data-dependent; the oracle-parity test pins the semantics.)"""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.ann import (
        centroid_vectors,
        centroids_by,
        ivf_probe_labels,
    )
    from mtg_vector_db_spark.operators.knn import knn
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    cents = centroid_vectors(centroids_by(emb))
    labels = ivf_probe_labels(cents, qv, nprobe=2)
    assert len(labels) == 2

    approx = registry.QUERIES["p04_ivf_search"](spark, sf001).collect()
    assert len(approx) == 10
    sims = [r["sim"] for r in approx]
    assert sims == sorted(sims, reverse=True)

    exact_subset = {
        r["vec_id"]
        for r in knn(
            emb.filter(F.col("label").isin(labels)), qv, 10, round_digits=6
        ).collect()
    }
    assert {r["doc_id"] for r in approx} == exact_subset


def test_lsh_index_query(spark, sf001):
    """MLlib LSH path: approxNearestNeighbors returns k rows including self."""
    from mtg_vector_db_spark.operators.ann import lsh_index, lsh_query
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    model, indexed = lsh_index(emb)
    qv = query_vector(spark, sf001)
    rows = lsh_query(model, indexed, qv, 5).collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0


def test_rp_lsh_recall_vs_exact(spark, sf001):
    """Deterministic RP-LSH (p06's engine) at the round-3 defaults
    (8 tables, L=1.0 — recall@10 0.96 at sf0.1, RECALL.md) must recover
    the FULL exact top-10 at sf0.01."""
    from mtg_vector_db_spark.operators.ann import rp_lsh_topk
    from mtg_vector_db_spark.operators.knn import knn
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    approx = {r["doc_id"] for r in rp_lsh_topk(emb, qv, 10).collect()}
    exact = {r["vec_id"] for r in knn(emb, qv, 10, round_digits=6).collect()}
    assert len(approx & exact) == 10


def test_p27_ivf_recall_clears_hnsw_bar(spark, sf001):
    """The driver-checked IVF recall row (frozen cells, nprobe=4 after
    the round-3 sweep) must average ≥0.90 recall@10 — the deterministic
    arm's analog of the reference's HNSW quality (m=16/ef=64, typically
    ≥0.95). Measured 0.92 at sf0.01, 0.94 at sf0.1 (RECALL.md)."""
    rows = registry.QUERIES["p27_ivf_recall_report"](spark, sf001).collect()
    mean = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert mean >= 0.90, mean


def test_kmeans_ivf_build_invariants(spark, sf001):
    from mtg_vector_db_spark.operators.ann import kmeans_ivf_build

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    centroids, assigned = kmeans_ivf_build(emb, n_cells=8)
    assert centroids.count() == 8
    assert assigned.count() == emb.count()  # every vector lands in a cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))
    dim = len(emb.select("embedding").first()[0])
    assert all(len(r["centroid"]) == dim for r in centroids.collect())


def test_recall_report(spark, sf001):
    from mtg_vector_db_spark.operators.ann import recall_report
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    rows = {r["method"]: r for r in recall_report(emb, qv, k=10).collect()}
    assert set(rows) == {"ivf-kmeans", "lsh"}
    for r in rows.values():
        assert 0.0 <= r["recall"] <= 1.0 and r["hits"] == r["recall"] * 10
    # both candidate generators should find most of the true neighborhood
    assert rows["lsh"]["recall"] >= 0.8
    assert rows["ivf-kmeans"]["recall"] >= 0.5


def test_embedding_throughput_beats_reference(spark, sf001):
    """The reference embeds ~8-11 docs/s (30k cards in 45-75 min through
    serial HTTP, BASELINE.md). The Arrow-batched embedding stage must beat
    that by orders of magnitude even with the deterministic stub standing
    in for the model call."""
    import time

    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.embedding import embed_text
    from mtg_vector_db_spark.session import widen

    docs = widen(spark.read.parquet(f"{sf001}/documents.parquet"))
    t0 = time.perf_counter()
    n = docs.select("doc_id", embed_text(F.col("text")).alias("e")).count()
    rate = n / (time.perf_counter() - t0)
    assert n == 500
    assert rate > 100, f"embedding rate {rate:.0f} docs/s"


def test_ivf_assign_matches_mllib_transform(spark, sf001):
    """Frozen-cell assignment (the incremental-index path) must agree with
    MLlib KMeans.transform on every vector — same argmin rule, so a vector
    arriving via the stream lands in the same cell a batch rebuild would
    put it in."""
    from mtg_vector_db_spark.operators.ann import ivf_assign, kmeans_ivf_build

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    centroids, assigned = kmeans_ivf_build(emb, n_cells=8)
    ours = ivf_assign(emb, centroids).select("vec_id", "cell")
    theirs = assigned.select("vec_id", F.col("cell").alias("mllib_cell"))
    diff = ours.join(theirs, "vec_id").filter(
        F.col("cell") != F.col("mllib_cell")
    )
    assert diff.count() == 0


def test_ivf_index_append_incremental_equals_batch(spark, sf001, tmp_path):
    """Two incremental appends produce the same cell-partitioned index as
    one batch assignment: existing files untouched, partition layout
    preserved, assignments identical."""
    from mtg_vector_db_spark.operators.ann import (
        ivf_assign,
        ivf_index_append,
        kmeans_ivf_build,
    )

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    centroids, _ = kmeans_ivf_build(emb, n_cells=8)
    idx = str(tmp_path / "ivf_index")
    ivf_index_append(emb.filter(F.col("vec_id") < 250), centroids, idx)
    ivf_index_append(emb.filter(F.col("vec_id") >= 250), centroids, idx)

    stored = spark.read.parquet(idx).select("vec_id", "cell")
    expected = ivf_assign(emb, centroids).select(
        "vec_id", F.col("cell").alias("expected_cell")
    )
    assert stored.count() == emb.count()
    diff = stored.join(expected, "vec_id").filter(
        F.col("cell") != F.col("expected_cell")
    )
    assert diff.count() == 0


def test_maxsim_dominates_single_term_and_is_bounded(spark, sf001):
    """MaxSim invariants: every score is ≤ n_terms (each term's max
    cosine ≤ 1) and ≥ the best single-term contribution; ranks are
    dense 1..k per query."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["p34_maxsim_late_interaction"](
        spark, sf001
    ).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(-3.0 <= s <= 3.0 for s in scores)  # 3 unit terms


def test_hard_negatives_are_cross_label_and_hard(spark, sf001):
    """Every mined negative has a different label than its seed; ranks
    are dense; and each seed's top negative is at least as similar as
    its k-th (ordering invariant)."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["p35_hard_negatives"](spark, sf001).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["neg_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_nprobe_sweep_monotone_and_converges(spark, sf001):
    """Recall and candidate cost are non-decreasing in nprobe (nested
    candidate sets), and the sweep's recall at p27's nprobe matches the
    standalone report's average."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["p36_nprobe_sweep"](spark, sf001).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 4, 5]
    recalls = [r["avg_recall_at_10"] for r in rows]
    cands = [r["avg_candidates"] for r in rows]
    assert recalls == sorted(recalls)
    assert cands == sorted(cands)
    assert 0 < recalls[0] <= recalls[-1] <= 1.0
    p27 = registry.QUERIES["p27_ivf_recall_report"](spark, sf001).collect()
    avg27 = sum(r["recall_at_10"] for r in p27) / len(p27)
    sweep4 = next(r for r in rows if r["nprobe"] == 4)
    assert abs(sweep4["avg_recall_at_10"] - avg27) < 1e-6


def test_cascade_stages_nest_and_agree_with_arms(spark, sf001):
    """Every cascade survivor must be in BM25's top-100 (stage nesting),
    ranks are dense by descending exact sim, and hamming/sim disagree
    in the expected direction at least somewhere (the rescore matters)."""
    from mtg_vector_db_spark.operators.text_search import bm25_topk
    from mtg_vector_db_spark.plans import registry
    from mtg_vector_db_spark.plans.text_queries import BM25_TERMS

    registry.load_all()
    rows = registry.QUERIES["p37_cascade_search"](spark, sf001).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    top100 = {
        r["doc_id"]
        for r in bm25_topk(docs, BM25_TERMS, k=100, round_digits=6).collect()
    }
    assert {r["doc_id"] for r in rows} <= top100


def test_bitext_margin_demotes_hubs(spark):
    """The margin ratio is the point of the operator: a hub vector that is
    fairly close to EVERYTHING in the other language can beat a true pair
    on raw cosine's neighborhood, but its denominator (its own top-k mean)
    is just as high, so its margin stays near 1 — while a true pair that
    is uniquely close scores a margin well above its background."""
    import numpy as np

    from mtg_vector_db_spark.operators.bitext import margin_bitext_pairs

    rng = np.random.default_rng(11)
    D = 16

    def unit(v):
        return v / np.linalg.norm(v)

    vecs = {i: unit(rng.normal(size=D)) for i in range(20)}
    # hub: src 12 (lang a); plant six lang-b docs AROUND it so it is
    # uniformly close to much of the other language
    hub = vecs[12]
    for i in (1, 3, 5, 7, 9, 13):
        vecs[i] = unit(0.8 * hub + 0.6 * unit(rng.normal(size=D)))
    # true pair: src 10 ≈ tgt 11, uniquely close, background elsewhere
    vecs[10] = unit(rng.normal(size=D))
    vecs[11] = unit(vecs[10] + 0.75 * unit(rng.normal(size=D)))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)],
        ["doc_id", "lang"],
    )
    rows = {
        r["src_id"]: r
        for r in margin_bitext_pairs(
            docs, emb, "a", "b", min_margin=0.0
        ).collect()
    }
    assert rows[10]["tgt_id"] == 11
    # raw cosine is FOOLED: the hub's best pair outscores the true pair
    assert rows[12]["sim"] > rows[10]["sim"], rows
    # the margin ratio is not: true pair wins by a wide gap
    assert rows[10]["margin"] > rows[12]["margin"] + 0.3, rows


def test_prf_expansion_changes_ranking(spark, sf001):
    """PRF rescoring must actually use the expansion: the expanded top-10
    is not identical to the seed-only BM25 top-10 (the feedback docs
    share vocabulary beyond the seeds on this corpus), and every score
    is positive with seed matches still dominating (tw=1.0 vs <=0.5)."""
    from mtg_vector_db_spark.operators.text_search import bm25_topk
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    prf = registry.QUERIES["p39_prf_query_expansion"](spark, sf001).collect()
    assert len(prf) == 10 and all(r["score_prf"] > 0 for r in prf)

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    base = bm25_topk(docs, ("vector", "join", "spark"), k=10).collect()
    base_ids = [r["doc_id"] for r in base]
    prf_ids = [r["doc_id"] for r in prf]
    assert prf_ids != base_ids
    # seed-heavy docs survive the re-ranking: the two lists overlap.
    assert len(set(prf_ids) & set(base_ids)) >= 3


def test_nn_descent_rounds_improve(spark, sf001):
    """Refinement is real: mean neighbor similarity is non-decreasing by
    construction (each round keeps the top-k of a superset) and recall
    vs exact KNN must climb substantially from the random-ish
    dual-bucket init — the init-closure regression guard (a single
    partitioned init makes every round a no-op)."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["p40_nn_descent_graph"](spark, sf001).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == [0, 1, 2, 3]
    sims = [r["mean_sim"] for r in rows]
    recs = [r["recall_at_10"] for r in rows]
    assert sims == sorted(sims)
    assert recs == sorted(recs)
    # The shipped config (k=24 lists, 3 rounds) clears the HNSW-recall
    # bar from a 0.1-recall random init — the init-closure regression
    # guard (a single partitioned init makes every round a no-op).
    assert recs[-1] >= 0.9
    assert all(r["n_edges"] == 500 * 24 for r in rows)


def test_p42_beam_search_recall_clears_hnsw_bar(spark, sf001):
    """The graph family's SERVING path (round-4): beam search over the
    frozen k=24/3-round graph must land ≥0.90 recall@10 by its final
    round (measured 0.994 at sf0.01, 0.940 at sf0.1), recall must be
    non-decreasing in rounds (the scored set only grows — `rounds` is
    the ef_search-style knob), and the scored-candidate volume must stay
    a strict subset of all-pairs (it's a beam, not a scan)."""
    rows = sorted(
        registry.QUERIES["p42_graph_beam_search"](spark, sf001).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == [0, 1, 2, 3]
    recs = [r["recall_at_10"] for r in rows]
    assert recs == sorted(recs)
    assert recs[-1] >= 0.90, recs
    vols = [r["n_scored"] for r in rows]
    assert vols == sorted(vols)
    assert vols[-1] < 50 * 499  # < exhaustive 50-probe scan


def test_p48_refresh_recall_floor_and_monotone(spark, sf001):
    """The appended-region refresh (round-5 VERDICT #5): one re-descent
    round seeded from the appended lists must land ≥0.85 recall@10 at
    the committed serving config (k=24/3-round substrate — measured
    1.0 at sf0.01, 0.992 at sf0.1 from append's 0.954/0.946), and can
    never make recall worse: the refreshed list is the top-k of a
    superset of the current list under identical exact scores."""
    rows = {
        r["stage"]: r
        for r in registry.QUERIES["p48_graph_refresh_appended"](
            spark, sf001
        ).collect()
    }
    assert set(rows) == {"appended", "refreshed"}
    assert rows["refreshed"]["recall_at_10"] >= 0.85
    assert (
        rows["refreshed"]["recall_at_10"]
        >= rows["appended"]["recall_at_10"]
    )
    assert rows["refreshed"]["n_edges"] >= rows["appended"]["n_edges"]


def test_p43_quantized_operating_points(spark, sf001):
    """The quantized-arm cost↔recall frontier (round-4): recall must be
    monotone in oversample for both arms, and the committed operating
    points must hold — os=16 ≥ 0.85 and os=64 ≥ 0.95 at sf0.01
    (measured 0.96/0.95 and 1.00/1.00; the sf0.1 table lives in
    RECALL.md). The os=4 point the earlier rounds benched is the floor
    of the curve, not its ceiling — this pins the knob's whole range."""
    rows = registry.QUERIES["p43_quantized_oversample_sweep"](
        spark, sf001
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r["method"], []).append(
            (r["oversample"], r["mean_recall_at_10"])
        )
    assert set(by) == {"bq", "pq"}
    for method, pts in by.items():
        pts.sort()
        recs = [rec for _, rec in pts]
        assert recs == sorted(recs), (method, recs)
        d = dict(pts)
        assert d[16] >= 0.85, (method, d)
        assert d[64] >= 0.95, (method, d)


def test_p52_two_level_operating_points(spark, sf001):
    """The two-level serving frontier (round-6 VERDICT #2): flat-
    assignment agreement must be monotone in n_probe_super and exactly
    1.0 at probe=8 (all 8 supers probed = flat — the exactness anchor),
    and the COMMITTED operating point (probe=4, RECALL.md "Two-level
    arm") must hold: serving recall ≥ 0.7 at sf0.01 and within 0.05 of
    the flat-assignment row (measured 0.72 vs 0.73 at sf0.01, 0.92 vs
    0.95 at sf0.1)."""
    rows = {
        r["n_probe_super"]: r
        for r in registry.QUERIES["p52_two_level_operating_points"](
            spark, sf001
        ).collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    agrees = [rows[p]["agree_frac"] for p in (1, 2, 4, 8)]
    assert agrees == sorted(agrees), agrees
    assert rows[8]["agree_frac"] == 1.0
    assert rows[4]["avg_recall_at_10"] >= 0.7
    assert (
        rows[4]["avg_recall_at_10"]
        >= rows[8]["avg_recall_at_10"] - 0.05
    )


def test_p52_rank_filter_equals_operator_assignment(spark, sf001):
    """The sweep's one-scan reformulation — "assignment at probe p =
    the min-rank cell whose super ranks within p" — must produce the
    SAME cells as the real two_level_assign operator (explode + member
    shard join + min_by), at both a throttled and a mid probe. This is
    the bridge that lets p52's frontier speak for the operator."""
    from pyspark.sql import Window

    from mtg_vector_db_spark.operators.ann import (
        ivf_assign,
        ivf_ranked_assign,
        two_level_assign,
    )

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    seeds = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    supers = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("super"),
        F.col("centroid") if "centroid" in emb.columns
        else F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    casg = ivf_assign(
        seeds.select(
            F.col("cell").alias("vec_id"),
            F.col("centroid").alias("embedding"),
        ),
        supers,
        cluster_col="super",
        centroid_col="centroid",
    ).select(F.col("vec_id").alias("cell"), "super")
    cellr = ivf_ranked_assign(
        emb, seeds, nprobe=64, rank_col="crank"
    ).select("vec_id", "cell", "crank")
    supr = ivf_ranked_assign(
        emb, supers, nprobe=8, cluster_col="super", rank_col="srank"
    ).select("vec_id", "super", "srank")
    cand = cellr.join(F.broadcast(casg), "cell").join(
        supr, ["vec_id", "super"]
    )
    for p in (1, 4):
        w = Window.partitionBy("vec_id").orderBy("crank")
        ranked = (
            cand.filter(F.col("srank") <= p)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "cell")
        )
        op = two_level_assign(
            emb, seeds, n_super=8, n_probe_super=p
        ).select("vec_id", "cell")
        assert ranked.exceptAll(op).count() == 0, p
        assert op.exceptAll(ranked).count() == 0, p
