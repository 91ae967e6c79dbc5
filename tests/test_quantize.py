"""Binary quantization: packed/unpacked Hamming equivalence, Python-model
parity for the packing itself, and recall of the two-stage search against
exact KNN (oracle parity for p11 runs via the p-family suite)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mtg_vector_db_spark.operators.knn import knn
from mtg_vector_db_spark.operators.quantize import (
    binary_signature,
    bq_search,
    hamming_packed,
    hamming_unpacked,
    signature_of,
)
from mtg_vector_db_spark.plans.vector_queries import query_vector


def _random_vecs(n, dim, seed):
    rng = random.Random(seed)
    return [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]


def test_signature_matches_python_model(spark):
    rows = _random_vecs(50, 64, seed=7)
    df = spark.createDataFrame(rows, ["vid", "vec"])
    got = df.select(
        "vid", binary_signature(F.col("vec"), 64).alias("sig")
    ).collect()
    for r in got:
        expect = signature_of(dict(rows)[r["vid"]])
        assert list(r["sig"]) == expect


def test_packed_hamming_equals_unpacked(spark):
    rows = _random_vecs(40, 64, seed=11)
    df = spark.createDataFrame(rows, ["vid", "vec"])
    a = df.select(F.col("vid").alias("ida"), F.col("vec").alias("va"))
    b = df.select(F.col("vid").alias("idb"), F.col("vec").alias("vb"))
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    mism = pairs.select(
        (
            hamming_packed(
                binary_signature(F.col("va"), 64),
                binary_signature(F.col("vb"), 64),
            )
            != hamming_unpacked(F.col("va"), F.col("vb"))
        ).alias("diff")
    ).filter("diff")
    assert mism.count() == 0


def test_bq_search_recall_vs_exact(spark, sf001):
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    exact = {r["vec_id"] for r in knn(emb, qv, 10, round_digits=6).collect()}
    bq = {
        r["doc_id"]
        for r in bq_search(emb, qv, k=10, oversample=4).collect()
    }
    # Sign-bit Hamming is a coarse filter; with 4x oversample on 64 dims
    # it must still recover most of the exact top-10.
    assert len(exact & bq) / len(exact) >= 0.5


def test_sq_codes_bounded_and_error_within_step(spark, sf001):
    from mtg_vector_db_spark.operators.quantize import (
        sq_quantize,
        sq_reconstruction_error,
        sq_train,
    )

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    lo, hi = sq_train(emb)
    assert len(lo) == len(hi) == 64
    assert all(l <= h for l, h in zip(lo, hi))

    codes = emb.select(
        sq_quantize(F.col("embedding"), lo, hi).alias("q")
    ).select(
        F.array_min("q").alias("mn"), F.array_max("q").alias("mx")
    ).agg(F.min("mn"), F.max("mx")).collect()[0]
    assert codes[0] >= 0 and codes[1] <= 255

    # Per-dim error ≤ half a step; squared-L2 over all dims bounded by
    # sum of (step_i/2)^2.
    bound = sum(((h - l) / 255.0 / 2) ** 2 for l, h in zip(lo, hi))
    worst = emb.select(
        sq_reconstruction_error(emb, lo, hi).alias("e")
    ).agg(F.max("e")).collect()[0][0]
    assert worst <= bound * 1.0000001


def test_sq_quantized_knn_recall(spark, sf001):
    """KNN on dequantized vectors must largely agree with exact KNN —
    the accept/reject measurement for switching storage to int8."""
    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.quantize import (
        sq_dequantize,
        sq_quantize,
        sq_train,
    )
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    lo, hi = sq_train(emb)
    deq = sq_dequantize(sq_quantize(F.col("embedding"), lo, hi), lo, hi)
    approx = (
        emb.select(
            "vec_id", cosine_similarity(deq, qv).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    exact = knn(emb, qv, 10, round_digits=6).collect()
    overlap = {r["vec_id"] for r in approx} & {r["vec_id"] for r in exact}
    assert len(overlap) >= 8


def test_mmr_matches_python_model_and_diversifies(spark, sf001):
    """p13's distributed MMR equals a straight Python re-implementation
    over the same collected candidates, and never ranks a near-duplicate
    of an already-selected doc above a diverse alternative."""
    import numpy as np

    from mtg_vector_db_spark.operators.diversify import mmr_select
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    out = registry.QUERIES["p13_mmr_diversify"](spark, sf001).collect()
    assert {r["query_id"] for r in out} == set(range(5))

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    from mtg_vector_db_spark.operators.knn import knn_join

    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cand = (
        knn_join(emb, queries_df, k=20, round_digits=6)
        .join(emb, "vec_id")
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in cand:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: (-r["sim"], r["vec_id"]))
        V = np.array([r["embedding"] for r in rows], dtype=np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        picks = mmr_select(
            np.array([r["sim"] for r in rows]), np.round(V @ V.T, 6), 5, 0.7
        )
        expect = [
            (qid, rows[i]["vec_id"], rank + 1, v)
            for rank, (i, v) in enumerate(picks)
        ]
        got = [
            (r["query_id"], r["doc_id"], r["mmr_rank"], r["mmr_score"])
            for r in out
            if r["query_id"] == qid
        ]
        assert got == expect


def _pq_setup(spark, sf001):
    import numpy as np

    from mtg_vector_db_spark.operators.quantize import pq_train

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    cbs = pq_train(emb, m=8, n_codes=16)
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ids = [r["vec_id"] for r in rows]
    return emb, cbs, ids, x


def test_pq_encode_matches_numpy_model(spark, sf001):
    import numpy as np

    from mtg_vector_db_spark.operators.quantize import pq_encode

    emb, cbs, ids, x = _pq_setup(spark, sf001)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, cbs).select("vec_id", "codes").collect()
    }
    for row_i, vid in enumerate(ids):
        expect = []
        for s in range(8):
            sub = x[row_i, s * 8 : (s + 1) * 8]
            cb = np.asarray(cbs[s])
            expect.append(
                int(np.argmin(np.round(((cb - sub) ** 2).sum(1), 9)))
            )
        assert got[vid] == expect, vid
    assert all(0 <= c < 16 for codes in got.values() for c in codes)


def test_pq_adc_matches_numpy_dtable(spark, sf001):
    import numpy as np

    from mtg_vector_db_spark.operators.quantize import pq_adc_distance, pq_encode

    emb, cbs, ids, x = _pq_setup(spark, sf001)
    qv = query_vector(spark, sf001)
    q = np.asarray(qv) / np.linalg.norm(qv)
    got = {
        r["vec_id"]: r["adc"]
        for r in pq_encode(emb, cbs)
        .select(
            "vec_id", pq_adc_distance(F.col("codes"), cbs, qv).alias("adc")
        )
        .collect()
    }
    dtable = []
    for s in range(8):
        cb = np.asarray(cbs[s])
        dtable.append(((cb - q[s * 8 : (s + 1) * 8]) ** 2).sum(1))
    for row_i, vid in enumerate(ids):
        expect = 0.0
        for s in range(8):
            sub = x[row_i, s * 8 : (s + 1) * 8]
            cb = np.asarray(cbs[s])
            expect += dtable[s][
                int(np.argmin(np.round(((cb - sub) ** 2).sum(1), 9)))
            ]
        assert abs(got[vid] - expect) < 1e-9, vid


def test_pq_search_recall_vs_exact(spark, sf001):
    from mtg_vector_db_spark.operators.quantize import pq_search, pq_train

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    cbs = pq_train(emb, m=8, n_codes=16)
    exact = {r["vec_id"] for r in knn(emb, qv, 10, round_digits=6).collect()}
    got = pq_search(emb, cbs, qv, k=10, oversample=4).collect()
    assert len(got) == 10
    # 8 subspaces × 16 codes on 64 dims is a fine quantizer; with 4×
    # oversample + exact rescore it must recover most of the exact top-10.
    assert len(exact & {r["doc_id"] for r in got}) / len(exact) >= 0.6
    # rescore output is ordered by exact similarity
    sims = [r["sim"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_ivfpq_recall_vs_same_cells_exact(spark, sf001):
    from mtg_vector_db_spark.operators.ann import (
        ivf_probe_labels,
        kmeans_ivf_build,
    )
    from mtg_vector_db_spark.operators.quantize import ivfpq_search, pq_train

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    centroids, assigned = kmeans_ivf_build(emb, n_cells=16)
    cbs = pq_train(emb, m=8, n_codes=16)
    got = ivfpq_search(
        assigned, centroids, cbs, qv, k=10, nprobe=2, cluster_col="cell"
    ).collect()
    assert len(got) == 10

    labels = ivf_probe_labels(centroids, qv, 2, cluster_col="cell")
    pruned = assigned.filter(F.col("cell").isin(labels))
    cell_exact = {r["vec_id"] for r in knn(pruned, qv, 10, round_digits=6).collect()}
    # PQ candidates come only from the probed cells, so the honest baseline
    # is exact KNN over those same cells.
    assert len(cell_exact & {r["doc_id"] for r in got}) / 10 >= 0.6
    sims = [r["sim"] for r in got]
    assert sims == sorted(sims, reverse=True)
    # A geometric coarse quantizer must route the query vector's own cell
    # into the probe set: vec 0 (the query itself) is recalled at sim 1.0.
    assert got[0]["doc_id"] == 0 and got[0]["sim"] == 1.0


def test_rq_stage2_monotone_and_improving(spark, sf001):
    """The zero codeword makes stage 2 monotone BY CONSTRUCTION
    (per-label mse_stage2 ≤ mse_stage1), and on real data the residual
    codebook should actually help somewhere, not just not-hurt."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["v15_rq_error"](spark, sf001).collect()
    assert rows, "expected per-label rows"
    assert all(r["mse_stage2"] <= r["mse_stage1"] for r in rows), rows
    assert any(r["mse_stage2"] < r["mse_stage1"] for r in rows), rows
