"""Binary quantization for embedding search (sign-bit signatures +
Hamming-distance candidate generation, exact-cosine rescore).

The reference's ANN is a pgvector HNSW index (db/init.sql:50-53); pgvector's
own scale path past HNSW-in-RAM is bit-quantized vectors reranked by exact
distance, and that two-stage shape is what fits Spark: a 64-dim float
embedding becomes two 32-bit words (16× smaller scan), candidates come from
a TakeOrdered over popcount(xor) — cheap JVM bit ops, no floats — and only
the ~k·oversample survivors touch full-precision cosine.

Signature packing is ONE nested higher-order expression (transform over
words, aggregate over bits) — deliberately not N sibling HOF columns, which
this Spark version miscompiles (see tests/test_properties.py pins).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.vector import cosine_similarity

WORD_BITS = 32  # 32 bits per packed word: stays positive in a signed long


def binary_signature(c: Column, dim: int) -> Column:
    """Sign-bit signature of an ``array<float>``: array of ceil(dim/32)
    longs, bit b of word w set iff ``c[w*32+b] > 0``.

    MSB-first Horner fold (``acc*2 + indicator``) — pure long arithmetic.
    An LSB-first ``acc + pow(2, b)`` formulation computes the same values
    but its 32 POWER() calls per word cost ~0.7 s more codegen/JIT on the
    first run of a plan (measured cold-process at sf0.1)."""
    n_words = math.ceil(dim / WORD_BITS)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(WORD_BITS - 1), F.lit(0), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2
            + F.when(
                F.element_at(c, (w * WORD_BITS + b + 1).cast("int")) > 0,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def signature_of(vec: Sequence[float]) -> list[int]:
    """Driver-side signature of a literal query vector (same packing)."""
    words = [0] * math.ceil(len(vec) / WORD_BITS)
    for i, x in enumerate(vec):
        if x > 0:
            words[i // WORD_BITS] |= 1 << (i % WORD_BITS)
    return words


def hamming_packed(a: Column, b: Column) -> Column:
    """popcount(xor) summed over packed words → bigint."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def hamming_unpacked(a: Column, b: Column) -> Column:
    """Reference formulation straight off the float arrays (count of dims
    whose signs disagree) — the form the DuckDB oracle replays; equals
    :func:`hamming_packed` over :func:`binary_signature` (property test)."""
    return F.size(
        F.filter(
            F.zip_with(a, b, lambda x, y: (x > 0) != (y > 0)),
            lambda v: v,
        )
    ).cast("long")


def bq_search(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int,
    oversample: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage binary-quantized search: top ``k*oversample`` by packed
    Hamming distance (ascending, id tie-break), exact-cosine rescore to
    top ``k`` → ``(doc_id, hamming, sim)``.

    At 100 TB the candidate stage scans only the signature column
    (ReadSchema-pruned) and plans TakeOrderedAndProject; the rescore
    touches ``k*oversample`` rows.
    """
    dim = len(query_vec)
    q_sig = F.array(*[F.lit(w).cast("long") for w in signature_of(query_vec)])
    sig = binary_signature(F.col(emb_col), dim)
    cand = (
        emb.select(
            F.col(id_col).alias("doc_id"),
            F.col(emb_col),
            hamming_packed(sig, q_sig).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("doc_id"))
        .limit(k * oversample)
    )
    sim = F.round(
        cosine_similarity(F.col(emb_col), list(query_vec)), round_digits
    )
    return (
        cand.withColumn("sim", sim)
        .select("doc_id", "hamming", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Scalar (int8) quantization — pgvector's halfvec/int8 storage analog: 4x
# smaller vectors at a measurable reconstruction error, trained from
# per-dimension ranges.
# ---------------------------------------------------------------------------
def sq_train(
    emb: DataFrame, emb_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) ranges — the SQ "codebook". One
    posexplode + 64-group aggregation; the 2×dim result is collected to
    the driver and re-broadcast as literals (same pattern as IVF
    centroids: train-then-apply, stats are tiny)."""
    mm = (
        emb.select(F.posexplode(emb_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("i")
        .collect()
    )
    return [float(r["lo"]) for r in mm], [float(r["hi"]) for r in mm]


def sq_quantize(
    c: Column,
    lo: Sequence[float],
    hi: Sequence[float],
    levels: int = 255,
) -> Column:
    """array<float> → array<int> of 0..``levels`` codes:
    ``floor((x-lo)/(hi-lo)*levels + 0.5)`` (explicit half-up — identical
    SQL semantics everywhere, unlike engine-specific round()).
    ``levels = 2^bits − 1``: 255 for int8, 15 for 4-bit, 3 for 2-bit."""
    lo_a = F.array(*[F.lit(v) for v in lo])
    hi_a = F.array(*[F.lit(v) for v in hi])
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(lo))),
        lambda i: F.when(
            F.element_at(hi_a, i) == F.element_at(lo_a, i), F.lit(0)
        )
        .otherwise(
            F.floor(
                (F.element_at(c, i).cast("double") - F.element_at(lo_a, i))
                / (F.element_at(hi_a, i) - F.element_at(lo_a, i))
                * levels
                + 0.5
            )
        )
        .cast("int"),
    )


def sq_dequantize(
    q: Column,
    lo: Sequence[float],
    hi: Sequence[float],
    levels: int = 255,
) -> Column:
    """Codes → reconstructed doubles: ``lo + q/levels*(hi-lo)``."""
    lo_a = F.array(*[F.lit(v) for v in lo])
    hi_a = F.array(*[F.lit(v) for v in hi])
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(lo))),
        lambda i: F.element_at(lo_a, i)
        + F.element_at(q, i) / float(levels)
        * (F.element_at(hi_a, i) - F.element_at(lo_a, i)),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third rung of the quantization ladder
# (binary 1 bit/dim, scalar 8 bits/dim, PQ ~0.5-1 bit/dim): split each
# vector into m subvectors, vector-quantize each subspace against its own
# small codebook, store only the m code ids. Search is asymmetric distance
# computation (ADC): the query precomputes a (m × n_codes) distance table
# once, then every database vector costs m table lookups — no float math
# per dimension. This is the in-Spark analog of the IVF-PQ indexes behind
# pgvector-scale ANN serving (reference index: db/init.sql:50-53); train/
# encode is the "batch vector index build" north star, ADC the scan kernel.
# ---------------------------------------------------------------------------
def _kmeans_np(
    x: "np.ndarray", k: int, seed: int, max_iter: int
) -> "np.ndarray":
    """Seeded k-means++ init + Lloyd iterations on an in-memory sample.
    Deterministic for a given (sample, seed); empty clusters are reseeded
    to the point farthest from its assigned centroid."""
    rng = np.random.RandomState(seed)
    n = x.shape[0]
    if n <= k:
        # degenerate corpus: pad with repeats of the first rows
        return x[np.arange(k) % max(n, 1)].copy()
    # k-means++ seeding
    cents = np.empty((k, x.shape[1]), dtype=np.float64)
    cents[0] = x[rng.randint(n)]
    d2 = ((x - cents[0]) ** 2).sum(1)
    for j in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents[j] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, ((x - cents[j]) ** 2).sum(1))
    for _ in range(max_iter):
        dist = (
            (x * x).sum(1, keepdims=True) - 2.0 * x @ cents.T + (cents * cents).sum(1)
        )
        assign = np.argmin(dist, axis=1)
        new = np.empty_like(cents)
        for j in range(k):
            mask = assign == j
            if mask.any():
                new[j] = x[mask].mean(0)
            else:
                new[j] = x[np.argmax(np.min(dist, axis=1))]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def pq_train(
    emb: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    emb_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    sample_size: int = 65536,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks on a deterministic bounded sample of
    the L2-normalized corpus. Returns ``codebooks[m][n_codes][dim/m]``.

    Vectors are normalized BEFORE splitting so ADC's squared-L2 ordering
    on the unit sphere matches cosine ordering (same trick as the IVF and
    LSH paths). Codebooks are trained driver-side on a sample — the
    standard PQ recipe (codebooks converge on ~10⁴-10⁵ vectors no matter
    the corpus size), and the sample is drawn with a TakeOrdered over
    ``xxhash64(embedding)`` so it is deterministic, uniform-ish, and at
    100 TB costs one columnar scan with NO full shuffle (top-k per
    partition, tiny merge). Distributed MLlib fits here would pay m
    full-job round-trips to learn the same tiny tables — measured 33 s →
    <2 s at sf0.1 for m=8. Encoding (the actual full-corpus pass) stays
    distributed in :func:`pq_encode`.
    """
    from mtg_vector_db_spark.functions.vector import l2_normalize

    rows = (
        emb.select(l2_normalize(F.col(emb_col)).alias("nv"))
        .withColumn("_h", F.xxhash64(F.col("nv")))
        .orderBy("_h")
        .limit(sample_size)
        .select("nv")
        .collect()
    )
    x = np.array([r["nv"] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    return [
        _kmeans_np(
            x[:, s * d_sub : (s + 1) * d_sub], n_codes, seed + s, max_iter
        ).tolist()
        for s in range(m)
    ]


def seeded_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks without training — the p17 freeze
    pattern applied to PQ: codeword ``j`` of subspace ``s`` is the
    L2-normalized vector with id ``j``, sliced to subspace ``s``. A pure
    function of the corpus that a SQL engine replays exactly (normalize →
    slice), which makes the full encode → ADC → rescore chain
    oracle-able; :func:`pq_train`'s k-means codebooks remain the
    quality/recall path (floors pinned in tests/test_quantize.py).

    Normalization runs through the Catalyst fold (functions/vector.py:
    l2_normalize), NOT numpy, so the collected codewords are bit-identical
    to what a sequential-fold SQL engine computes from the same rows.
    """
    from mtg_vector_db_spark.functions.vector import l2_normalize

    rows = sorted(
        emb.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col), l2_normalize(F.col(emb_col)).alias("nx"))
        .collect(),
        key=lambda r: r[id_col],
    )
    if len(rows) < n_codes:
        raise ValueError(f"corpus has fewer than {n_codes} seed vectors")
    dim = len(rows[0]["nx"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    return [
        [
            [float(x) for x in r["nx"][s * d_sub : (s + 1) * d_sub]]
            for r in rows
        ]
        for s in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    emb_col: str = "embedding",
    tie_digits: int = 9,
) -> DataFrame:
    """Append ``codes: array<int>`` (length m) — each subvector's nearest
    codebook entry by squared L2, ties to the lowest code id.

    Arrow-batched numpy kernel (one (batch × n_codes) GEMM-ish distance per
    subspace), the same physical strategy as :func:`ann.knn_numpy`: encoding
    is the throughput-critical full-corpus pass, so it stays vectorized.
    Distances are rounded to ``tie_digits`` before the argmin so the code
    choice is reproducible against a sequential-fold SQL replay (numpy's
    pairwise summation differs in the last ulp).
    """
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(cbs)
    d_sub = cbs[0].shape[1]

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        x = np.array(list(col), dtype=np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        x /= norms
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for s in range(m):
            sub = x[:, s * d_sub : (s + 1) * d_sub]
            # (batch, n_codes) squared distances; argmin takes lowest id on ties
            d2 = (
                (sub * sub).sum(1, keepdims=True)
                - 2.0 * sub @ cbs[s].T
                + (cbs[s] * cbs[s]).sum(1)
            )
            codes[:, s] = np.argmin(np.round(d2, tie_digits), axis=1)
        return pd.Series(list(codes))

    return emb.withColumn("codes", encode(F.col(emb_col)))


def pq_adc_distance(
    codes: Column,
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
) -> Column:
    """Approximate squared-L2 distance of the (normalized) query to a coded
    vector: ``sum_s dtable[s][codes[s]]``, with the (m × n_codes) distance
    table folded in as a literal — per row this is m array lookups in
    codegen'd JVM expression land, no Python and no per-dimension floats."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    dtable = []
    for s in range(m):
        qs = q[s * d_sub : (s + 1) * d_sub]
        cb = np.asarray(codebooks[s], dtype=np.float64)
        dtable.append(((cb - qs) ** 2).sum(1).tolist())
    dt_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in dtable])
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(dt_lit, (s + 1).cast("int")),
            (F.element_at(codes, (s + 1).cast("int")) + 1).cast("int"),
        ),
    )


def pq_search(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
    k: int,
    oversample: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage PQ search: top ``k*oversample`` candidates by ADC distance
    (TakeOrdered — never a full sort), exact-cosine rescore to top ``k`` →
    ``(doc_id, adc_dist, sim)``.

    Same two-stage contract as :func:`bq_search`; at scale the encoded table
    is persisted once (codes ≈ m bytes/vector vs 4·dim) and the candidate
    scan reads ONLY the codes column."""
    encoded = pq_encode(emb, codebooks, emb_col=emb_col)
    cand = (
        encoded.select(
            F.col(id_col).alias("doc_id"),
            F.col(emb_col),
            F.round(
                pq_adc_distance(F.col("codes"), codebooks, query_vec), round_digits
            ).alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc("doc_id"))
        .limit(k * oversample)
    )
    sim = F.round(
        cosine_similarity(F.col(emb_col), list(query_vec)), round_digits
    )
    return (
        cand.withColumn("sim", sim)
        .select("doc_id", "adc_dist", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )


def sq_reconstruction_error(
    emb: DataFrame,
    lo: Sequence[float],
    hi: Sequence[float],
    emb_col: str = "embedding",
    levels: int = 255,
) -> Column:
    """Squared L2 reconstruction error per row (fold over dims — fixed
    evaluation order, so an SQL engine replays it exactly)."""
    deq = sq_dequantize(
        sq_quantize(F.col(emb_col), lo, hi, levels), lo, hi, levels
    )
    dbl = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(dbl, deq, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivfpq_search(
    emb: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
    k: int,
    nprobe: int = 2,
    oversample: int = 4,
    cluster_col: str = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ: coarse-quantizer cell pruning THEN PQ ADC candidates THEN
    exact rescore — the composed index structure behind billion-scale ANN
    (FAISS IVFPQ / pgvector's roadmap shape), on DataFrames.

    The two stages prune independently: IVF cuts the scan to ``nprobe``
    cells (partition pruning when the corpus is written partitioned by
    cell), PQ cuts per-row cost inside a cell to m table lookups. With both,
    a 100 TB corpus reads nprobe/n_cells of its partitions and only the
    codes column of those."""
    from mtg_vector_db_spark.operators.ann import ivf_probe_cells

    # In-plan nprobe pick (round-5 VERDICT #9): broadcast semi-join, no
    # per-query driver round-trip; DPP-prunes a cell-partitioned layout.
    probe = ivf_probe_cells(centroids, query_vec, nprobe, cluster_col)
    pruned = emb.join(F.broadcast(probe), cluster_col, "left_semi")
    return pq_search(
        pruned,
        codebooks,
        query_vec,
        k,
        oversample=oversample,
        emb_col=emb_col,
        id_col=id_col,
        round_digits=round_digits,
    )


# ---------------------------------------------------------------------------
# Residual quantization (RQ): a second codebook trained on the residuals
# of the first — reconstruction x̂ = C1[c1] + C2[c2]. The additive-codebook
# family (RQ/LSQ) behind modern billion-scale indexes; complements the
# subspace split of PQ with a full-dimension refinement stage.
# ---------------------------------------------------------------------------


def _lit_vec(cw: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in cw])


def rq_assign(vec_dbl: Column, codebook: list[list[float]]) -> Column:
    """Nearest-codeword id for a double-array column: argmin over
    ``round(c·c − 2·x·c, 9)`` with lowest-id tie-break (the PQ round-
    before-argmin discipline, so a SQL replay agrees bit-for-bit).
    ``c·c`` is folded ONCE per codeword as a left-to-right Python float64
    sum — bit-identical to the sequential ``list_inner_product`` fold the
    oracle runs (same IEEE adds, same order), without re-evaluating a
    64-element literal fold per row."""
    from mtg_vector_db_spark.functions.vector import dot

    def cc(cw: Sequence[float]) -> float:
        acc = 0.0
        for x in cw:
            acc += x * x
        return acc

    cands = [
        F.struct(
            F.round(F.lit(cc(cw)) - F.lit(2.0) * dot(vec_dbl, cw), 9).alias("d"),
            F.lit(j).alias("j"),
        )
        for j, cw in enumerate(codebook)
    ]
    return F.array_min(F.array(*cands)).getField("j")


def rq_residual(vec_dbl: Column, code: Column, codebook: list[list[float]]) -> Column:
    """x − C[code] as a double array (literal codeword table lookup)."""
    table = F.array(*[_lit_vec(cw) for cw in codebook])
    return F.zip_with(vec_dbl, F.element_at(table, code + 1), lambda x, c: x - c)


def seeded_rq_codebooks(
    emb: DataFrame,
    k: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[float]]]:
    """Deterministic two-stage RQ codebooks, the p17/seeded-PQ freeze
    pattern: stage 1 = the raw vectors with id < k; stage 2 = the EXACT
    zero vector plus the stage-1 residuals of the NEXT k−1 vectors
    (k ≤ id < 2k−1 — the stage-1 seeds assign to themselves with zero
    residual, so their residuals carry no information; the next block's
    residuals are the actual error distribution stage 2 must cover).
    Including the zero codeword makes stage 2 monotone by construction —
    argmin can always keep the residual unchanged, so per-row stage-2
    error ≤ stage-1 error, an invariant the tests pin. Residuals are
    computed through the same Catalyst folds the oracle replays, so the
    collected literals are bit-identical to a SQL engine's. Both collects
    are k-row bounded (codebook-sized, never corpus-sized)."""
    rows = sorted(
        emb.filter(F.col(id_col) < k).select(id_col, emb_col).collect(),
        key=lambda r: r[id_col],
    )
    if len(rows) < k:
        raise ValueError(f"corpus has fewer than {k} seed vectors")
    cb1 = [[float(x) for x in r[emb_col]] for r in rows]
    dim = len(cb1[0])
    dbl = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    seeds = emb.filter(
        (F.col(id_col) >= k) & (F.col(id_col) < 2 * k - 1)
    ).select(F.col(id_col), dbl.alias("v"))
    code = rq_assign(F.col("v"), cb1)
    res_rows = sorted(
        seeds.select(
            F.col(id_col), rq_residual(F.col("v"), code, cb1).alias("r")
        ).collect(),
        key=lambda r: r[id_col],
    )
    cb2 = [[0.0] * dim] + [[float(x) for x in r["r"]] for r in res_rows]
    return cb1, cb2


def rq_error_report(
    emb: DataFrame,
    cb1: list[list[float]],
    cb2: list[list[float]],
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label reconstruction audit of the two RQ stages: n_vecs and
    the mean squared L2 error after stage 1 (nearest seed codeword) and
    after stage 2 (codeword + nearest residual codeword). One corpus
    scan, all codebooks literal (broadcast-free map work); the v07
    round(avg, 6) reporting discipline."""
    dbl = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    c1 = rq_assign(dbl, cb1)
    sq = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, lambda d: d * d), F.lit(0.0), lambda acc, x: acc + x
    )
    staged = emb.select(
        F.col(label_col).alias("label"),
        rq_residual(dbl, c1, cb1).alias("r1"),
    )
    c2 = rq_assign(F.col("r1"), cb2)
    errs = staged.select(
        "label",
        sq(F.col("r1")).alias("err1"),
        sq(rq_residual(F.col("r1"), c2, cb2)).alias("err2"),
    )
    return (
        errs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("err1"), 6).alias("mse_stage1"),
            F.round(F.avg("err2"), 6).alias("mse_stage2"),
        )
        .orderBy("label")
    )
