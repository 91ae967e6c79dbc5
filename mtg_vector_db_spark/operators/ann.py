"""Approximate nearest-neighbor strategies (SURVEY.md §4.3, V3).

The reference's HNSW indexes (/root/reference/db/init.sql:50-53,69-72,
111-114,146-149; m=16, ef_construction=64) have no Spark equivalent; exact
brute-force KNN (operators/knn.py) is the declared correctness baseline.
These are the batch/scale paths:

* IVF (inverted file): partition vectors into coarse cells, search only the
  ``nprobe`` nearest cells. Centroid build is one aggregation; the probe is
  a partition-pruned exact KNN. On disk, writing the corpus partitioned by
  cell id makes the probe a partition-pruned parquet scan at 100 TB —
  that layout IS the index.
* MLlib BucketedRandomProjectionLSH on L2-normalized vectors (cosine top-k
  ≡ Euclidean top-k on the unit sphere) — the "batch vector index build"
  north star; persisted bucket table = the index.
* numpy matrix-multiply kernel via mapInPandas — the Arrow fast path for
  wide vectors / large query batches, where HOF expression evaluation is
  not competitive.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.vector import cosine_similarity


def centroids_by(
    emb: DataFrame,
    cluster_col: str = "label",
    emb_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per cluster: (cluster, pos, c) long format —
    a single shuffle keyed on (cluster, pos); no wide-row materialization."""
    return (
        emb.select(cluster_col, F.posexplode(emb_col).alias("pos", "v"))
        .groupBy(cluster_col, "pos")
        .agg(F.avg("v").alias("c"))
    )


def centroid_vectors(centroids_long: DataFrame, cluster_col: str = "label") -> DataFrame:
    """Collapse long-format centroids to (cluster, centroid array<double>)."""
    return centroids_long.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
        ).alias("centroid")
    )


def ivf_probe_labels(
    centroids: DataFrame,
    query_vec: Sequence[float],
    nprobe: int,
    cluster_col: str = "label",
) -> list:
    """The ``nprobe`` clusters nearest to the query (driver-side pick over
    the tiny centroid table — the IVF coarse quantizer step). Legacy
    strategy: prefer :func:`ivf_probe_cells` (the in-plan form) in query
    paths — it answers identically without a per-query driver job."""
    sim = cosine_similarity(F.col("centroid"), list(query_vec))
    rows = (
        centroids.select(cluster_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(cluster_col))
        .limit(nprobe)
        .collect()
    )
    return [r[cluster_col] for r in rows]


def ivf_probe_cells(
    centroids: DataFrame,
    query_vec: Sequence[float],
    nprobe: int,
    cluster_col: str = "label",
) -> DataFrame:
    """In-plan twin of :func:`ivf_probe_labels` (round-5 VERDICT #9): the
    ``nprobe`` nearest clusters as an nprobe-row DataFrame for a
    broadcast semi-join — same (sim DESC, cluster) pick, zero driver
    round-trips. Against a cell-partitioned layout the broadcast
    semi-join triggers dynamic partition pruning (the p45/p47 serving
    shape), so the pruning the ``isin`` literal bought statically still
    happens — at runtime, where it belongs for a data-derived probe."""
    sim = cosine_similarity(F.col("centroid"), list(query_vec))
    return (
        centroids.select(cluster_col, sim.alias("_csim"))
        .orderBy(F.desc("_csim"), F.asc(cluster_col))
        .limit(nprobe)
        .select(cluster_col)
    )


def two_level_probe_cells(
    cents_sup: DataFrame,
    supers: DataFrame,
    query_vec: Sequence[float],
    nprobe: int,
    n_probe_super: int = 2,
    cluster_col: str = "cell",
    super_col: str = "super_cell",
    centroid_col: str = "centroid",
) -> DataFrame:
    """Query-side two-level coarse probe — the IMI SERVING half
    (:func:`two_level_assign` is the build half): score the ⌈√k⌉ supers,
    semi-join the centroid table down to the top ``n_probe_super``
    supers' member shards (dynamic-partition-prunable when the codebook
    is stored ``partitionBy(super_col)``), then TakeOrdered the
    ``nprobe`` nearest cells among ONLY those members. Per-query scored
    centroid rows drop from O(k) (:func:`ivf_probe_cells` scans the
    whole codebook per query) to O(√k + probed members) — at the 4M-cell
    framing, ~4k rows instead of 4M. Same (sim DESC, id ASC) cosine pick
    as :func:`ivf_probe_cells` at both levels, so a SQL oracle replays
    with two ranked CTEs."""
    ssim = cosine_similarity(F.col(centroid_col), list(query_vec))
    s_pick = (
        supers.select(super_col, ssim.alias("_ss"))
        .orderBy(F.desc("_ss"), F.asc(super_col))
        .limit(n_probe_super)
        .select(super_col)
    )
    csim = cosine_similarity(F.col(centroid_col), list(query_vec))
    return (
        cents_sup.join(F.broadcast(s_pick), super_col, "left_semi")
        .select(cluster_col, csim.alias("_cs"))
        .orderBy(F.desc("_cs"), F.asc(cluster_col))
        .limit(nprobe)
        .select(cluster_col)
    )


def min_pool_nprobe(
    n_corpus: int,
    n_cells: int,
    k: int,
    nprobe: int,
    c: int = 32,
) -> int:
    """Candidate-pool floor for a coarse probe (round-8 VERDICT #6):
    the number of cells to probe so the EXPECTED candidate pool
    (nprobe · n_corpus / n_cells) is at least ``c·k`` — never less than
    the caller's ``nprobe``, never more than every cell.

    Why: serving recall tracks the candidate POOL, not the probe
    fraction. Measured on the p52 two-level rig (64 cells, assignment
    probe 4, k=10): at 500 vectors the default 8-cell probe pools ~65
    candidates and serves 0.72; widening to pool ≈ 250 (25·k) serves
    0.90 and ≈ 375 serves 0.99 — while at 2000 vectors the same 8-cell
    probe already pools ~250 and serves 0.92 (RECALL.md "Two-level
    arm: the small-corpus dial"). c=32 puts the floor above the
    measured 0.9 knee with margin. Small corpora (or over-celled
    layouts) probe more cells; at production scale the formula returns
    ``nprobe`` unchanged.

    A pure closed form of bounded inputs (one corpus count), so query
    plans stay SQL-replayable: the oracle computes the same ceil."""
    import math

    if n_corpus <= 0:
        return n_cells
    need = math.ceil(c * k * n_cells / n_corpus)
    return max(min(max(nprobe, need), n_cells), 1)


def ivf_search(
    emb: DataFrame,
    centroids: DataFrame,
    query_vec: Sequence[float],
    k: int,
    nprobe: int = 2,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int | None = None,
    probe_strategy: str = "join",
) -> DataFrame:
    """IVF ANN: exact KNN restricted to the nprobe nearest cells.

    ``probe_strategy="join"`` (default since round 6): the coarse probe
    is a broadcast semi-join against the in-plan nprobe pick — ONE Spark
    job per search, DPP-prunable against a partitioned layout.
    ``"collect"`` keeps the legacy driver-side label pick (an ``isin``
    literal — static partition pruning, at the cost of a per-query
    driver round-trip). Identical answers either way (test-pinned)."""
    from mtg_vector_db_spark.operators.knn import knn

    if probe_strategy == "collect":
        labels = ivf_probe_labels(centroids, query_vec, nprobe, cluster_col)
        pruned = emb.filter(F.col(cluster_col).isin(labels))
    elif probe_strategy == "join":
        probe = ivf_probe_cells(centroids, query_vec, nprobe, cluster_col)
        pruned = emb.join(F.broadcast(probe), cluster_col, "left_semi")
    else:
        raise ValueError(f"unknown probe_strategy: {probe_strategy!r}")
    return knn(pruned, query_vec, k, emb_col=emb_col, id_col=id_col,
               round_digits=round_digits)


def knn_numpy(
    emb: DataFrame,
    query_vecs: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Arrow fast-path batch KNN: per partition, one numpy GEMM of the
    partition's vectors against all queries, keeping a per-partition top-k;
    the tiny (n_queries × k × n_partitions) result is then globally reduced.
    This is the throughput kernel for wide vectors — same semantics as
    knn_join, different physical strategy.
    """
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    nq = qn.shape[0]

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.array(list(pdf[emb_col]), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qn.T  # (rows, nq)
            if round_digits is not None:
                # Round BEFORE selection so the per-partition prune, the
                # global rank, and a SQL oracle all order the same values.
                sims = np.round(sims, round_digits)
            kk = min(k, sims.shape[0])
            ids = pdf[id_col].to_numpy()
            frames = []
            for j in range(nq):
                # lexsort keeps the (sim DESC, id ASC) tie-break exact, so
                # partition pruning can never drop the true k-th row.
                top = np.lexsort((ids, -sims[:, j]))[:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": j,
                            id_col: ids[top],
                            "sim": sims[top, j],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    from mtg_vector_db_spark.session import widen

    partial = widen(emb.select(id_col, emb_col)).mapInPandas(
        part, schema=f"query_id long, {id_col} long, sim double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


RP_SEED = 7
# 8 tables clears recall@10 = 0.96 at sf0.1 on the adversarially
# unclustered synthetic corpus (4 tables scored 0.77) — the round-3
# sweep toward the reference HNSW bar (m=16/ef=64, typically >=0.95);
# see RECALL.md for the full (n_tables, bucket_length) recall/candidate
# trade table. Map-side cost is linear in n_tables (plane literals).
RP_TABLES = 8
RP_BUCKET_LENGTH = 1.0


def rp_planes(
    dim: int, n_tables: int = RP_TABLES, seed: int = RP_SEED
) -> list[list[float]]:
    """Deterministic Gaussian projection planes (one per hash table).
    ``RandomState`` is stream-stable across platforms, so the planes are a
    pure function of (dim, n_tables, seed) — both the Spark plan and a SQL
    oracle can embed the identical literals."""
    rng = np.random.RandomState(seed)
    return [[float(v) for v in row] for row in rng.standard_normal((n_tables, dim))]


def _seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Sequential float64 dot — bit-identical to the Catalyst fold in
    functions/vector.py:dot and to a SQL engine's sequential inner
    product, so driver-side bucket ids agree with both."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def round_half_up(x: float, digits: int) -> float:
    """Driver-side twin of Spark's ``F.round``: HALF_UP (away from zero
    on ties) applied to the shortest round-trip decimal representation —
    ``java.math.BigDecimal.valueOf(double).setScale(d, HALF_UP)``
    semantics. Python ``repr(float)`` emits the shortest round-trip
    decimal; Java ``Double.toString`` is only guaranteed to do the same
    on JDK >= 19 (JDK-4511638 — older JVMs can emit non-minimal digits,
    so the exact digit-9 tie cases this helper exists to fix could
    still diverge there; round-7 ADVICE). This repo pins Java 17+ in
    practice but the equivalence is TEST-pinned, not assumed:
    tests/test_ivf_strategy.py:test_round_half_up_matches_spark_round_exactly
    drives the tie cases through a real Spark expression, so a JVM whose
    Double.toString disagrees fails loudly there instead of silently
    mis-bucketing. Python's
    built-in ``round()`` is HALF_EVEN (banker's): a dot/L value landing
    exactly on a .5 tie at the target digit would bucket a query into a
    different LSH row than the Spark-built artifact holds, silently
    dropping that table's candidates (round-6 ADVICE). Every driver-side
    bucket-id computation must use this, never ``round()``."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal(1).scaleb(-digits),
            rounding=decimal.ROUND_HALF_UP,
        )
    )


def rp_lsh_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int,
    n_tables: int = RP_TABLES,
    bucket_length: float = RP_BUCKET_LENGTH,
    seed: int = RP_SEED,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic random-projection LSH top-k (E2LSH scheme on the unit
    sphere): bucket ``w`` of a vector is ``floor(round(<x̂, plane_w>/L, 9))``;
    candidates match the query's bucket in ANY of the ``n_tables`` tables;
    survivors get an exact-cosine rescore to the final top-k.

    This is the oracle-able sibling of the MLlib BRP-LSH path
    (:func:`lsh_index`): same bucketed-candidate structure, but the planes
    are seeded literals instead of a fitted model's private state, so a SQL
    engine replays bucketing, candidate union, and rescore exactly. The
    9-digit rounding before ``floor`` pins the bucket id against last-ulp
    float divergence between engines. At scale the candidate filter is a
    map-side scan (no shuffle, no model broadcast beyond n_tables×dim
    literals); persisting ``(table, bucket)`` as partition keys turns it
    into a partition-pruned read. Tune recall/selectivity with
    ``bucket_length`` (narrower = fewer candidates) and ``n_tables``.
    Replaces the reference's HNSW query path (db/init.sql:50-53) as the
    indexed approximate route.
    """
    import math as _math

    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity,
        dot,
        l2_normalize,
    )

    planes = rp_planes(len(query_vec), n_tables, seed)
    q = [float(x) for x in query_vec]
    qn_norm = _math.sqrt(_seq_dot(q, q))
    qn = [x / qn_norm for x in q]
    q_buckets = [
        int(_math.floor(round_half_up(_seq_dot(qn, p) / bucket_length, 9)))
        for p in planes
    ]

    planes_lit = F.array(
        *[F.array(*[F.lit(v) for v in p]) for p in planes]
    )
    qb_lit = F.array(*[F.lit(b).cast("long") for b in q_buckets])
    nx = l2_normalize(F.col(emb_col))
    # ONE nested HOF (not sibling lambda columns — see the corruption note
    # on binary_signature): any-table bucket match.
    hit = F.exists(
        F.sequence(F.lit(1), F.lit(n_tables)),
        lambda w: F.floor(
            F.round(
                dot(F.element_at(planes_lit, w.cast("int")), nx)
                / F.lit(bucket_length),
                9,
            )
        ).cast("long")
        == F.element_at(qb_lit, w.cast("int")),
    )
    sim = F.round(cosine_similarity(F.col(emb_col), q), round_digits)
    return (
        emb.filter(hit)
        .select(F.col(id_col).alias("doc_id"), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )


def knn_numpy_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: int | None = None,
) -> DataFrame:
    """:func:`knn_numpy` with the query set flowing through the PLAN
    instead of a driver-side matrix: the query table is collapsed to one
    ``collect_list`` row and broadcast-nested-loop-joined onto every
    corpus partition, so the registry query contains no ``collect()`` and
    the same plan serves a query table read from disk. Physical strategy
    is unchanged — per-partition numpy GEMM with a rounded (sim DESC, id
    ASC) tie-break, then a tiny global top-k reduce."""
    qagg = queries.agg(
        F.collect_list(F.struct(query_id_col, query_vec_col)).alias("_qs")
    )

    def part(it):
        qids = qn = None
        for pdf in it:
            if not len(pdf):
                continue
            if qn is None:
                qs = pdf["_qs"].iloc[0]
                qids = np.array([q[query_id_col] for q in qs])
                qm = np.array(
                    [q[query_vec_col] for q in qs], dtype=np.float64
                )
                qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
            m = np.array(list(pdf[emb_col]), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qn.T
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            kk = min(k, sims.shape[0])
            ids = pdf[id_col].to_numpy()
            frames = []
            for j in range(qn.shape[0]):
                top = np.lexsort((ids, -sims[:, j]))[:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[j],
                            id_col: ids[top],
                            "sim": sims[top, j],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    from mtg_vector_db_spark.session import widen

    joined = widen(emb.select(id_col, emb_col)).join(F.broadcast(qagg))
    partial = joined.mapInPandas(
        part, schema=f"query_id long, {id_col} long, sim double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_index(emb: DataFrame, emb_col: str = "embedding",
              bucket_length: float = 2.0, num_tables: int = 3):
    """MLlib BucketedRandomProjectionLSH model + transformed (bucketed)
    corpus over L2-normalized vectors. Persisting the transformed DataFrame
    is the reference's "HNSW index build" analog as a batch artifact."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from mtg_vector_db_spark.functions.vector import l2_normalize

    feats = emb.withColumn(
        "features", array_to_vector(l2_normalize(F.col(emb_col)))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=42,
    )
    model = lsh.fit(feats)
    return model, model.transform(feats)


def lsh_query(model, indexed: DataFrame, query_vec: Sequence[float], k: int):
    """approxNearestNeighbors over the persisted LSH index."""
    from pyspark.ml.linalg import Vectors

    q = np.asarray(list(query_vec), dtype=np.float64)
    q = q / np.linalg.norm(q)
    return model.approxNearestNeighbors(indexed, Vectors.dense(q), k)


def kmeans_ivf_build(
    emb: DataFrame,
    n_cells: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 20,
):
    """Train the IVF coarse quantizer with MLlib KMeans and assign every
    vector to its cell — the full "batch vector index build" (BASELINE.json
    north star): fit on a sample-sized corpus, transform the whole table,
    then :func:`mtg_vector_db_spark.operators.partitioning.partition_by_cell`
    writes the assigned corpus as the on-disk index.

    Returns (centroids DataFrame (cell, centroid array<double>),
    assigned DataFrame (input cols + cell)).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from mtg_vector_db_spark.functions.vector import l2_normalize

    feats = emb.withColumn(
        "features", array_to_vector(l2_normalize(F.col(emb_col)))
    )
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="features")
    model = km.fit(feats)
    assigned = (
        model.transform(feats)
        .withColumnRenamed("prediction", "cell")
        .drop("features")
    )
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return centroids, assigned


def lloyd_ivf_build(
    emb: DataFrame,
    n_cells: int = 8,
    n_iter: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
):
    """Deterministic k-means (Lloyd) IVF build as pure DataFrame ops — the
    oracle-able sibling of :func:`kmeans_ivf_build` (MLlib): init centroids
    are the ``n_cells`` lowest-id normalized vectors (the p17 freeze
    pattern), each iteration is one argmin assignment over centroid
    literals (map-side, no shuffle) plus one narrow (cell, pos) mean
    shuffle, and every float that feeds a comparison is rounded to
    ``round_digits`` — distances before argmin, centroid means after
    averaging — so a SQL engine unrolling the same iterations replays the
    build bit-for-bit. Per iteration the corpus is re-scanned (standard
    Lloyd); the collected state is n_cells×dim doubles, broadcast back as
    literals.

    Returns (centroids DataFrame (cell, centroid array<double>),
    assignment DataFrame (id_col, cell)).
    """
    from mtg_vector_db_spark.functions.vector import l2_normalize

    nxdf = emb.select(F.col(id_col), l2_normalize(F.col(emb_col)).alias("_nx"))
    seed_rows = (
        nxdf.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).cast("int").alias("cell"), "_nx")
        .collect()
    )
    cents: dict[int, list[float]] = {
        r["cell"]: [float(x) for x in r["_nx"]] for r in seed_rows
    }

    def assign(c: dict[int, list[float]]) -> DataFrame:
        cent_lit = F.array(
            *[
                F.struct(
                    F.lit(cell).alias("cell"),
                    F.array(*[F.lit(v) for v in vec]).alias("c"),
                    F.lit(float(_seq_dot(vec, vec))).alias("n2"),
                )
                for cell, vec in sorted(c.items())
            ]
        )
        from mtg_vector_db_spark.functions.vector import dot

        scored = F.transform(
            cent_lit,
            lambda ce: F.struct(
                F.round(
                    ce["n2"] - 2.0 * dot(ce["c"], F.col("_nx")), round_digits
                ).alias("dist"),
                ce["cell"].alias("cell"),
            ),
        )
        return nxdf.withColumn("cell", F.array_min(scored)["cell"])

    for _ in range(n_iter):
        assigned = assign(cents)
        means = (
            assigned.select("cell", F.posexplode("_nx").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), round_digits).alias("c"))
        )
        rows = (
            means.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("centroid")
            )
            .collect()
        )
        # cells that lost every member keep their previous centroid
        for r in rows:
            cents[r["cell"]] = [float(x) for x in r["centroid"]]

    final = assign(cents).select(id_col, "cell")
    centroids_df = emb.sparkSession.createDataFrame(
        sorted(cents.items()), "cell int, centroid array<double>"
    )
    return centroids_df, final


def dynamic_seed_cells(
    emb: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    target_per_cell: int = 250,
    min_cells: int = 8,
) -> DataFrame:
    """Seed-centroid table whose size GROWS WITH THE CORPUS:
    ``k = greatest(min_cells, ceil(n / target_per_cell))`` lowest-id
    vectors become the frozen cells (the d06/p17 seeding rule).

    Why dynamic: IVF-blocked similarity self-joins generate Σ_cell
    |cell|² candidate pairs. A FIXED cell count makes that quadratic in
    the corpus (measured: the 8-cell d06 shape went >600 s at sf1 while
    the cells-∝-n shape stayed linear — SCALE.md "sf1 step"). Growing k
    with n keeps per-cell population near ``target_per_cell``, so pairs
    ∝ n·target and the blocking stays scale-safe without retuning.

    The count enters the plan as a 1-row broadcast (scalar fold), so
    the seed derivation itself is lazy; downstream ``ivf_assign`` /
    ``ivf_multi_assign`` fold the k-row result to a centroid literal
    while k ≤ IVF_LITERAL_MAX_CELLS (the documented bounded collect in
    ``_with_scored_cells``) and to a one-row broadcast beyond — the two
    scale rules (cell population ∝ target, cell count ∝ n) no longer
    collide at high cardinality. The SQL
    oracle replays the sizing as a scalar subquery:
    ``WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / 250.0)
    AS INT)) FROM embeddings)``.
    """
    k = (
        emb.agg(
            F.greatest(
                F.lit(min_cells),
                F.ceil(F.count(F.lit(1)) / F.lit(float(target_per_cell))),
            )
            .cast("int")
            .alias("_k")
        )
    )
    return (
        emb.crossJoin(F.broadcast(k))
        .filter(F.col(id_col) < F.col("_k"))
        .select(
            F.col(id_col).cast("int").alias("cell"),
            F.transform(emb_col, lambda x: x.cast("double")).alias(
                "centroid"
            ),
        )
    )


# Above this many cells the frozen-centroid table stops being a plan
# literal: the engine's own cells-∝-n rules (dynamic_seed_cells,
# dynamic_bucket_count) grow cell COUNT with the corpus, so an O(cells)
# driver collect + task-serialized literal is exactly the class of bound
# this engine exists to eliminate (round-5 VERDICT #1 — the reference's
# Postgres never ships its index to the client, init.sql:50-53). Past the
# threshold the same scoring kernel runs against a 1-row broadcast fold
# of the centroid table — JVM-side, no driver round-trip, no plan bloat.
#
# 64 is measured, not guessed (SCALE.md "centroid-cardinality" table,
# 20k vectors × dim 16, local[8]): the literal's Catalyst analysis cost
# grows superlinearly in cell count — at 64 cells broadcast already wins
# 2.7× end-to-end (0.85 s vs 2.34 s), at 1024 cells 3.4× (8.9 s vs
# 30.7 s), and at 10⁴ cells the literal is non-viable (146 s of driver
# plan construction + a 3.4 MB task-serialized plan vs 0.2 s / 3 KB).
# Below 64 the two are at parity (k=8: 0.76 s vs 1.01 s), so the
# threshold keeps every committed small-k query plan join-free (the
# d06 no-BNLJ plan-hygiene assertion) while everything larger takes the
# fast path automatically.
#
# Round 8: threshold 64 → 32 (the broadcast fold measured faster for
# 64-cell codebooks). Round-8 VERDICT #1 suspected that change of
# regressing p49/p53 (both slower in the builder-close and driver runs)
# and prescribed reverting to 64; round 9 ran the prescribed quiet-host
# A/B (VERDICT's own done-criteria) and the revert LOST composed into
# every 64-cell consumer: p52 4.51 s (broadcast) vs 6.51 s (literal),
# p53 2.72 s vs 3.34 s, p49 flat at 2.92 s (its codebook is
# dynamic_seed_cells → only 8 cells at sf0.1, so the threshold never
# touched it and the round-8 attribution was wrong). The literal loses
# at 64 cells because a 64×64-dim literal is ~4k F.lit doubles of
# Catalyst analysis + task-serialized plan PER EXECUTION — the same
# superlinear plan cost the SCALE.md centroid-cardinality table
# documents (2.34 s vs 0.85 s end-to-end at k=64). p53's quiet-host
# 2.72 s is ≤ the VERDICT's 3.1 s done-bar ALREADY at 32 — the r08
# driver-run regression readings were host state (msi 1.216/1.975),
# like every other flagged-then-dissolved regression this round. 32
# stays. Strategies remain pinned bit-equal (test_ivf_strategy).
IVF_LITERAL_MAX_CELLS = 32


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    emb_col: str = "embedding",
    cluster_col: str = "cell",
    centroid_col: str = "centroid",
    strategy: str = "auto",
) -> DataFrame:
    """Assign vectors to FROZEN IVF cells — the incremental-index-maintenance
    step: new vectors joining a built index (kmeans_ivf_build) get cells
    WITHOUT refitting the quantizer (the standard IVF serving recipe; refit
    is a periodic batch job, not a per-arrival one).

    Same rule as MLlib KMeans.transform: argmin squared-L2 distance over
    L2-normalized input, computed as ``‖c‖² − 2·(x̂·c)`` (the ‖x̂‖²=1 term
    is constant). Map-side only, no shuffle, no Python: exactly what a
    100 TB/day stream needs. Physical strategy per ``strategy``
    (:func:`_with_scored_cells`): ≤ ``IVF_LITERAL_MAX_CELLS`` cells fold
    to a plan literal, beyond that the centroid table rides a one-row
    broadcast — identical math either way (test-pinned).

    The whole scored array is ONE nested transform (not n_cells sibling
    lambda columns — see operators/dedup.py:minhash_signature for the
    sibling-HOF corruption this avoids); argmin is array_min over
    (dist, cell) structs, tie-broken on cell id.
    """
    scored = _with_scored_cells(
        emb, centroids, emb_col, cluster_col, centroid_col, strategy
    )
    return (
        scored.withColumn(cluster_col, F.array_min(F.col("_scored"))["cell"])
        .drop("_nx", "_scored")
    )


def _score_cells_expr(cents: Column) -> Column:
    """``array<struct<dist, cell>>`` of centroid distances to the row's
    ``_nx`` (pre-normalized vector) column, given an
    ``array<struct<cell, c, n2>>`` centroid column — the shared kernel of
    :func:`ivf_assign` (argmin) and :func:`ivf_multi_assign` (top-nprobe),
    identical whether ``cents`` is a plan literal or a broadcast-joined
    fold. Struct field order makes array_min/array_sort compare
    (dist, cell): the same ``ORDER BY dist, cell`` tie-break a SQL replay
    uses."""
    from mtg_vector_db_spark.functions.vector import dot

    return F.transform(
        cents,
        lambda ce: F.struct(
            (ce["n2"] - 2.0 * dot(ce["c"], F.col("_nx"))).alias("dist"),
            ce["cell"].alias("cell"),
        ),
    )


def _cents_literal(rows: list) -> Column:
    """Literal ``array<struct<cell, c, n2>>`` from collected centroid rows
    (cell, centroid) — the ≤2048-cell strategy. n2 = Σx² is precomputed
    driver-side with the same left-to-right float64 fold the broadcast
    twin runs JVM-side, so the two strategies are bit-equal."""
    if not rows:
        # Typed empty literal: an untyped F.array() can't host the struct
        # field extraction downstream, and an empty centroid table (index
        # not built yet / empty micro-batch) must mean "no assignments",
        # not a plan-time AnalysisException.
        return F.array().cast(
            "array<struct<cell:int,c:array<double>,n2:double>>"
        )
    return F.array(
        *[
            F.struct(
                F.lit(r[0]).alias("cell"),
                F.array(*[F.lit(float(x)) for x in r[1]]).alias("c"),
                F.lit(float(_seq_sumsq(r[1]))).alias("n2"),
            )
            for r in rows
        ]
    )


def _seq_sumsq(xs) -> float:
    """Left-to-right Σx² — kept as an explicit sequential loop so the
    driver-side literal precompute provably matches the JVM fold's
    association order (float addition is not associative)."""
    acc = 0.0
    for x in xs:
        acc += float(x) * float(x)
    return acc


def _cents_folded(
    centroids: DataFrame, cluster_col: str, centroid_col: str
) -> DataFrame:
    """One-row DataFrame folding the centroid table into a ``_cents``
    ``array<struct<cell, c, n2>>`` column — the >2048-cell strategy: the
    fold is a JVM aggregation, the row broadcasts to every task, and the
    query plan stays O(1) in cell count (no driver collect, no literal).
    n2 rides the same sequential left-fold as the literal twin."""
    return centroids.agg(
        F.collect_list(
            F.struct(
                F.col(cluster_col).alias("cell"),
                F.transform(
                    centroid_col, lambda x: x.cast("double")
                ).alias("c"),
                F.aggregate(
                    F.transform(centroid_col, lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                ).alias("n2"),
            )
        ).alias("_cents")
    )


def _with_scored_cells(
    emb: DataFrame,
    centroids: DataFrame,
    emb_col: str,
    cluster_col: str,
    centroid_col: str,
    strategy: str = "auto",
) -> DataFrame:
    """``emb`` + ``_nx`` (normalized vector) + ``_scored``
    (array<struct<dist, cell>>) under the chosen physical strategy:

    * ``"literal"`` — collect the centroid table, embed it as a plan
      literal (bounded-collect class; cheapest per-task at small k).
    * ``"broadcast"`` — fold the table to ONE row JVM-side and broadcast
      it (BroadcastNestedLoopJoin with a 1-row build side — there is no
      equi-key, so BNLJ *is* the broadcast hash join of this shape); the
      driver never sees a centroid and the serialized plan is O(1).
    * ``"auto"`` — collect at most ``IVF_LITERAL_MAX_CELLS + 1`` rows in
      ONE job; if the table fits, reuse exactly those rows as the
      literal (no second job), else fall back to broadcast.

    ``$SPARK_GRAFT_IVF_STRATEGY`` overrides ``"auto"`` only — a test
    hook to drive every registered IVF query through the broadcast path
    without touching query code; an explicit caller choice still wins.
    Both strategies share :func:`_score_cells_expr` and the same
    (dist, cell) tie-break, and are pinned bit-equal in
    tests/test_ivf_strategy.py."""
    import os

    from mtg_vector_db_spark.functions.vector import l2_normalize

    if strategy == "auto":
        strategy = os.environ.get("SPARK_GRAFT_IVF_STRATEGY", "auto")
    if strategy not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown ivf assignment strategy: {strategy!r}")

    base = emb.withColumn("_nx", l2_normalize(F.col(emb_col)))
    if strategy != "broadcast":
        sel = centroids.select(cluster_col, centroid_col)
        if strategy == "auto":
            sel = sel.limit(IVF_LITERAL_MAX_CELLS + 1)
        rows = sorted(sel.collect(), key=lambda r: r[0])
        if strategy == "literal" or len(rows) <= IVF_LITERAL_MAX_CELLS:
            return base.withColumn(
                "_scored", _score_cells_expr(_cents_literal(rows))
            )
    folded = _cents_folded(centroids, cluster_col, centroid_col)
    return (
        base.crossJoin(F.broadcast(folded))
        .withColumn("_scored", _score_cells_expr(F.col("_cents")))
        .drop("_cents")
    )


# two_level_assign ships the centroid table to the probe side sharded
# one row per super-cell. Below this payload bound the shards ride an
# explicit broadcast (every executor holds the whole codebook once —
# fine up to a few hundred MB, and it keeps the join shuffle-free);
# above it the explicit hint would FORBID AQE from ever choosing a
# shuffle join, so the table is replicated O(executors) at ~2 GB for the
# 4M×64-d extreme case (round-6 VERDICT #1). The auto switch estimates
# payload as k_cells × (8·dim + TWO_LEVEL_MEMBER_ROW_OVERHEAD) bytes
# (cell id + n2 + struct framing around the double array) and flips to a
# SHUFFLE_HASH join on super_col — the probed rows are already keyed by
# it, so neither driver, plan, nor per-executor memory grows with total
# cell count. $SPARK_GRAFT_TWO_LEVEL_BROADCAST_MAX_BYTES overrides the
# bound; $SPARK_GRAFT_TWO_LEVEL_MEMBERS_STRATEGY overrides "auto" only
# (the $SPARK_GRAFT_IVF_STRATEGY test-hook discipline). Both paths are
# pinned bit-equal in tests/test_two_level_strategy.py.
#
# The shuffle path is SALTED (round-7): probe keys are skewed by nature
# — vectors probe their NEAREST supers, so a corpus's hot semantic
# region concentrates probe rows on few super keys (measured: a
# periodic fixture sent 70% of all probes to 3 of 317 supers and
# serialized the join onto one core; even a hash-random fixture puts
# 7.6% on the hottest key vs 0.3% uniform). AQE's skew split keys on
# partition BYTES and the probe rows are small — the cost is per-row
# member scoring — so it recovers little (measured 296 → 278 s). The
# remedy is the salted-join recipe (operators/partitioning.py): member
# shards replicate ×TWO_LEVEL_SHUFFLE_SALT (bounded, shuffled once,
# distributed — never per-executor), probe rows pick a deterministic
# xxhash64 salt, and the join runs on (super, salt) so a hot super's
# scoring spreads over SALT reducers. Matched pairs are identical by
# construction (every probe row meets exactly its super's one shard
# copy per salt value) — pinned bit-equal in the tests.
TWO_LEVEL_BROADCAST_MAX_BYTES = 256 * 1024 * 1024
TWO_LEVEL_MEMBER_ROW_OVERHEAD = 32
TWO_LEVEL_SHUFFLE_SALT = 8


def _int_max_literal(dt) -> Column:
    """Maximal literal of an integral Spark type, cast type-stable —
    sentinel for 'memberless probed super' orderings (round-6 ADVICE:
    a bare int-literal sentinel under a bigint cell column relied on
    implicit struct coercion and stopped dominating ids above 2³¹)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    maxes = {
        ByteType: 127,
        ShortType: 32767,
        IntegerType: 2147483647,
        LongType: 9223372036854775807,
    }
    return F.lit(maxes.get(type(dt), 2147483647)).cast(dt)


def two_level_assign(
    emb: DataFrame,
    centroids: DataFrame,
    n_super: int | None = None,
    emb_col: str = "embedding",
    cluster_col: str = "cell",
    centroid_col: str = "centroid",
    super_col: str = "super_cell",
    n_probe_super: int = 1,
    id_col: str = "vec_id",
    members_strategy: str = "auto",
    super_strategy: str = "lowest_id",
    supers: DataFrame | None = None,
) -> DataFrame:
    """Two-level coarse quantization (the IMI / coarse-then-fine recipe)
    — the extreme-cardinality path past even the broadcast fold: at ~4M
    × 64-d centroids the single fold row is ~2 GB (SCALE.md residual
    bound). Here the level-1 codebook is the ``n_super`` LOWEST-ID
    centroids (the dynamic_seed_cells lowest-id discipline —
    deterministic, SQL-replayable; default ⌈√k⌉ via one bounded count),
    every centroid is assigned to its nearest super-cell once, and a
    vector then scores O(√k) supers map-side plus the chosen super's
    member list — delivered per row through a HASH JOIN on ``super_col``
    (broadcast below ``TWO_LEVEL_BROADCAST_MAX_BYTES`` of codebook
    payload, shuffle-hash above — see ``members_strategy``), so the full
    centroid table reaches tasks SHARDED one row per super-cell instead
    of as one giant array, and above the bound no executor holds more
    than its partitions' shards. Work per vector drops from O(k) to
    O(√k + |members|), and no single row exceeds its super-cell's
    membership.

    Semantics: nearest cell WITHIN the ``n_probe_super`` nearest
    super-cells — the standard two-level approximation, NOT always the
    global argmin (agreement with flat assignment is the p49 oracle's
    own output; raising ``n_probe_super`` buys agreement back at
    O(probe·√k) cost, the IVF-nprobe recipe one level up — measured
    0.38 → 0.56 → 0.74 → 0.89 at probes 1/2/4/8 on the 10⁴-cell
    weak-cluster synthetic, SCALE.md). A vector whose probed super-cells
    attracted
    no members keeps its row with a NULL ``cluster_col`` (left join —
    assignment never drops rows). Same scoring kernel, same
    (dist, cell) tie-break at both levels as :func:`ivf_assign`.

    ``members_strategy``: ``"broadcast"`` | ``"shuffle"`` | ``"auto"``
    (default) — how the per-super member shards reach the probed rows.
    Auto broadcasts below ``TWO_LEVEL_BROADCAST_MAX_BYTES`` of estimated
    codebook payload and shuffle-hash-joins on ``super_col`` above it,
    so the TOTAL broadcast never grows O(cells) (round-6 VERDICT #1);
    answers are identical either way (test-pinned).

    ``super_strategy``: ``"lowest_id"`` (default — the deterministic,
    SQL-replayable form every oracle uses) | ``"trained"`` (round-8
    VERDICT #3 — the level-1 codebook is kmeans-trained over the
    CENTROID table, :func:`kmeans_ivf_build` with k = n_super). Trained
    supers attack member-shard imbalance at its cause: lowest-id supers
    are arbitrary points, so one super can attract a large share of
    centroids AND of probe traffic (the hot-shard floor of the salted
    join, SCALE.md round-7); balanced supers shrink the hot shard's
    width structurally where salting only spreads it. Not
    SQL-replayable (MLlib kmeans), hence never the oracle default.

    Shuffle-path salting (round-8 VERDICT #4): by default the salt is
    AUTO-SIZED from a probe-share diagnosis — one extra map-side
    aggregate over the probe assignment (≤ n_super result rows) bounds
    each super's share of probe rows, and each super gets its own salt
    ``clamp(ceil(share · parallelism), 1, parallelism)`` (the
    partitioning.py split-hot-keys recipe: hot supers split across
    their fair share of reducer slots, cold supers pay no replication).
    ``$SPARK_GRAFT_TWO_LEVEL_SHUFFLE_SALT=<int>`` forces the round-7
    uniform static salt and skips the diagnosis pass. Matched pairs are
    identical under any salting (the salt only augments the join key),
    so answers are pinned bit-equal across static/auto/broadcast."""
    import math
    import os

    # One bounded job over the centroid table (never the corpus) gets
    # both the cardinality (for n_super) and the dimensionality (for the
    # auto payload estimate).
    stats = centroids.agg(
        F.count(F.lit(1)).alias("k"),
        F.max(F.size(centroid_col)).alias("dim"),
    ).first()
    k = stats["k"]
    dim = stats["dim"] or 0
    if n_super is None:
        n_super = max(1, math.ceil(math.sqrt(k)))
    if members_strategy == "auto":
        members_strategy = os.environ.get(
            "SPARK_GRAFT_TWO_LEVEL_MEMBERS_STRATEGY", "auto"
        )
    if members_strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(
            f"unknown two-level members strategy: {members_strategy!r}"
        )
    if members_strategy == "auto":
        max_bytes = int(
            os.environ.get(
                "SPARK_GRAFT_TWO_LEVEL_BROADCAST_MAX_BYTES",
                TWO_LEVEL_BROADCAST_MAX_BYTES,
            )
        )
        payload = k * (8 * dim + TWO_LEVEL_MEMBER_ROW_OVERHEAD)
        members_strategy = (
            "broadcast" if payload <= max_bytes else "shuffle"
        )
    cent_emb = centroids.select(
        F.col(cluster_col).alias("vec_id"),
        F.col(centroid_col).alias("embedding"),
    )
    if supers is not None:
        # Precomputed level-1 codebook (the build-once/serve-many face:
        # train or select once, assign many batches against the frozen
        # supers — also the only way a 'trained' codebook is stable
        # across calls, since kmeans float reduce order is not).
        supers = supers.select(
            F.col(super_col), F.col(centroid_col).alias("centroid")
        )
    elif super_strategy == "lowest_id":
        supers = (
            centroids.orderBy(cluster_col)
            .limit(n_super)
            .select(
                F.col(cluster_col).alias(super_col),
                F.col(centroid_col).alias("centroid"),
            )
        )
    elif super_strategy == "trained":
        # kmeans over the CENTROID table (k rows, never the corpus):
        # super ids are 0..n_super-1 cluster indices. Balanced supers
        # shrink the hottest member shard structurally — see docstring.
        sup_cents, _ = kmeans_ivf_build(cent_emb, n_cells=n_super)
        supers = sup_cents.select(
            F.col("cell").alias(super_col), F.col("centroid")
        )
    else:
        raise ValueError(f"unknown super strategy: {super_strategy!r}")
    cent_sup = ivf_assign(
        cent_emb, supers, cluster_col=super_col, centroid_col="centroid"
    )
    members = cent_sup.groupBy(super_col).agg(
        F.collect_list(
            F.struct(
                F.col("vec_id").alias("cell"),
                F.transform(
                    "embedding", lambda x: x.cast("double")
                ).alias("c"),
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                ).alias("n2"),
            )
        ).alias("_cents")
    )
    # The shards reach the probed rows either replicated (broadcast hash
    # join — zero shuffle, right while the whole codebook is small) or
    # co-partitioned on (super_col, salt) (salted shuffle hash join —
    # the probe side shuffles n·probe rows once, the codebook shuffles
    # salt·k rows once, no executor ever holds more than its partitions'
    # shards, and a hot super's per-row member scoring spreads over salt
    # reducers — see the TWO_LEVEL_SHUFFLE_SALT note above).
    if members_strategy == "broadcast":
        members_side = F.broadcast(members)
        join_keys = [super_col]

        def salt_probe(df: DataFrame) -> DataFrame:
            return df
    else:
        salt_env = os.environ.get(
            "SPARK_GRAFT_TWO_LEVEL_SHUFFLE_SALT", "auto"
        )
        join_keys = [super_col, "_salt"]
        if salt_env != "auto":
            # Round-7 uniform static salt: every shard replicated
            # ×salt_n, no diagnosis pass.
            salt_n = int(salt_env)
            members_side = members.withColumn(
                "_salt",
                F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))),
            ).hint("shuffle_hash")

            def salt_probe(df: DataFrame) -> DataFrame:
                # Deterministic per-row salt (xxhash64 — replay-
                # stable): every probe row meets exactly its super's
                # one shard copy per salt value, so matched pairs are
                # identical to the unsalted join.
                return df.withColumn(
                    "_salt",
                    F.pmod(
                        F.xxhash64(F.col(id_col)), F.lit(salt_n)
                    ).cast("int"),
                )
        else:
            # Auto salt (round-8 VERDICT #4): size each super's salt
            # from its measured share of probe rows. One extra map-side
            # aggregate over the probe assignment — ≤ n_super result
            # rows, broadcast back to both join sides.
            s1d = _with_scored_cells(
                emb, supers, emb_col, super_col, "centroid", "auto"
            )
            if n_probe_super <= 1:
                targets = s1d.select(
                    F.array_min(F.col("_scored"))["cell"].alias(super_col)
                )
            else:
                targets = s1d.select(
                    F.explode(
                        F.transform(
                            F.slice(
                                F.array_sort(F.col("_scored")),
                                1,
                                n_probe_super,
                            ),
                            lambda s: s["cell"],
                        )
                    ).alias(super_col)
                )
            par = emb.sparkSession.sparkContext.defaultParallelism
            counts = targets.groupBy(super_col).agg(
                F.count(F.lit(1)).alias("_cnt")
            )
            tot = counts.agg(F.sum("_cnt").alias("_tot"))
            salts = (
                counts.crossJoin(F.broadcast(tot))
                .select(
                    super_col,
                    F.least(
                        F.greatest(
                            F.ceil(
                                F.col("_cnt")
                                * F.lit(par)
                                / F.col("_tot")
                            ),
                            F.lit(1),
                        ),
                        F.lit(par),
                    ).cast("int").alias("_salt_n"),
                )
            )
            members_side = (
                members.join(F.broadcast(salts), super_col, "left")
                .withColumn(
                    "_salt",
                    F.explode(
                        F.sequence(
                            F.lit(0),
                            F.coalesce(F.col("_salt_n"), F.lit(1)) - 1,
                        )
                    ),
                )
                .drop("_salt_n")
                .hint("shuffle_hash")
            )

            def salt_probe(df: DataFrame) -> DataFrame:
                # Per-super modulus: a probe row picks a salt in
                # [0, salt_n(super)) — it meets exactly one of its
                # super's salt_n shard copies, so matched pairs equal
                # the unsalted join's for ANY salt table.
                return (
                    df.join(F.broadcast(salts), super_col, "left")
                    .withColumn(
                        "_salt",
                        F.pmod(
                            F.xxhash64(F.col(id_col)),
                            F.coalesce(F.col("_salt_n"), F.lit(1)),
                        ).cast("int"),
                    )
                    .drop("_salt_n")
                )

    s1 = _with_scored_cells(
        emb, supers, emb_col, super_col, "centroid", "auto"
    )
    if n_probe_super <= 1:
        s1 = s1.withColumn(
            super_col, F.array_min(F.col("_scored"))["cell"]
        ).drop("_scored")
        return (
            salt_probe(s1).join(members_side, join_keys, "left")
            .withColumn(
                cluster_col,
                F.array_min(_score_cells_expr(F.col("_cents")))["cell"],
            )
            .drop("_nx", "_cents", "_salt")
        )
    # Multi-probe: explode the top-probe supers (n·probe rows), join each
    # to its member shard, take the per-row best (dist, cell), then ONE
    # map-side-combinable min_by per vector (keyed on ``id_col``) —
    # probe is small, so the shuffle carries n rows after partial
    # aggregation. Null-safe ordering: a memberless probed super scores
    # +inf, so it can only win when EVERY probed super is memberless
    # (then the cell stays NULL, matching the single-probe semantics).
    orig_cols = [c for c in emb.columns]
    # Sentinel cell typed to the members' cell dtype (the centroid
    # table's cluster column) so the coalesced struct is type-stable and
    # the sentinel dominates every real id (round-6 ADVICE).
    inf_ord = F.struct(
        F.lit(float("inf")).alias("dist"),
        _int_max_literal(centroids.schema[cluster_col].dataType).alias(
            "cell"
        ),
    )
    probed = (
        salt_probe(
            s1.withColumn(
                super_col,
                F.explode(
                    F.transform(
                        F.slice(
                            F.array_sort(F.col("_scored")),
                            1,
                            n_probe_super,
                        ),
                        lambda s: s["cell"],
                    )
                ),
            )
        )
        .drop("_scored")
        .join(members_side, join_keys, "left")
        .withColumn(
            "_best", F.array_min(_score_cells_expr(F.col("_cents")))
        )
        .withColumn("_ord", F.coalesce(F.col("_best"), inf_ord))
        .drop("_cents")
    )
    key = F.struct(F.col("_ord"), F.col(super_col))
    best = probed.groupBy(id_col).agg(
        F.min_by(F.col("_best"), key).alias("_b"),
        F.min_by(
            F.struct(*[c for c in orig_cols if c != id_col]), key
        ).alias("_row"),
        F.min_by(F.col(super_col), key).alias("_sup"),
    )
    return best.select(
        id_col,
        "_row.*",
        F.col("_sup").alias(super_col),
        F.col("_b")["cell"].alias(cluster_col),
    )


def ivf_multi_assign(
    emb: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    emb_col: str = "embedding",
    cluster_col: str = "cell",
    centroid_col: str = "centroid",
    strategy: str = "auto",
) -> DataFrame:
    """Soft IVF assignment: each vector lands in its ``nprobe`` nearest
    frozen cells (rows multiply by nprobe) — the blocking generator for
    similarity self-joins (dedup d06): pairs sharing ANY cell become
    candidates, so recall grows with nprobe while candidate volume stays
    Σ_cell |cell|² — never O(n²). Same argmin arithmetic, (dist, cell)
    tie-break, and literal/broadcast strategy switch as
    :func:`ivf_assign`, so a SQL oracle replays it with
    ``row_number() OVER (ORDER BY dist, cell) <= nprobe``."""
    scored = _with_scored_cells(
        emb, centroids, emb_col, cluster_col, centroid_col, strategy
    )
    cells = F.transform(
        F.slice(F.array_sort(F.col("_scored")), 1, nprobe),
        lambda s: s["cell"],
    )
    return (
        scored.withColumn(cluster_col, F.explode(cells))
        .drop("_nx", "_scored")
    )


def ivf_ranked_assign(
    emb: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    emb_col: str = "embedding",
    cluster_col: str = "cell",
    centroid_col: str = "centroid",
    rank_col: str = "cell_rank",
    strategy: str = "auto",
) -> DataFrame:
    """:func:`ivf_multi_assign` with the probe ORDER kept: each vector
    lands in its ``nprobe`` nearest frozen cells tagged with the 1-based
    cell rank — the carrier for one-scan nprobe SWEEPS (candidate sets
    are nested in rank, so "candidates at nprobe=n" is a rank filter,
    never a re-assignment). Same (dist, cell) tie-break; a SQL oracle
    replays with ``row_number() OVER (ORDER BY dist, cell) <= nprobe``."""
    scored = _with_scored_cells(
        emb, centroids, emb_col, cluster_col, centroid_col, strategy
    )
    ranked = F.slice(F.array_sort(F.col("_scored")), 1, nprobe)
    return (
        scored.select(
            "*",
            F.posexplode(ranked).alias("_pos", "_sc"),
        )
        .withColumn(cluster_col, F.col("_sc")["cell"])
        .withColumn(rank_col, (F.col("_pos") + 1).cast("int"))
        .drop("_nx", "_scored", "_pos", "_sc")
    )


def ivf_index_append(
    batch: DataFrame,
    centroids: DataFrame,
    index_path: str,
    emb_col: str = "embedding",
) -> None:
    """Append a batch of new vectors to an on-disk IVF index: frozen-cell
    assignment (:func:`ivf_assign`) + append into the cell-partitioned
    parquet layout — the layout IS the index, so the append keeps every
    existing byte untouched and the probe path keeps pruning partitions.
    Used per micro-batch by streaming/pipelines.py:streaming_ivf_ingest."""
    assigned = ivf_assign(batch, centroids, emb_col=emb_col)
    assigned.write.mode("append").partitionBy("cell").parquet(index_path)


def recall_report(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Measured recall@k of each approximate strategy against the exact
    brute-force baseline, as a small DataFrame (method, k, hits, recall).
    The number the reference never publishes for its HNSW indexes — here
    it's a first-class artifact of the index build.
    """
    from mtg_vector_db_spark.operators.knn import knn

    spark = emb.sparkSession
    exact_ids = {r["vec_id"] for r in knn(emb, query_vec, k).collect()}

    rows = []
    # IVF over KMeans cells (a real geometric quantizer — partitioning by
    # an arbitrary metadata column would measure nothing).
    centroids, assigned = kmeans_ivf_build(emb, n_cells=8)
    ivf_ids = {
        r["vec_id"]
        for r in ivf_search(
            assigned, centroids, query_vec, k, nprobe, cluster_col="cell"
        ).collect()
    }
    rows.append(("ivf-kmeans", len(ivf_ids & exact_ids)))

    model, indexed = lsh_index(emb)
    lsh_ids = {r["vec_id"] for r in lsh_query(model, indexed, query_vec, k).collect()}
    rows.append(("lsh", len(lsh_ids & exact_ids)))

    return spark.createDataFrame(
        [(m, k, h, h / k) for m, h in rows],
        "method string, k int, hits int, recall double",
    )


def pair_cosine_gemm(
    pairs: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_digits: int = 6,
) -> DataFrame:
    """Arrow fast-path pair verification: cosine similarity for an
    explicit ``(id_a, id_b)`` candidate list — the production kernel for
    the verify stage of blocked embedding near-dup (d06's shape), where
    candidate volume, not corpus size, dominates.

    Physical strategy: both endpoint vectors join onto the pair rows
    (id-keyed equi joins), then ONE vectorized numpy pass per Arrow batch
    computes all row-wise dots — versus one interpreted HOF fold per pair
    on the Catalyst path. Same normalize-then-dot arithmetic in float64;
    numpy's pairwise summation can differ from the sequential fold in the
    last ulp, so the fold (``functions.vector.dot``) remains the
    oracle-replayable default and this is the opt-in throughput variant
    (equivalence on real data pinned in tests, like the xxhash64 MinHash
    family).

    Returns ``(id_a, id_b, sim)`` with ``sim`` rounded to
    ``round_digits``.
    """
    va = emb.select(F.col(id_col).alias(id_a), F.col(emb_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias(id_b), F.col(emb_col).alias("_vb"))
    joined = pairs.join(va, id_a).join(vb, id_b).select(id_a, id_b, "_va", "_vb")

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            a = np.array(list(pdf["_va"]), dtype=np.float64)
            b = np.array(list(pdf["_vb"]), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            b /= np.linalg.norm(b, axis=1, keepdims=True)
            sims = np.round(np.einsum("ij,ij->i", a, b), round_digits)
            yield pd.DataFrame(
                {id_a: pdf[id_a], id_b: pdf[id_b], "sim": sims}
            )

    return joined.mapInPandas(
        part, schema=f"{id_a} long, {id_b} long, sim double"
    )


# Safety margin for the Arrow dot-product PREFILTER below: how far the
# numpy (pairwise/SIMD) float64 summation can sit below the sequential
# left-fold the queries' exact rescore replays. For unit-normalized
# dim-64 vectors the worst-case reassociation error is
# d · eps · Σ|aᵢ·bᵢ| ≤ 64 · 2⁻⁵² · 1 ≈ 1.5e-14; the margin also has to
# cover the half-up rounding boundary of round(·, 6) (an exact dot of
# τ − 5e-7 still rounds UP into the kept set). 2e-6 dominates both by
# >10⁵× — a prefilter at (τ − PAIR_DOT_PREFILTER_MARGIN) provably keeps
# every pair the exact fold keeps, and only lets boundary pairs through
# to the (bit-exact) rescore.
PAIR_DOT_PREFILTER_MARGIN = 2e-6


def pair_dot_prefilter_arrow(
    df: DataFrame,
    vec_a_col: str,
    vec_b_col: str,
    threshold: float,
    round_digits: int = 6,
) -> DataFrame:
    """Drop candidate pairs that PROVABLY fail a rounded-dot threshold,
    using one vectorized numpy pass per Arrow batch — the round-9
    two-phase verify kernel for blocked embedding near-dup (d06/c21/c23,
    round-8 VERDICT #3).

    Phase 1 (this function): per batch, row-wise float64 dots via
    ``einsum`` keep only rows with ``dot ≥ threshold − half_ulp(round) −
    margin`` where ``half_ulp(round) = 5·10^-(round_digits+1)`` is the
    half-up rounding boundary (an exact dot that far below ``threshold``
    still rounds up into the kept set) and ``margin`` bounds numpy-vs-
    fold reassociation — no false negatives vs the sequential fold by
    the ``PAIR_DOT_PREFILTER_MARGIN`` argument above. Phase 2 (the caller): the
    EXACT interpreted HOF fold re-scores only the survivors, so every
    emitted similarity value and every keep/drop decision is
    bit-identical to the all-fold form the oracles replay — the Arrow
    stage decides only what is *worth* rescoring. At a selective
    threshold this removes the interpreted O(d) fold from ~all candidate
    pairs (the measured 2/3 of d06's cost) for one Arrow round-trip of
    the pair rows.

    All input columns pass through unchanged (float64 Arrow round-trips
    are lossless), so callers keep computing on the surviving vectors
    directly — no re-join.
    """
    cut = _prefilter_cut(threshold, round_digits)
    schema = df.schema

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            a = np.array(list(pdf[vec_a_col]), dtype=np.float64)
            b = np.array(list(pdf[vec_b_col]), dtype=np.float64)
            d = np.einsum("ij,ij->i", a, b)
            out = pdf[d >= cut]
            if len(out):
                yield out

    return df.mapInPandas(part, schema=schema)


def _prefilter_cut(threshold: float, round_digits: int) -> float:
    """The margin-guarded prefilter bound shared by the pair-level and
    cell-blocked kernels: keep every row whose exact sequential-fold dot
    could still round into ``≥ threshold`` — half-up boundary
    (5·10^-(digits+1)) plus the numpy reassociation margin."""
    return (
        float(threshold)
        - PAIR_DOT_PREFILTER_MARGIN
        - 5.0 * 10.0 ** (-(round_digits + 1))
    )


def cell_blocked_pair_prefilter(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    vec_col: str = "nx",
    round_digits: int = 6,
    flag_col: str | None = None,
) -> DataFrame:
    """Candidate-pair survivors of a rounded-dot threshold, computed by
    ONE block GEMM per cell instead of materializing the Σ|cell|² pair
    rows with both vectors attached (round 9, guide §8: move the heavy
    bytes once, decide on a proxy).

    Why: the pair-level verify attaches two full vectors to every
    candidate row — at sf1 that is ~22M pairs × ~1 KB ≈ 22 GB through
    the joins and the Arrow boundary, and the stage is memory-bandwidth
    bound (measured: d06's verify chain ran no faster on 32 cores than
    on 8). Here each (id, normalized-vector) row moves exactly once,
    keyed by cell (n·nprobe rows ≈ 512 B each); the per-cell kernel
    computes the full within-cell similarity block with one float64
    GEMM and emits ONLY the id pairs above the margin-guarded cut
    (:func:`_prefilter_cut` — no false negatives: blocked/pairwise GEMM
    summation sits within ~1.5e-14 of the sequential fold at dim 64,
    and the margin dominates by >10⁵×; a pair surfacing in several
    cells is kept if ANY occurrence clears the cut, and the margin
    guarantees EVERY occurrence of a true pair clears it). Callers
    ``.distinct()`` the survivors and EXACT-rescore them with the
    sequential HOF fold, so every emitted similarity and keep/drop
    decision is bit-identical to the all-pairs form the oracles replay.

    ``flag_col=None``: within-cell pairs with ``id_a < id_b`` (the
    d06/c21 shape). ``flag_col="is_eval"``: bipartite pairs
    (flagged id × unflagged id — the c23 eval-vs-train shape), emitted
    as ``(id_a=flagged, id_b=unflagged)``.

    Per-cell work is |cell|²·d flops through BLAS with |cell| bounded
    by the dynamic-cells rule (~target·nprobe rows), so group state and
    kernel cost stay bounded at any corpus size — the same guarantee
    the pair join had, minus the pair-row materialization.
    """
    cut = _prefilter_cut(threshold, round_digits)
    cols = [id_col, vec_col] + ([flag_col] if flag_col else [])

    if flag_col is None:

        def kernel(pdf):
            n = len(pdf)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                    {"id_a": "int64", "id_b": "int64"}
                )
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy()
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            s = m @ m.T
            ia, ib = np.triu_indices(n, k=1)
            keep = s[ia, ib] >= cut
            return pd.DataFrame(
                {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]]}
            )

    else:

        def kernel(pdf):
            fl = pdf[flag_col].to_numpy().astype(bool)
            e, t = pdf[fl], pdf[~fl]
            if not len(e) or not len(t):
                return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                    {"id_a": "int64", "id_b": "int64"}
                )
            me = np.array(list(e[vec_col]), dtype=np.float64)
            mt = np.array(list(t[vec_col]), dtype=np.float64)
            s = me @ mt.T
            ia, ib = np.nonzero(s >= cut)
            return pd.DataFrame(
                {
                    "id_a": e[id_col].to_numpy()[ia],
                    "id_b": t[id_col].to_numpy()[ib],
                }
            )

    return assigned.select(cell_col, *cols).groupBy(cell_col).applyInPandas(
        kernel, schema="id_a long, id_b long"
    )


# ---------------------------------------------------------------------------
# NN-Descent: graph-based ANN construction — the family the reference's
# HNSW index belongs to (db/init.sql:50-53), re-expressed as fixed-round
# keyed joins (Dong et al., WWW'11). Init follows the divide-and-conquer
# recipe: TWO independent md5 bucketings, each scored exactly within its
# buckets — one partitioned blocking alone is CLOSED under 2-hop
# expansion (every neighbor's neighborhood lives in the same block, so
# refinement rounds would provably never find anything new; measured: 3
# identical rounds with a single IVF-cell init), while the union of two
# independent partitions lets alternating hops span the corpus. Each
# refinement round proposes neighbors-of-neighbors over the UNDIRECTED
# graph (forward ∪ reverse edges — the full NN-Descent candidate rule),
# rescores, and keeps the per-node top-k of old ∪ new. Per-node
# candidate volume is (2k)² — a round's shuffle is O(n·k²) regardless of
# corpus size, which is the property that makes graph construction
# distribute where HNSW's sequential insert loop cannot.
# ---------------------------------------------------------------------------
def dynamic_bucket_count(
    emb: DataFrame, target_per_bucket: int = 125, min_buckets: int = 16
) -> int:
    """``greatest(min, ceil(n / target))`` — the dynamic_seed_cells rule
    applied to the NN-Descent bucketings: each of the two hashings puts
    2n rows into nb buckets, so init pairs are Σ|bucket|² = 4n²/nb; with
    nb ∝ n that is ~4·target·n — linear at any corpus size where a fixed
    nb is quadratic (the measured d06 failure mode). One bounded count
    action; the registered oracles replay the same ceil in SQL."""
    import math

    n = emb.count()
    return max(min_buckets, math.ceil(n / target_per_bucket))


def nn_descent_init(
    emb: DataFrame,
    n_buckets: int = 16,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Seed graph: per-node top-k over the pair union of two independent
    deterministic md5 bucketings (functions/text.py:hash_fraction — the
    same engine-portable randomness every split/sample in the repo
    uses). Per-bucket pair volume is Σ|bucket|²; pass
    :func:`dynamic_bucket_count` (the registered queries do) so
    n_buckets grows ∝ n and per-node init work stays bounded. Returns
    ``(a, b, sim)`` with ≤k rows per ``a``, sim rounded for cross-engine
    ordering parity.

    Bucketing comes from :func:`_nn_buckets` — the SAME assignment the
    frozen-graph append uses. Single source of truth (round-3 ADVICE):
    append recall depends on build-time and append-time bucketing being
    byte-identical, so init must not carry its own copy to drift."""
    assigned = _nn_buckets(emb, n_buckets)
    left = assigned.select(F.col("vec_id").alias("a"), "cell")
    right = assigned.select(F.col("vec_id").alias("b"), "cell")
    # Distinct BEFORE scoring: a pair sharing both bucketings would
    # otherwise be scored twice and occupy two top-k slots.
    pairs = (
        left.join(right, "cell")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return _graph_topk(_score_pairs(pairs, emb, round_digits), k)


def nn_descent_round(
    graph: DataFrame,
    emb: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """One NN-Descent refinement: candidates = 2-hop neighborhoods of the
    undirected graph, rescored exactly, merged with the current edges,
    per-node top-k kept. Monotone by construction: the new list is the
    top-k of a superset of the old list. Distinct-before-score keeps the
    exact-cosine work to unique pairs; both joins and the final window
    key on vector ids — never a wide column."""
    # Dedup the undirected arc list BEFORE the 2-hop self-join (round 9,
    # §2.3 shuffle fewer bytes): mutual neighbors put the same (a, b)
    # arc into ``und`` twice (forward of one edge + reverse of its
    # mirror — measured 44% duplicate arcs on the sf0.1 round-1 graph),
    # and the self-join SQUARES that redundancy (4.48M → ~1.4M join
    # output rows for the identical distinct candidate set). The arc
    # distinct is one tiny exchange of O(n·k) id pairs; the downstream
    # pair-distinct then partial-aggregates 3× fewer rows at any scale.
    # Flat at sf0.1 (stage overhead dominates there) — this is the
    # 100 TB shape. Candidate set and results proven row-identical.
    und = (
        graph.select("a", "b")
        .union(graph.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    x, y = und.alias("x"), und.alias("y")
    cand = (
        x.join(y, F.col("x.b") == F.col("y.a"))
        .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    allp = cand.union(graph.select("a", "b")).distinct()
    return _graph_topk(_score_pairs(allp, emb, round_digits), k)


def _score_pairs(
    pairs: DataFrame,
    emb: DataFrame,
    round_digits: int,
    emb_b: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine for an (a, b) pair list via two id-keyed embedding
    joins — wide vectors ride the join payload, never a shuffle key.
    ``emb_b`` lets the two pair sides resolve against different tables
    (the append case: new vectors × frozen corpus).

    Norms are hoisted into the per-vector projections (round 8): the
    pair expression is ``dot / (na * nb)`` with ``na``/``nb`` computed
    once per vector — bit-identical to ``cosine_similarity(va, vb)``
    (same ops, same order; see cosine_similarity_prenorm) at 1/3 the
    interpreted-fold work per pair."""
    from mtg_vector_db_spark.functions.vector import (
        cosine_similarity_prenorm,
        l2_norm,
    )

    ea = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("_na"),
    )
    eb = (emb_b if emb_b is not None else emb).select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    return (
        pairs.join(ea, "a")
        .join(eb, "b")
        .select(
            "a",
            "b",
            F.round(
                cosine_similarity_prenorm(
                    F.col("va"), F.col("_na"), F.col("vb"), F.col("_nb")
                ),
                round_digits,
            ).alias("sim"),
        )
    )


def _graph_topk(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _nn_buckets(emb: DataFrame, n_buckets: int) -> DataFrame:
    """The dual-md5 bucket assignment shared by init and append: every
    vector lands in one bucket per independent hashing (2 rows/vector),
    keyed only by id — so vectors arriving LATER get the same buckets
    their peers got at build time, which is what makes append work
    against a frozen graph."""
    from mtg_vector_db_spark.functions.text import hash_fraction

    b1 = F.floor(hash_fraction(F.col("vec_id")) * n_buckets).cast("int")
    b2 = (
        F.floor(
            hash_fraction(
                F.concat(F.col("vec_id").cast("string"), F.lit(":b2"))
            )
            * n_buckets
        ).cast("int")
        + F.lit(n_buckets)
    )
    return emb.select("vec_id", F.explode(F.array(b1, b2)).alias("cell"))


def nn_descent_append(
    graph: DataFrame,
    corpus_emb: DataFrame,
    new_emb: DataFrame,
    n_buckets: int = 16,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Append new vectors to a FROZEN k-NN graph without rebuilding —
    the graph-index analog of ivf_assign's frozen-cell maintenance (and
    of HNSW's insert, minus the sequential lock): each new vector's
    candidates are its bucket-mates in the corpus (same dual-md5
    bucketing the init used) PLUS those mates' frozen neighbor lists
    (one graph hop), exact-rescored, top-k kept. Existing lists are
    untouched; a periodic batch rebuild (nn_descent rounds) refreshes
    them — the standard serve-vs-refit split.

    Per-new-vector work is 2·|bucket|·(1+k) candidates; with n_buckets
    grown ∝ corpus (dynamic_seed_cells guard) that is O(k²)-ish and
    corpus-size-independent — the shuffle is keyed on ids only."""
    mates = (
        _nn_buckets(new_emb, n_buckets)
        .select(F.col("vec_id").alias("a"), "cell")
        .join(
            _nn_buckets(corpus_emb, n_buckets).select(
                F.col("vec_id").alias("b"), "cell"
            ),
            "cell",
        )
        .select("a", "b")
    )
    hop = mates.join(
        graph.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    ).select("a", F.col("c").alias("b"))
    cand = (
        mates.union(hop).filter(F.col("a") != F.col("b")).distinct()
    )
    return _graph_topk(
        _score_pairs(cand, new_emb, round_digits, emb_b=corpus_emb), k
    )


def nn_descent_refresh_appended(
    graph: DataFrame,
    corpus_emb: DataFrame,
    new_emb: DataFrame,
    k: int = 10,
    rounds: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Periodic batch refresh of the APPENDED region of a frozen k-NN
    graph — the graph twin of an IVF refit (round-5 VERDICT #5):
    :func:`nn_descent_append` gives each arrival a good-enough list
    (bucket mates + one frozen hop, recall 0.70 at the committed k=10
    config, RECALL.md), and this job later runs bounded NN-Descent
    rounds SEEDED FROM those lists to close the gap — candidates for an
    appended node are its current list plus the 2-hop neighborhood
    through the undirected combined graph, exact-rescored, top-k kept.

    Scale shape: work is O(|appended|·k²) per round — the frozen corpus
    lists are never recomputed (they pass through untouched; only rows
    with ``a`` in the appended set re-enter the score/top-k path), so
    the job costs by the append backlog, not the corpus. Targets are
    restricted to CORPUS vectors (b ∈ corpus) to keep the audit
    denominator identical to the append face's recall metric; the
    refreshed list is the top-k of a superset of the current list under
    the same exact scores, so recall is monotone non-decreasing by
    construction (test-pinned).

    ``graph`` holds corpus lists ∪ appended lists (``(a, b, sim)``);
    returns the same shape with appended rows replaced."""
    from mtg_vector_db_spark.session import pin

    app_ids = new_emb.select(F.col("vec_id").alias("a"))
    frozen = graph.join(app_ids, "a", "left_anti")
    cur = pin(graph.join(app_ids, "a", "left_semi"))
    corpus_ids = corpus_emb.select(F.col("vec_id").alias("b"))
    for _ in range(rounds):
        full = frozen.unionByName(cur)
        und = full.select("a", "b").union(
            full.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        base = cur.select("a", "b")
        x, y = base.alias("x"), und.alias("y")
        hop2 = (
            x.join(y, F.col("x.b") == F.col("y.a"))
            .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        )
        cand = (
            base.union(hop2)
            .filter(F.col("a") != F.col("b"))
            .join(corpus_ids, "b", "left_semi")
            .distinct()
        )
        cur = pin(
            _graph_topk(
                _score_pairs(cand, new_emb, round_digits, emb_b=corpus_emb),
                k,
            )
        )
    return frozen.unionByName(cur)


def graph_beam_search_rounds(
    graph: DataFrame,
    corpus_emb: DataFrame,
    queries_emb: DataFrame,
    n_buckets: int = 16,
    beam: int = 24,
    rounds: int = 3,
    round_digits: int = 6,
    pre_undirected: bool = False,
    bucket_by: int | None = None,
) -> list[DataFrame]:
    """QUERY-TIME beam search over a frozen k-NN graph — the serving
    path that completes the HNSW analogy (the reference's indexes are
    both built AND searched as graphs, /root/reference/db/init.sql:50-53
    with an ef_search beam; p40 built the graph, this walks it).

    Fixed-round, fully relational form of greedy best-first search:

    * seeds: each query's dual-md5 bucket-mates in the corpus (the SAME
      :func:`_nn_buckets` assignment the graph build used — deterministic
      pseudo-random entry points, oracle-replayable), exact-scored.
    * round r: expand the current beam (per-query top-``beam`` scored
      candidates) one hop along the UNDIRECTED graph adjacency, score
      the new arrivals, fold into the scored set (distinct on
      ``(q, b, sim)`` — sim is deterministic per pair, so the triple
      dedupes exactly), re-take the beam.
    * every round's scored set is pinned (session.py:pin) so round r+1
      reads materialized blocks — the one-DAG discipline of the
      iterative family.

    Returns the per-round scored candidate sets ``S_0..S_rounds``
    (columns ``q, b, sim``): ``rounds`` is the ef_search-style recall
    knob (more rounds = wider frontier = higher recall, linearly more
    scoring work), and a top-k over ``S_last`` is the ANN answer. All
    joins key on ids; vectors ride payloads only. Per-query work is
    O(|bucket| + rounds·beam·k_graph) — corpus-size-independent once
    ``n_buckets`` grows ∝ n (dynamic_bucket_count), exactly like the
    append face.

    Stored-layout opt-ins (the p44 serving path; defaults leave the
    in-memory/p42 plan byte-identical): ``pre_undirected=True`` means
    ``graph`` ALREADY holds the distinct undirected adjacency (skip the
    reverse-union — the stored expansion), and ``bucket_by=B`` means it
    carries an ``abucket = pmod(a, B)`` hive-partition column; each hop
    join then includes the bucket key with the beam side broadcast, so
    DYNAMIC PARTITION PRUNING confines every hop's graph read to the
    frontier's buckets — at 100 TB a hop reads O(beam) adjacency
    partitions, never the full edge table."""
    from mtg_vector_db_spark.session import pin

    qe = queries_emb.select("vec_id", "embedding")
    seeds = (
        _nn_buckets(qe, n_buckets)
        .select(F.col("vec_id").alias("a"), "cell")
        .join(
            _nn_buckets(corpus_emb, n_buckets).select(
                F.col("vec_id").alias("b"), "cell"
            ),
            "cell",
        )
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    scored = pin(
        _score_pairs(seeds, qe, round_digits, emb_b=corpus_emb)
        .withColumnRenamed("a", "q")
    )
    out = [scored]
    if pre_undirected:
        und = graph
    else:
        und = graph.select("a", "b").union(
            graph.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        if bucket_by is not None:
            # The derived reverse-union has only (a, b); the bucketed hop
            # join below references und["abucket"], so derive it here with
            # the same pmod rule the stored layout partitions by. (No DPP
            # win on an in-memory union — the column exists for plan-shape
            # parity with the stored path, and so bucket_by without
            # pre_undirected is usable instead of an AnalysisException.)
            und = und.withColumn(
                "abucket", F.pmod(F.col("a"), F.lit(bucket_by))
            )
    for _ in range(rounds):
        beam_df = _graph_topk(
            out[-1].withColumnRenamed("q", "a"), beam
        ).select(F.col("a").alias("q"), F.col("b").alias("hop"))
        if bucket_by is not None:
            bcast = F.broadcast(
                beam_df.withColumn(
                    "abucket", F.pmod(F.col("hop"), F.lit(bucket_by))
                )
            )
            frontier = (
                und.join(
                    bcast,
                    (und["abucket"] == bcast["abucket"])
                    & (bcast["hop"] == und["a"]),
                )
                .select("q", und["b"].alias("b"))
                .filter(F.col("q") != F.col("b"))
                .distinct()
            )
        else:
            frontier = (
                beam_df.join(und, beam_df["hop"] == und["a"])
                .select("q", und["b"].alias("b"))
                .filter(F.col("q") != F.col("b"))
                .distinct()
            )
        fresh = _score_pairs(
            frontier.withColumnRenamed("q", "a"),
            qe,
            round_digits,
            emb_b=corpus_emb,
        ).withColumnRenamed("a", "q")
        out.append(pin(out[-1].unionByName(fresh).distinct()))
    return out


def graph_beam_search(
    graph: DataFrame,
    corpus_emb: DataFrame,
    queries_emb: DataFrame,
    k: int = 10,
    n_buckets: int = 16,
    beam: int = 24,
    rounds: int = 3,
    round_digits: int = 6,
    pre_undirected: bool = False,
    bucket_by: int | None = None,
) -> DataFrame:
    """Top-k ANN answers via :func:`graph_beam_search_rounds` — the
    user-facing serving operator: ``(q, b, sim)``, ≤k rows per query,
    exact similarities (graph candidates are always exact-rescored)."""
    final = graph_beam_search_rounds(
        graph, corpus_emb, queries_emb, n_buckets, beam, rounds,
        round_digits, pre_undirected, bucket_by,
    )[-1]
    return _graph_topk(
        final.withColumnRenamed("q", "a"), k
    ).withColumnRenamed("a", "q")
