"""Frozen-centroid assignment strategies (round-5 VERDICT #1 fix).

The IVF assignment kernels (ivf_assign / ivf_multi_assign /
ivf_ranked_assign) have two physical strategies sharing one scoring
expression: a plan LITERAL (driver collect of ≤ IVF_LITERAL_MAX_CELLS
rows — cheapest per task at small k) and a one-row BROADCAST fold (the
centroid table never leaves the JVM — the 100×-regime path, since the
engine's own cells-∝-n rules make cell COUNT grow with the corpus).
These tests pin: bit-equality of the two strategies, the auto switch at
the threshold, an O(1)-in-cells plan above the threshold, empty-table
behavior, and oracle parity of every registered IVF query driven
through the broadcast path end-to-end ($SPARK_GRAFT_IVF_STRATEGY)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mtg_vector_db_spark.operators import ann as A
from mtg_vector_db_spark.operators.ann import (
    ivf_assign,
    ivf_multi_assign,
    ivf_ranked_assign,
)
from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle


def _vecs(spark, n, dim, seed, id_col="vec_id", vec_col="embedding"):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, f"{id_col} int, {vec_col} array<double>"
    )


def _cents(spark, k, dim, seed):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(k)
    ]
    return spark.createDataFrame(rows, "cell int, centroid array<double>")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("kernel", ["assign", "multi", "ranked"])
def test_literal_equals_broadcast_bitwise(spark, kernel):
    """The two strategies must agree on every assignment — 300 vectors ×
    50 cells makes near-tie distances likely, so any association-order
    drift between the driver-side literal precompute and the JVM fold
    (n2 = Σx²) would flip a cell here."""
    emb = _vecs(spark, 300, 16, seed=11)
    cents = _cents(spark, 50, 16, seed=23)
    fns = {
        "assign": lambda s: ivf_assign(emb, cents, strategy=s),
        "multi": lambda s: ivf_multi_assign(emb, cents, nprobe=3, strategy=s),
        "ranked": lambda s: ivf_ranked_assign(
            emb, cents, nprobe=3, strategy=s
        ),
    }
    lit = fns[kernel]("literal").drop("embedding")
    bc = fns[kernel]("broadcast").drop("embedding")
    assert lit.exceptAll(bc).count() == 0
    assert bc.exceptAll(lit).count() == 0


def test_auto_switches_to_broadcast_above_threshold(spark, monkeypatch):
    """auto = literal at ≤ threshold cells (no join in the plan),
    broadcast above it (BroadcastNestedLoopJoin with the 1-row fold —
    there is no equi-key, so BNLJ is the broadcast join of this shape;
    and crucially NO O(cells) literal in the serialized plan)."""
    emb = _vecs(spark, 20, 4, seed=5)
    cents = _cents(spark, 10, 4, seed=7)

    below = _plan(ivf_assign(emb, cents, strategy="auto"))
    assert "Join" not in below

    monkeypatch.setattr(A, "IVF_LITERAL_MAX_CELLS", 4)
    above = _plan(ivf_assign(emb, cents, strategy="auto"))
    assert "BroadcastNestedLoopJoin" in above


def test_broadcast_plan_is_o1_in_cell_count(spark):
    """2100 cells (≫ IVF_LITERAL_MAX_CELLS) under auto: the plan
    must carry the broadcast join and stay small — a centroid literal at
    this cardinality would serialize 2100×(dim+1) doubles into every
    task (the exact 100×-regime bound this strategy removes)."""
    emb = _vecs(spark, 50, 4, seed=3)
    cents = _cents(spark, 2100, 4, seed=9)
    df = ivf_assign(emb, cents, strategy="auto")
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    # A 2100-cell literal would be megabytes of plan text; the broadcast
    # plan is O(1) in cell count.
    assert len(plan) < 100_000, len(plan)
    # And it still computes: every vector gets exactly one cell.
    out = df.select("vec_id", "cell")
    assert out.count() == 50
    assert out.filter(F.col("cell").isNull()).count() == 0


def test_broadcast_empty_centroids_matches_literal_semantics(spark):
    """Empty centroid table (index not built yet / empty micro-batch):
    hard assign keeps rows with a NULL cell, multi-assign emits no rows —
    identical in both strategies."""
    emb = _vecs(spark, 5, 4, seed=2)
    empty = _cents(spark, 0, 4, seed=0)
    for strategy in ("literal", "broadcast"):
        hard = ivf_assign(emb, empty, strategy=strategy)
        assert hard.count() == 5
        assert hard.filter(F.col("cell").isNull()).count() == 5
        assert ivf_multi_assign(emb, empty, strategy=strategy).count() == 0


def test_unknown_strategy_raises(spark):
    emb = _vecs(spark, 2, 4, seed=1)
    cents = _cents(spark, 2, 4, seed=1)
    with pytest.raises(ValueError, match="strategy"):
        ivf_assign(emb, cents, strategy="nope")


def test_two_level_assign_reduces_to_flat_at_one_super(spark):
    """n_super=1 puts every centroid in one member list, so the level-2
    argmin IS the flat argmin — the exactness anchor for the two-level
    approximation."""
    from mtg_vector_db_spark.operators.ann import two_level_assign

    emb = _vecs(spark, 200, 8, seed=31)
    cents = _cents(spark, 24, 8, seed=37)
    two = two_level_assign(emb, cents, n_super=1).select("vec_id", "cell")
    flat = ivf_assign(emb, cents).select("vec_id", "cell")
    assert two.exceptAll(flat).count() == 0
    assert flat.exceptAll(two).count() == 0


def test_two_level_assign_keeps_rows_on_memberless_super(spark):
    """A vector whose nearest super-cell attracted no member centroids
    keeps its row with a NULL cell (left join — assignment never drops
    rows), matching the oracle's LEFT JOIN replay. Geometry: supers are
    cells {0, 1}; every centroid (including cell 0 itself) assigns to
    super 1, so super 0 is memberless; the [-1, 0] vector still picks
    super 0 at level 1 (smaller ‖s‖² − 2·x̂·s on the negative axis)."""
    from mtg_vector_db_spark.operators.ann import two_level_assign

    cents = spark.createDataFrame(
        [(0, [0.1, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.1])],
        "cell int, centroid array<double>",
    )
    emb = spark.createDataFrame(
        [(0, [-1.0, 0.0]), (1, [1.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["super_cell"], r["cell"])
        for r in two_level_assign(emb, cents, n_super=2).collect()
    }
    assert len(out) == 2  # no dropped rows
    assert out[0][0] == 0 and out[0][1] is None  # memberless super
    assert out[1][0] == 1 and out[1][1] is not None


def test_two_level_full_probe_equals_flat(spark):
    """n_probe_super = n_super probes every member shard, so the
    two-level answer is the global argmin — the multi-probe path's
    exactness anchor (also exercises the min_by fold, which the
    single-probe path never runs)."""
    from mtg_vector_db_spark.operators.ann import two_level_assign

    emb = _vecs(spark, 150, 8, seed=41)
    cents = _cents(spark, 25, 8, seed=43)
    two = two_level_assign(
        emb, cents, n_super=5, n_probe_super=5
    ).select("vec_id", "cell")
    flat = ivf_assign(emb, cents).select("vec_id", "cell")
    assert two.exceptAll(flat).count() == 0
    assert flat.exceptAll(two).count() == 0


def test_two_level_probe_agreement_monotone(spark):
    """More probed supers can only widen the candidate union, so
    flat-argmin agreement is non-decreasing in n_probe_super."""
    from mtg_vector_db_spark.operators.ann import two_level_assign

    emb = _vecs(spark, 300, 8, seed=51)
    cents = _cents(spark, 64, 8, seed=53)
    flat = ivf_assign(emb, cents).select(
        "vec_id", F.col("cell").alias("f")
    )
    rates = []
    for p in (1, 2, 4):
        two = two_level_assign(emb, cents, n_probe_super=p).select(
            "vec_id", "cell"
        )
        j = two.join(flat, "vec_id")
        rates.append(
            j.filter(F.col("cell") == F.col("f")).count() / j.count()
        )
    assert rates == sorted(rates), rates


def test_two_level_plan_shards_broadcast_by_super(spark):
    """At 2100 cells the two-level path must plan a BroadcastHashJoin on
    super_cell (the centroid table reaches tasks sharded one row per
    super-cell — no O(k) literal, no single O(k) fold row) and still
    assign every vector."""
    from mtg_vector_db_spark.operators.ann import two_level_assign

    emb = _vecs(spark, 50, 4, seed=3)
    cents = _cents(spark, 2100, 4, seed=9)
    df = two_level_assign(emb, cents)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert len(plan) < 150_000, len(plan)
    out = df.select("vec_id", "cell")
    assert out.count() == 50
    assert out.filter(F.col("cell").isNull()).count() == 0


def test_ivf_search_join_probe_equals_collect_probe(spark, sf001):
    """The in-plan nprobe pick (broadcast semi-join) must answer
    identically to the legacy driver-side isin-literal pick — the
    round-5 #9 demotion of the last per-query driver round-trip in the
    vector serve path — and its plan must carry the broadcast join."""
    from mtg_vector_db_spark.operators.ann import (
        centroid_vectors,
        centroids_by,
        ivf_search,
    )
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    cents = centroid_vectors(centroids_by(emb))
    joined = ivf_search(
        emb, cents, qv, k=10, nprobe=2, round_digits=6,
        probe_strategy="join",
    )
    collected = ivf_search(
        emb, cents, qv, k=10, nprobe=2, round_digits=6,
        probe_strategy="collect",
    )
    assert [tuple(r) for r in joined.collect()] == [
        tuple(r) for r in collected.collect()
    ]
    plan = _plan(joined)
    assert "Broadcast" in plan and "Join" in plan
    with pytest.raises(ValueError, match="probe_strategy"):
        ivf_search(emb, cents, qv, k=10, probe_strategy="nope")


# ---------------------------------------------------------------------------
# End-to-end: every registered query that rides the assignment kernels,
# forced through the broadcast path, must stay oracle-green with the
# oracles UNCHANGED (the round-5 VERDICT done-criterion). d06 = the
# IVF-blocked near-dup self-join, p17 = the assignment query itself,
# p45/p47 = the stored-layout serving probes (ivf_ranked_assign on the
# query side), c21 = SemDeDup's cell blocking.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "name",
    [
        "d06_embedding_neardup",
        "p17_ivf_assign_cells",
        "p45_ivf_serve_stored",
        "p47_ivfpq_serve_stored",
    ],
)
def test_registered_ivf_queries_green_through_broadcast_path(
    spark, sf001, name, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_IVF_STRATEGY", "broadcast")
    registry.load_all()
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)
