"""two_level_assign member-shard delivery strategies (round-6 VERDICT #1).

The two-level (IMI) assignment ships the centroid codebook to the probe
side sharded one row per super-cell. Round 6 removed the O(cells)
driver/plan cost; this round removes the last O(cells) RESOURCE envelope:
above TWO_LEVEL_BROADCAST_MAX_BYTES of estimated payload the shards ride
a SHUFFLE_HASH join on super_col instead of an explicit broadcast, so
per-executor memory stops growing with total cell count (at the engine's
own extreme framing — ~4M × 64-d centroids — the broadcast would be ~2 GB
replicated to every executor, and the explicit hint forbade AQE from ever
choosing otherwise). These tests pin, in the test_ivf_strategy.py
discipline: bit-equality of the two paths (single- and multi-probe), the
auto switch at the payload bound, the shuffle plan shape above it, the
type-stable memberless-super sentinel under bigint cell ids (round-6
ADVICE), and p49 oracle parity driven end-to-end through the shuffle path
($SPARK_GRAFT_TWO_LEVEL_MEMBERS_STRATEGY)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mtg_vector_db_spark.operators.ann import ivf_assign, two_level_assign
from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle


def _vecs(spark, n, dim, seed, id_type="int"):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(
        rows, f"vec_id {id_type}, embedding array<double>"
    )


def _cents(spark, k, dim, seed, cell_type="int", id_offset=0):
    rng = random.Random(seed)
    rows = [
        (i + id_offset, [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(k)
    ]
    return spark.createDataFrame(
        rows, f"cell {cell_type}, centroid array<double>"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("vec_id", "super_cell", "cell").collect()
    )


@pytest.mark.parametrize("n_probe_super", [1, 3])
def test_broadcast_equals_shuffle_bitwise(spark, n_probe_super):
    """The two delivery strategies must agree on every assignment — both
    the single-probe path (plain left join) and the multi-probe path
    (explode + min_by fold). 300 vectors × 60 cells makes near-tie
    distances likely, so any scoring drift between the replicated and
    the co-partitioned shards would flip a cell here."""
    emb = _vecs(spark, 300, 16, seed=11)
    cents = _cents(spark, 60, 16, seed=23)
    bc = two_level_assign(
        emb, cents, n_probe_super=n_probe_super,
        members_strategy="broadcast",
    )
    sh = two_level_assign(
        emb, cents, n_probe_super=n_probe_super, members_strategy="shuffle"
    )
    assert _rows(bc) == _rows(sh)


def test_auto_switches_to_shuffle_above_payload_bound(spark, monkeypatch):
    """auto = broadcast below the payload bound (BroadcastHashJoin on
    super_cell, zero shuffle on the codebook), shuffle-hash above it
    (ShuffledHashJoin + an Exchange hashpartitioning the members on
    super_cell — per-executor memory O(partition), not O(cells))."""
    emb = _vecs(spark, 40, 8, seed=5)
    cents = _cents(spark, 120, 8, seed=7)

    below = _plan(two_level_assign(emb, cents))
    assert "BroadcastHashJoin" in below

    # 120 cells × (8·8 + 32) = 11.5 KB of payload — a 1-byte bound
    # forces the big-codebook path without building a big codebook.
    # Static salt first: the strict no-broadcast plan (the auto-salt
    # default adds a BOUNDED broadcast of the ≤ n_super-row salt
    # table, which would trip the blanket assertion below).
    monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_BROADCAST_MAX_BYTES", "1")
    monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_SHUFFLE_SALT", "8")
    above = _plan(two_level_assign(emb, cents))
    assert "ShuffledHashJoin" in above
    assert "BroadcastHashJoin" not in above
    assert "hashpartitioning(super_cell" in above

    # Auto salt (the default): the member shards still ride the
    # shuffle-hash join — the only broadcasts are the bounded salt
    # table reaching each side.
    monkeypatch.delenv("SPARK_GRAFT_TWO_LEVEL_SHUFFLE_SALT")
    auto = _plan(two_level_assign(emb, cents))
    assert "ShuffledHashJoin" in auto
    assert "hashpartitioning(super_cell" in auto


def test_explicit_strategy_wins_over_env(spark, monkeypatch):
    """$SPARK_GRAFT_TWO_LEVEL_MEMBERS_STRATEGY overrides auto ONLY — an
    explicit caller choice still wins (the $SPARK_GRAFT_IVF_STRATEGY
    contract), and unknown strategies fail loudly."""
    emb = _vecs(spark, 10, 4, seed=3)
    cents = _cents(spark, 9, 4, seed=9)
    monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_MEMBERS_STRATEGY", "shuffle")
    assert "ShuffledHashJoin" in _plan(two_level_assign(emb, cents))
    assert "BroadcastHashJoin" in _plan(
        two_level_assign(emb, cents, members_strategy="broadcast")
    )
    with pytest.raises(ValueError, match="strategy"):
        two_level_assign(emb, cents, members_strategy="nope")


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_bigint_cell_ids_above_2_31(spark, strategy):
    """Round-6 ADVICE: the multi-probe memberless-super sentinel was a
    plain int literal (2³¹−1); under a BIGINT cell column it relied on
    implicit struct coercion and no longer dominated real ids above 2³¹.
    Geometry forcing the sentinel to matter: centroid 2³¹+10 duplicates
    super 2³¹ exactly, so its self-assignment tie-breaks to the LOWER id
    and super 2³¹+10 attracts no members; a vector probing both supers
    must coalesce the memberless probe to the sentinel and still pick
    the real member cell — which is > 2³¹, so the old int sentinel would
    not have dominated it."""
    base = 2**31
    cents = spark.createDataFrame(
        [
            (base + 0, [1.0, 0.0]),
            (base + 10, [1.0, 0.0]),  # duplicate of super 0 -> memberless
            (base + 20, [0.0, 1.0]),
        ],
        "cell bigint, centroid array<double>",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.05]), (2, [0.05, 1.0])],
        "vec_id int, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["super_cell"], r["cell"])
        for r in two_level_assign(
            emb, cents, n_super=2, n_probe_super=2,
            members_strategy=strategy,
        ).collect()
    }
    assert len(out) == 2
    # Vector 1 probes supers {2^31, 2^31+10}; the second is memberless,
    # the first holds both duplicate centroids -> nearest is the lower.
    assert out[1] == (base, base)
    # Vector 2's best cell lives in super 2^31: cell 2^31+20 (bigint,
    # above the old int sentinel).
    assert out[2][1] == base + 20


def test_shuffle_path_assigns_everything_at_2100_cells(spark, monkeypatch):
    """The shuffle path at a cell count well past IVF_LITERAL_MAX_CELLS:
    every vector still gets exactly one non-null cell, the plan carries
    no O(k) literal, and answers equal the broadcast path's (the 100×
    regime in miniature)."""
    emb = _vecs(spark, 50, 4, seed=3)
    cents = _cents(spark, 2100, 4, seed=9)
    monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_BROADCAST_MAX_BYTES", "1")
    df = two_level_assign(emb, cents)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan
    assert len(plan) < 150_000, len(plan)
    out = df.select("vec_id", "cell")
    assert out.count() == 50
    assert out.filter(F.col("cell").isNull()).count() == 0
    bc = two_level_assign(emb, cents, members_strategy="broadcast")
    assert _rows(df) == _rows(bc)


def test_full_probe_equals_flat_through_shuffle(spark):
    """Exactness anchor through the NEW path: probing every super makes
    the two-level answer the global argmin, so shuffle-delivered shards
    must reproduce flat ivf_assign exactly."""
    emb = _vecs(spark, 150, 8, seed=41)
    cents = _cents(spark, 25, 8, seed=43)
    two = two_level_assign(
        emb, cents, n_super=5, n_probe_super=5, members_strategy="shuffle"
    ).select("vec_id", "cell")
    flat = ivf_assign(emb, cents).select("vec_id", "cell")
    assert two.exceptAll(flat).count() == 0
    assert flat.exceptAll(two).count() == 0


def test_p49_oracle_green_through_shuffle_path(spark, sf001, monkeypatch):
    """The registered two-level query, driven end-to-end through the
    shuffle delivery path, must stay green against the UNCHANGED oracle
    (the round-5/6 done-criterion for strategy switches)."""
    monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_MEMBERS_STRATEGY", "shuffle")
    registry.load_all()
    df = registry.QUERIES["p49_two_level_assign"](spark, sf001)
    assert_matches_oracle(
        df, registry.ORACLES["p49_two_level_assign"], sf001
    )


def test_two_level_probe_cells_semantics_and_plan(spark, sf001):
    """The IMI serving half: two_level_probe_cells must return exactly
    the cosine top-nprobe cells AMONG the top-n_probe_super supers'
    members (python reference from the same collected codebook), and its
    plan must gate the codebook scan behind the super semi-join — the
    shape that makes per-query coarse work O(√k + members), not O(k)."""
    import math

    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.ann import (
        ivf_assign,
        two_level_probe_cells,
    )
    from mtg_vector_db_spark.plans.vector_queries import query_vector

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    qv = query_vector(spark, sf001)
    seeds = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    supers = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("super_cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    casg = ivf_assign(
        seeds.select(
            F.col("cell").alias("vec_id"),
            F.col("centroid").alias("embedding"),
        ),
        supers,
        cluster_col="super_cell",
        centroid_col="centroid",
    ).select(F.col("vec_id").alias("cell"), "super_cell")
    cents_sup = seeds.join(F.broadcast(casg), "cell")

    df = two_level_probe_cells(
        cents_sup, supers, qv, nprobe=8, n_probe_super=2
    )
    got = [r["cell"] for r in df.collect()]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    sup_rows = {r["super_cell"]: r["centroid"] for r in supers.collect()}
    top_supers = sorted(
        sup_rows, key=lambda sc: (-cos(sup_rows[sc], qv), sc)
    )[:2]
    members = {
        r["cell"]: r["centroid"]
        for r in cents_sup.collect()
        if r["super_cell"] in top_supers
    }
    want = sorted(members, key=lambda c: (-cos(members[c], qv), c))[:8]
    assert sorted(got) == sorted(want)

    plan = _plan(df)
    # the codebook scan is gated by the super semi-join before TakeOrdered
    assert "LeftSemi" in plan and "TakeOrderedAndProject" in plan


def test_p53_oracle_green(spark, sf001):
    """The composed IMI serving query (build side at the committed
    assignment probe, query side through the two-level probe) stays
    oracle-green — the p49/p52/p53 arm's end-to-end anchor."""
    registry.load_all()
    df = registry.QUERIES["p53_imi_search"](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES["p53_imi_search"], sf001)


def test_auto_salt_equals_static_salt_bitwise(spark, monkeypatch):
    """Round-8 VERDICT #4: the per-super auto salt must be pinned
    bit-equal to the round-7 uniform static salt (the salt only
    augments the join key — matched pairs are identical under any salt
    table), through the shuffle path, single- and multi-probe."""
    emb = _vecs(spark, 200, 8, seed=31)
    cents = _cents(spark, 50, 8, seed=37)
    monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_BROADCAST_MAX_BYTES", "1")
    for probe in (1, 3):
        monkeypatch.setenv("SPARK_GRAFT_TWO_LEVEL_SHUFFLE_SALT", "8")
        static = _rows(
            two_level_assign(
                emb, cents, n_probe_super=probe,
                members_strategy="shuffle",
            )
        )
        monkeypatch.delenv("SPARK_GRAFT_TWO_LEVEL_SHUFFLE_SALT")
        auto = _rows(
            two_level_assign(
                emb, cents, n_probe_super=probe,
                members_strategy="shuffle",
            )
        )
        assert static == auto, f"probe={probe}"


def test_trained_supers_equal_semantics_and_balance(spark):
    """Round-8 VERDICT #3: super_strategy='trained' must (a) keep the
    operator's contract — every vector assigned, assignment = nearest
    cell within the probed supers' members, NULL only when all probed
    supers are memberless — and (b) on a clustered fixture produce a
    member-shard balance no worse than the arbitrary lowest-id supers
    (max/mean shard width). Exactness vs the flat argmin at full probe
    holds for ANY super codebook (every cell is reachable), which is
    the oracle-comparable pin."""
    from mtg_vector_db_spark.operators.ann import ivf_assign

    emb = _vecs(spark, 200, 8, seed=41)
    cents = _cents(spark, 48, 8, seed=43)

    # (a) full probe ≡ flat argmin, trained codebook.
    got = {
        (r["vec_id"], r["cell"])
        for r in two_level_assign(
            emb, cents, n_super=7, n_probe_super=7,
            super_strategy="trained",
        ).select("vec_id", "cell").collect()
    }
    flat = {
        (r["vec_id"], r["cell"])
        for r in ivf_assign(emb, cents).select("vec_id", "cell").collect()
    }
    assert got == flat

    # (b) shard balance on the member (centroid→super) assignment.
    def balance(strategy):
        rows = two_level_assign(
            emb, cents, n_super=7, n_probe_super=1,
            super_strategy=strategy,
        ).select("super_cell").groupBy("super_cell").count().collect()
        widths = [r["count"] for r in rows]
        return max(widths) / (sum(widths) / len(widths))

    assert balance("trained") <= balance("lowest_id") * 1.25


def test_min_pool_nprobe_guard_restores_small_corpus_recall(spark, sf001):
    """Round-8 VERDICT #6: p52's committed operating point serves 0.92
    at sf0.1 but 0.72 at sf0.01 — small corpora starve the candidate
    pool (recall tracks pool size, not probe fraction; measured knee
    ~25·k). min_pool_nprobe widens the probe until the EXPECTED pool
    clears c·k: at the sf0.01 scale it must lift serving recall to
    ≥0.9, and at production scale (pool already ≥ c·k) it must return
    the caller's nprobe unchanged."""
    from pyspark.sql import Window

    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from mtg_vector_db_spark.operators.ann import (
        ivf_ranked_assign,
        min_pool_nprobe,
        two_level_assign,
    )
    from mtg_vector_db_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    n = emb.count()
    K, N_Q, CELLS = 10, 10, 64
    seeds = emb.filter(F.col("vec_id") < CELLS).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    asg = two_level_assign(emb, seeds, n_super=8, n_probe_super=4).select(
        "vec_id", "cell"
    )
    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_join(emb, queries, k=K, round_digits=6).select(
        "query_id", F.col("vec_id").alias("neighbor_id")
    )

    def recall(nprobe):
        pc = ivf_ranked_assign(
            queries.select(
                F.col("query_id").alias("vec_id"),
                F.col("query_vec").alias("embedding"),
            ),
            seeds,
            nprobe=nprobe,
        ).select(F.col("vec_id").alias("query_id"), "cell")
        cand = (
            asg.join(F.broadcast(pc), "cell")
            .join(F.broadcast(queries), "query_id")
            .join(emb.select("vec_id", "embedding"), "vec_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(
                    cosine_similarity(
                        F.col("embedding"), F.col("query_vec")
                    ),
                    6,
                ).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        got = cand.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= K
        )
        return got.join(exact, ["query_id", "neighbor_id"]).count() / (
            N_Q * K
        )

    guarded = min_pool_nprobe(n, CELLS, K, nprobe=8)
    assert guarded > 8  # the small corpus must trigger the guard
    assert recall(guarded) >= 0.9

    # Production-scale behavior: a corpus whose default pool already
    # clears c·k keeps the caller's nprobe (no silent over-probing).
    assert min_pool_nprobe(1_000_000, CELLS, K, nprobe=8) == 8
    # Degenerate guards: tiny corpus probes everything, never > cells.
    assert min_pool_nprobe(1, CELLS, K, nprobe=8) == CELLS
