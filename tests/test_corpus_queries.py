"""Corpus-pipeline suite: oracle parity + semantic invariants the oracle
replay alone can't pin (cluster transitivity, packing arithmetic,
sample determinism/stability)."""

from __future__ import annotations

import math

import pytest

from mtg_vector_db_spark.operators import corpus as C
from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

CORPUS_QUERIES = [n for n in registry.QUERIES if n.startswith("c")]


def test_family_registered():
    # c01-c31 (c29 audit + c30 consumer, r4; c31 stored-layout twin, r8)
    assert len(CORPUS_QUERIES) == 31
    assert all(n in registry.ORACLES for n in CORPUS_QUERIES)


@pytest.mark.parametrize("name", CORPUS_QUERIES)
def test_oracle_parity(spark, sf001, name):
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)


def test_dup_clusters_resolves_transitive_chain(spark):
    # a-b, b-c, and a separate d-e: two clusters, min-id labels.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in C.dup_clusters(pairs, iters=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_fixed_rounds_under_merge_on_planted_diameter6_chain(spark):
    """The documented failure mode of fixed-round propagation, made
    concrete: on a diameter-6 path 0-1-2-3-4-5-6, 3 min-label rounds
    cannot carry label 0 to node 6 (labels travel one hop per round), so
    the fixed form under-merges — while the large-star/small-star form
    converges to one component regardless of diameter."""
    chain = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    fixed = {
        r["doc_id"]: r["cluster_id"]
        for r in C.dup_clusters(pairs, iters=3).collect()
    }
    assert len(set(fixed.values())) > 1  # provably under-merged
    assert fixed[6] != 0

    conv = {
        r["doc_id"]: r["cluster_id"]
        for r in C.dup_clusters_converged(pairs).collect()
    }
    assert conv == {i: 0 for i in range(7)}


def test_converged_matches_fixed_on_small_diameter_graphs(spark):
    """On the blob-shaped graphs near-dup dedup actually produces
    (diameter <= 3) the two resolvers agree exactly — the property that
    makes them interchangeable behind c07/c18/c25/c28."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22)],
        ["id_a", "id_b"],
    )
    fixed = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in C.dup_clusters(pairs, iters=3).collect()
    )
    conv = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in C.dup_clusters_converged(pairs).collect()
    )
    assert fixed == conv


def test_dup_clusters_covers_planted_neardups(spark, sf001):
    rows = registry.QUERIES["c01_dup_clusters"](spark, sf001).collect()
    assert rows, "expected planted near-dup clusters in the test corpus"
    by_cluster: dict[int, int] = {}
    for r in rows:
        by_cluster[r["cluster_id"]] = by_cluster.get(r["cluster_id"], 0) + 1
        assert r["cluster_id"] <= r["doc_id"]  # min-label invariant
    assert max(by_cluster.values()) >= 2  # at least one real cluster


def test_pack_sequences_arithmetic(spark, sf001):
    rows = registry.QUERIES["c02_pack_sequences"](spark, sf001).collect()
    assert rows
    for r in rows:
        assert r["n_sequences"] == math.ceil(r["n_tokens"] / 512)
        assert 0 < r["fill_rate"] <= 1.0
        assert r["n_split_docs"] <= r["n_docs"]


def test_stratified_sample_is_deterministic_and_stable(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    kw = dict(
        strata_col="lang",
        key_col="doc_id",
        rates={"en": 0.5},
        default_rate=0.25,
    )
    first = {r["doc_id"] for r in C.stratified_sample(docs, **kw).collect()}
    again = {r["doc_id"] for r in C.stratified_sample(docs, **kw).collect()}
    assert first == again
    # Stability under corpus growth: sampling a PREFIX of the corpus keeps
    # exactly the kept-set restricted to that prefix (no reshuffling).
    half = docs.filter("doc_id < 250")
    sub = {r["doc_id"] for r in C.stratified_sample(half, **kw).collect()}
    assert sub == {i for i in first if i < 250}
    # Different salt draws an independent sample.
    other = {
        r["doc_id"]
        for r in C.stratified_sample(docs, salt=":other", **kw).collect()
    }
    assert other != first


def test_chunking_reconstructs_documents(spark, sf001):
    """Every token position is covered; consecutive chunks overlap by
    size-stride tokens; only the final chunk may be short."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet").filter(
        "doc_id < 50"
    )
    chunks = C.chunk_documents(docs, size=8, stride=4).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {
        r["doc_id"]: r["text"].split() for r in docs.collect() if r["text"]
    }
    assert set(by_doc) == {d for d, t in texts.items() if t}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        toks = texts[doc_id]
        for r in rows[:-1]:
            assert r["n_tokens"] == 8
        for r in rows:
            start = r["chunk_id"] * 4
            assert r["chunk_text"].split() == toks[start : start + 8]
        # full coverage: last chunk reaches the end of the document
        last = rows[-1]
        assert last["chunk_id"] * 4 + last["n_tokens"] == len(toks)


def test_pack_sequences_matches_python_model_random(spark):
    """Randomized parity: per-block packing stats equal a direct Python
    simulation of concat-and-chunk over the same token counts."""
    import math as m
    import random

    rng = random.Random(13)
    rows = [
        (i, " ".join("tok" for _ in range(rng.randint(0, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["block"]: r
        for r in C.pack_sequences(
            df, budget=32, block_rows=64
        ).collect()
    }

    blocks: dict[int, list[tuple[int, int]]] = {}
    for i, t in rows:
        n = len(t.split())
        if n > 0:
            blocks.setdefault(i // 64, []).append((i, n))
    assert set(got) == set(blocks)
    for b, docs in blocks.items():
        docs.sort()
        total = sum(n for _, n in docs)
        n_seqs = m.ceil(total / 32)
        cum = 0
        n_split = 0
        for _, n in docs:
            first = (cum) // 32
            cum += n
            last = (cum - 1) // 32
            if last > first:
                n_split += 1
        r = got[b]
        assert r["n_docs"] == len(docs)
        assert r["n_tokens"] == total
        assert r["n_sequences"] == n_seqs
        assert r["n_split_docs"] == n_split
        assert r["fill_rate"] == round(total / (n_seqs * 32), 6)


def test_dsir_scores_prefer_target_like_vocab(spark):
    """A raw-pool doc written in the target vocabulary must outscore a
    raw-pool doc written in a disjoint vocabulary."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.importance import dsir_scores

    target_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, target_text, True) for i in range(10)]
    rows.append((100, "alpha beta gamma delta epsilon", False))
    rows.append((101, "omega psi chi phi upsilon", False))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    sc = {
        r["doc_id"]: r["score"]
        for r in dsir_scores(docs, F.col("is_t")).collect()
    }
    assert sc[100] > sc[101]
    # Disjoint-vocab doc scores strictly below zero (anti-target).
    assert sc[101] < 0.0


def test_dsir_select_plan_shape(spark, sf001):
    """Weight/total/doc-lang joins broadcast (no shuffled join); final
    top-k plans as TakeOrderedAndProject, not a global sort."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    plan = (
        registry.QUERIES["c15_dsir_select"](spark, sf001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_semdedup_drops_planted_semantic_twin(spark, sf001):
    """c21's greedy rule: a vector nearly identical to a lower-id vector
    in the same cell is dropped; the lower-id original is kept."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.plans import registry

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    # Plant a twin of vec 100 with a huge id (sorts after everything).
    twin = emb.filter("vec_id = 100").select(
        F.lit(999999).cast("long").alias("vec_id"),
        "embedding",
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
    import tempfile

    d = tempfile.mkdtemp()
    emb.unionByName(twin.select(emb.columns)).write.parquet(
        f"{d}/embeddings.parquet"
    )
    for t in ("documents",):
        spark.read.parquet(f"{sf001}/{t}.parquet").write.parquet(
            f"{d}/{t}.parquet"
        )
    base = {r["cell"]: r for r in
            registry.QUERIES["c21_semdedup_keep"](spark, sf001).collect()}
    with_twin = {r["cell"]: r for r in
                 registry.QUERIES["c21_semdedup_keep"](spark, d).collect()}
    # Exactly one extra vector entered, and it was dropped (cos=1 to 100).
    assert sum(r["n_vectors"] for r in with_twin.values()) == \
           sum(r["n_vectors"] for r in base.values()) + 1
    assert sum(r["n_dropped"] for r in with_twin.values()) == \
           sum(r["n_dropped"] for r in base.values()) + 1


def test_unimax_matches_sequential_waterfill(spark):
    # The closed form (alloc = min(cap, λ)) must reproduce the paper's
    # sequential ascending-capacity scan exactly, including the
    # all-capacity regime (budget > Σcap) and singleton groups.
    import random

    rng = random.Random(77)
    for trial in range(4):
        sizes = [(f"g{i:02d}", rng.randint(1, 5000)) for i in range(rng.randint(1, 12))]
        epochs = rng.choice([1, 2, 3])
        df = spark.createDataFrame(sizes, ["lang", "chars"])
        out = {
            r["grp"]: r["alloc"]
            for r in C.unimax_allocation(
                df, group_col="lang", size_col="chars", max_epochs=epochs
            ).collect()
        }
        # sequential reference model
        total = sum(s for _, s in sizes)
        budget = (total * 3) // 5
        caps = sorted(((s * epochs, g) for g, s in sizes))
        remaining, left = float(budget), len(caps)
        expect = {}
        for cap, g in caps:
            fair = remaining / left
            a = min(float(cap), fair)
            expect[g] = a
            remaining -= a
            left -= 1
        for g, a in expect.items():
            assert math.isclose(out[g], a, rel_tol=0, abs_tol=5e-6), (
                trial, g, out[g], a
            )
        # conservation: allocations spend min(budget, total capacity)
        assert math.isclose(
            sum(out.values()),
            min(float(budget), float(sum(c for c, _ in caps))),
            abs_tol=1e-4,
        )


def test_canonical_by_quality_argmax_and_ties(spark):
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)],
        ["doc_id", "q"],
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        ["doc_id", "cluster_id"],
    )
    rows = {
        r["cluster_id"]: r
        for r in C.canonical_by_quality(
            docs, clusters, F.col("q")
        ).collect()
    }
    # cluster 1: quality argmax (2 beats 1), id tie-break (2 beats 3)
    assert rows[1]["keep_id"] == 2 and rows[1]["moved"] is True
    assert rows[1]["n_members"] == 3
    # cluster 10: tie on quality -> min id, same as min-id policy
    assert rows[10]["keep_id"] == 10 and rows[10]["moved"] is False


def test_packing_sweep_matches_per_budget_pack(spark, sf001):
    """Each sweep row must equal a standalone pack_sequences run at that
    budget (sum over blocks), so the one-scan sweep is exact."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    sweep = {
        r["budget"]: r
        for r in registry.QUERIES["c26_packing_sweep"](spark, sf001).collect()
    }
    for budget in (128, 1024):
        blocks = C.pack_sequences(docs, budget=budget, block_rows=256).collect()
        assert sweep[budget]["n_sequences"] == sum(
            b["n_sequences"] for b in blocks
        )
        assert sweep[budget]["n_split_docs"] == sum(
            b["n_split_docs"] for b in blocks
        )
        assert sweep[budget]["n_docs"] == sum(b["n_docs"] for b in blocks)
        assert sweep[budget]["total_tokens"] == sum(
            b["n_tokens"] for b in blocks
        )
    # monotonicity: a larger budget can only reduce the sequence count
    bs = sorted(sweep)
    for a, b in zip(bs, bs[1:]):
        assert sweep[a]["n_sequences"] >= sweep[b]["n_sequences"]


def test_unimax_apply_realizes_the_plan(spark, sf001):
    """Capacity-capped languages (rate = 1.0, epochs = 2 means alloc may
    exceed corpus — rate clamps) keep everything; sampled languages land
    within sampling noise of the planned allocation; kept <= corpus."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["c27_unimax_apply"](spark, sf001).collect()
    assert rows
    for r in rows:
        assert r["kept_chars"] <= r["corpus_chars"]
        assert r["kept_docs"] > 0
        # realized/planned within 35% at sf0.01 doc counts (70-220 docs
        # per lang -> binomial noise); exact-keep langs hit the cap.
        if r["alloc_chars"] >= r["corpus_chars"]:
            assert r["kept_chars"] == r["corpus_chars"]
        else:
            assert 0.6 < r["realized_over_planned"] < 1.4


def test_leakage_free_split_invariants(spark, sf001):
    """cluster_leaks == 0 is BY CONSTRUCTION (the cluster hash routes
    whole components together); the naive split must show the leaks the
    operator exists to prevent on this corpus, and the cluster-aware
    train fraction stays within a few points of the naive 0.8."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    r = registry.QUERIES["c28_leakage_free_split"](spark, sf001).first()
    assert r["cluster_leaks"] == 0
    assert r["naive_leaks"] > 0
    assert abs(r["train_frac_cluster"] - r["train_frac_naive"]) < 0.05
    assert r["n_clusters"] < r["n_docs"]


def test_converged_raises_when_max_rounds_exhausted(spark):
    """Round-4 ADVICE: exhausting max_rounds without reaching the
    star-forest fixpoint must RAISE — the final hi->lo join would
    otherwise emit duplicate doc_ids with conflicting cluster_ids,
    silently. A 33-node path cannot flatten in one star round; the same
    graph converges to the min-label component once the bound is
    adequate."""
    chain = [(i, i + 1) for i in range(32)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="fixpoint not reached"):
        C.dup_clusters_converged(pairs, max_rounds=1)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in C.dup_clusters_converged(pairs, max_rounds=16).collect()
    }
    assert got == {i: 0 for i in range(33)}
