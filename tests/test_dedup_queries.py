"""Dedup suite: oracle parity + LSH recall against the exact baseline."""

from __future__ import annotations

import pytest

from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

DEDUP_QUERIES = [n for n in registry.QUERIES if n.startswith("d")]


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_oracle_parity(spark, sf001, name):
    if name not in registry.ORACLES:
        pytest.skip("rows-only query")
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)


def test_lsh_recall_on_planted_dups(spark, sf001):
    """LSH must recover ~all high-similarity pairs the exact scan finds."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in registry.QUERIES["d02_jaccard_pairs_exact"](spark, sf001).collect()
        if r["jaccard"] >= 0.8
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in registry.QUERIES["d03_minhash_lsh_pairs"](spark, sf001).collect()
    }
    assert exact, "expected planted near-duplicates in the test corpus"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} on j>=0.8 pairs"


def test_embedding_neardup_blocked_recall(spark, sf001):
    """d06's IVF-cell blocking must recover ≥90% of the true cosine ≥ τ
    pairs an exact all-pairs scan finds (measured 0.948 at sf0.01), and
    every emitted pair must be genuine (precision 1.0 — the verify stage
    is exact)."""
    from mtg_vector_db_spark.functions.vector import cosine_similarity
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    sim = F.round(cosine_similarity(F.col("e_a"), F.col("e_b")), 6)
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.35)
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in registry.QUERIES["d06_embedding_neardup"](spark, sf001).collect()
    }
    assert truth, "expected cosine >= tau pairs in the corpus"
    assert got <= truth, "blocked pipeline emitted a non-genuine pair"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"blocked recall {recall}"


def test_simhash_separates_neardups(spark, sf001):
    rows = registry.QUERIES["d05_simhash_neardup"](spark, sf001).collect()
    assert rows, "expected simhash near-dup pairs on planted duplicates"
    assert all(r["hamming"] <= 10 for r in rows)


def test_bucket_cap_guards_skew_but_keeps_planted_pairs(spark, sf001):
    """With a generous cap the planted near-dups still surface; candidates
    from degenerate hot buckets are dropped (subset of the uncapped run)."""
    from mtg_vector_db_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    uncapped = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, max_bucket_size=50).collect()
    }
    assert capped <= uncapped
    assert capped  # the planted duplicate pairs survive a 50-row cap

    fps = simhash_fingerprints(docs)
    un = {(r["id_a"], r["id_b"]) for r in simhash_neardup_pairs(fps).collect()}
    cp = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(fps, max_bucket_size=50).collect()
    }
    assert cp <= un and cp

def test_incremental_neardup_consistent_with_full_lsh(spark, sf001):
    """d09 (batch-vs-corpus asymmetric LSH) must find exactly the d03
    (full all-pairs LSH) pairs that cross the batch/corpus split — the
    incremental formulation changes the work shape, not the answer."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.functions.text import hash_fraction
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    u = hash_fraction(F.concat(F.col("doc_id").cast("string"), F.lit(":inc")))
    new_ids = {r["doc_id"] for r in docs.filter(u < 0.2).select("doc_id").collect()}

    full = {
        frozenset((r["id_a"], r["id_b"]))
        for r in registry.QUERIES["d03_minhash_lsh_pairs"](spark, sf001).collect()
        if (r["id_a"] in new_ids) != (r["id_b"] in new_ids)
    }
    inc = {
        frozenset((r["id_new"], r["id_existing"]))
        for r in registry.QUERIES["d09_incremental_neardup"](spark, sf001).collect()
    }
    assert inc == full


def test_xxhash_fast_path_equivalent_candidates(spark, sf001):
    """The xxhash64 production hash family must find the same verified
    near-dup pairs as the oracle-replayable md5 family (both end with
    the identical exact-Jaccard verify, so differences could only come
    from candidate recall — any uniform hash family should surface the
    same high-similarity pairs through 4 bands)."""
    from mtg_vector_db_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(docs, verify_threshold=0.5).collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(
            docs, verify_threshold=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert md5_pairs, "expected planted near-duplicates"
    # Identical verify threshold → both sets contain only true pairs;
    # candidate recall may differ slightly per family, never collapse.
    inter = len(md5_pairs & xx_pairs)
    assert inter / len(md5_pairs) >= 0.9
    assert inter / len(xx_pairs) >= 0.9


def test_gemm_pair_verify_matches_fold(spark, sf001):
    """The Arrow-GEMM pair-cosine kernel must agree with the sequential
    HOF fold (the oracle-replayable default) after 6-digit rounding on
    the d06 candidate set — the same fast-family discipline as xxhash64
    MinHash."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.functions.vector import dot, l2_normalize
    from mtg_vector_db_spark.operators.ann import ivf_multi_assign, pair_cosine_gemm

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    blocked = ivf_multi_assign(emb, seeds, nprobe=3)
    a = blocked.select(F.col("vec_id").alias("id_a"), "cell")
    b = blocked.select(F.col("vec_id").alias("id_b"), "cell")
    cand = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    nx = emb.select("vec_id", l2_normalize(F.col("embedding")).alias("nx"))
    ea = nx.select(F.col("vec_id").alias("id_a"), F.col("nx").alias("nx_a"))
    eb = nx.select(F.col("vec_id").alias("id_b"), F.col("nx").alias("nx_b"))
    fold = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a", "id_b", F.round(dot(F.col("nx_a"), F.col("nx_b")), 6).alias("sim")
        )
        .collect()
    }
    gemm = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in pair_cosine_gemm(cand, emb).collect()
    }
    assert fold.keys() == gemm.keys()
    diffs = [k for k in fold if fold[k] != gemm[k]]
    assert not diffs, f"{len(diffs)} pair sims differ, e.g. {diffs[:3]}"


def test_dedup_corpus_families_total_on_empty_tables(spark, tmp_path):
    """Every dedup/corpus/text/pipeline query must be TOTAL on empty
    inputs — an empty corpus (or an index not yet built) yields an empty
    (or zero-valued) result, never a plan-time exception. Guards the
    empty-centroid-literal class of failure (ann._cents_literal)."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "empty")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    names = [
        n
        for n in registry.QUERIES
        if n[0] in "dc"
        or n.startswith("t0")
        or n in ("p19_corpus_build_e2e", "p24_decontaminated_corpus_build",
                 "p25_payload_dedup")
    ]
    for n in sorted(names):
        registry.QUERIES[n](spark, d).count()  # must not raise


def test_pagerank_ranks_planted_hub_highest(spark):
    """A star graph's hub must out-rank every leaf; symmetric cliques
    tie exactly (DECIMAL-exact sums make ties deterministic)."""
    from mtg_vector_db_spark.operators.corpus import pagerank_fixed

    pairs = [(0, i) for i in range(1, 7)]  # star: 0 is the hub
    pairs += [(10, 11)]  # detached 2-clique
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    pr = {r["doc_id"]: r["pr"] for r in pagerank_fixed(df, iters=3).collect()}
    assert pr[0] == max(pr.values())
    leaf_vals = {round(pr[i], 12) for i in range(1, 7)}
    assert len(leaf_vals) == 1  # symmetric leaves tie exactly
    assert round(pr[10], 12) == round(pr[11], 12)
    assert abs(sum(pr.values()) - 1.0) < 0.2  # mass approximately conserved


def test_paragraph_dedup_drops_planted_boilerplate(spark):
    """CCNet paragraph dedup: a boilerplate paragraph repeated across
    docs survives only in its first (lowest doc_id, pos) occurrence;
    unique paragraphs all survive; reassembly preserves token order."""
    from mtg_vector_db_spark.operators.dedup import paragraph_dedup

    boiler = "subscribe to our newsletter for updates every day"  # 8 toks
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, "iota kappa lambda mu nu xi omicron pi " + boiler),
        (3, boiler),
        (4, "rho sigma tau upsilon phi chi psi omega"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           paragraph_dedup(docs, para_tokens=8).collect()}
    # doc 1 holds the first occurrence: everything kept.
    assert out[1]["n_kept"] == out[1]["n_paras"] == 2
    assert out[1]["text_kept"].startswith("subscribe")
    # docs 2/3 lose exactly the boilerplate paragraph.
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    assert "subscribe" not in out[2]["text_kept"]
    assert out[2]["text_kept"].startswith("iota")
    assert out[3]["n_kept"] == 0 and out[3]["text_kept"] == ""
    # unique doc untouched.
    assert out[4]["n_kept"] == out[4]["n_paras"] == 1
    assert out[4]["text_kept"] == rows[3][1]


def test_paragraph_dedup_is_case_insensitive_on_fingerprint(spark):
    """The dedup key is the normalized fingerprint: a case-variant
    repeat is dropped, but the KEPT text preserves original casing."""
    from mtg_vector_db_spark.operators.dedup import paragraph_dedup

    para = "The Quick Brown Fox Jumps Over The Dog"
    docs = spark.createDataFrame(
        [(1, para), (2, para.lower())], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           paragraph_dedup(docs, para_tokens=8).collect()}
    assert out[1]["n_kept"] == 1 and out[1]["text_kept"] == para
    assert out[2]["n_kept"] == 0


def test_dynamic_seed_cells_grow_with_corpus(spark):
    """Cell count is greatest(min_cells, ceil(n / target)): 8 at the
    sf0.01 oracle anchor (500 vectors), 80 at the sf1 fixture scale
    (20k) — the measured linear-vs-quadratic d06 lever in SCALE.md."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.ann import dynamic_seed_cells

    def emb_of(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.col("id").cast("double")).alias(
                "embedding"
            ),
        )

    for n, want in [(1, 8), (500, 8), (2000, 8), (20000, 80), (20001, 81)]:
        got = dynamic_seed_cells(emb_of(n)).count()
        assert got == min(want, n), (n, got, want)
    # The seeds are the LOWEST ids, so the assignment rule is replayable.
    cells = sorted(
        r["cell"] for r in dynamic_seed_cells(emb_of(5000)).collect()
    )
    assert cells == list(range(20))


def test_winnow_guarantee_and_density(spark):
    """Winnowing contract (k=5, w=4): two documents sharing a run of
    >= w+k-1 = 8 tokens MUST share a fingerprint; fingerprint count is
    at most the window count; disjoint docs share nothing."""
    from mtg_vector_db_spark.operators.dedup import winnow_fingerprints

    shared_run = "q w e r t y u i"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"a b c d e {shared_run} f g h j k"),
            (2, f"z x c v b n m {shared_run} l o p"),
            (3, "one two three four five six seven eight nine ten"),
            (4, "tiny doc"),  # fewer tokens than k: no grams, no fps
        ],
        ["doc_id", "text"],
    )
    fp = winnow_fingerprints(docs, k=5, w=4)
    rows = fp.collect()
    by_doc: dict[int, set] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fp"
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])
    assert 4 not in by_doc  # sub-k doc emits nothing
    for d in (1, 2, 3):
        n_tokens = len(docs.where(f"doc_id={d}").first()["text"].split())
        n_windows = n_tokens - 5 + 1 - (4 - 1)
        assert 1 <= len(by_doc[d]) <= n_windows


def test_lsh_recall_report_consistency(spark, sf001):
    """ALL row equals the sum of buckets; recall in (0,1]; precision is
    the verify-step guarantee (exactly 1.0)."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["d17_lsh_recall_report"](spark, sf001).collect()
    assert rows
    all_row = next(r for r in rows if r["bucket"] == "ALL")
    buckets = [r for r in rows if r["bucket"] != "ALL"]
    assert all_row["n_true"] == sum(r["n_true"] for r in buckets)
    assert all_row["n_found"] == sum(r["n_found"] for r in buckets)
    for r in rows:
        assert 0 < r["recall"] <= 1.0
        assert r["n_found"] <= r["n_true"]
        assert r["precision"] == 1.0


def test_containment_detects_embedded_quote(spark):
    """A short doc fully embedded in a longer one scores containment 1.0
    in the short→long direction, while the reverse direction (and the
    Jaccard detector at the same threshold) miss it."""
    from mtg_vector_db_spark.operators.dedup import (
        containment_pairs,
        exact_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote} {filler}"), (3, filler)],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert got.get((1, 2)) == 1.0      # quote fully inside the long doc
    assert (2, 1) not in got           # reverse direction is tiny
    jac = exact_jaccard_pairs(docs, threshold=0.5).collect()
    assert not [r for r in jac if {r["id_a"], r["id_b"]} == {1, 2}]


def test_minhash_k_sweep_error_shrinks_with_k(spark, sf001):
    """Estimator MAE is (weakly) decreasing in signature size, the
    estimate is unbiased-ish (|bias| < MAE), and all four sweep points
    score the same pair set."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["d19_minhash_k_sweep"](spark, sf001).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [4, 8, 16, 32]
    assert len({r["n_pairs"] for r in rows}) == 1
    maes = [r["mae"] for r in rows]
    assert maes[0] >= maes[-1]           # 4-hash noisier than 32-hash
    for r in rows:
        assert abs(r["bias"]) <= r["mae"] + 1e-9


def test_novel_token_budget_consistent_with_d07(spark, sf001):
    """Corpus-wide covered_tokens equals the sum of d07's per-doc
    coverage; novel + covered = total; ratios in (0, 1]."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["d20_novel_token_budget"](spark, sf001).collect()
    assert rows
    d07 = registry.QUERIES["d07_repeated_ngram_spans"](
        spark, sf001
    ).collect()
    assert sum(r["covered_tokens"] for r in rows) == sum(
        r["covered_tokens"] for r in d07
    )
    for r in rows:
        assert r["novel_tokens"] + r["covered_tokens"] == r["total_tokens"]
        assert 0 < r["novel_ratio"] <= 1.0


def test_chaining_audit_flags_planted_chain(spark):
    """A planted a-b-c chain where a and c share nothing shows density
    2/3 and carries both edges; a clique shows density 1.0."""
    from mtg_vector_db_spark.operators import corpus as C
    from mtg_vector_db_spark.operators.dedup import exact_jaccard_pairs

    mid = "m1 m2 m3 m4 m5 m6"
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 a4 {mid}"),          # shares mid with 2
            (2, f"{mid} z9 z8"),                 # bridge doc
            (3, f"c1 c2 c3 c4 {mid}"),          # shares mid with 2 AND 1?
        ],
        ["doc_id", "text"],
    )
    pairs = exact_jaccard_pairs(docs, threshold=0.3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    clusters = C.dup_clusters(pairs, iters=3)
    lab = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    # All three chain into one cluster regardless of which edges exist;
    # the audit's density column records how complete the clique is.
    assert len(set(lab.values())) == 1
    n, e = 3, len(got)
    density = 2.0 * e / (n * (n - 1))
    assert 0 < density <= 1.0


def test_method_matrix_union_dominates_arms(spark, sf001):
    """'any' >= every single method; all five methods always present
    (zero-filled); fractions in [0, 1]."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = {
        r["method"]: r
        for r in registry.QUERIES["d22_dedup_method_matrix"](
            spark, sf001
        ).collect()
    }
    assert set(rows) == {
        "any", "containment_080", "exact_md5", "jaccard_050", "winnow_span"
    }
    for m, r in rows.items():
        assert 0 <= r["flagged_frac"] <= 1.0
        if m != "any":
            assert r["flagged_docs"] <= rows["any"]["flagged_docs"]


def test_banding_sweep_monotone_in_bands(spark, sf001):
    """More, shorter bands can only ADD candidate pairs: band
    boundaries nest (32 = 2×16 = 4×8 = ...), so a full r-row band match
    implies both its r/2-row halves match as full bands at 2× the band
    count — candidates(b) ⊆ candidates(2b) is a theorem here, so both
    recall and cost must be monotone in bands, and recall ≤ 1."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["d23_lsh_banding_sweep"](spark, sf001).collect(),
        key=lambda r: r["bands"],
    )
    assert [r["bands"] for r in rows] == [2, 4, 8, 16]
    assert [r["rows_per_band"] for r in rows] == [16, 8, 4, 2]
    recs = [r["candidate_recall"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert recs == sorted(recs) and cands == sorted(cands)
    assert all(0 <= x <= 1 for x in recs)
    assert len({r["n_true"] for r in rows}) == 1


def test_edit_distance_verify_is_order_sensitive(spark):
    """The Levenshtein verify sees ORDER: a reversed-word copy shares the
    exact bag of tokens (identical SimHash → hamming 0 → candidate) but
    scores low edit similarity and is dropped, while a one-word in-place
    mutation survives with edit_sim near 1."""
    from mtg_vector_db_spark.operators.dedup import edit_distance_neardup_pairs

    import hashlib

    words = [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in range(120)]
    base = " ".join(words)
    mutated = " ".join(words[:60] + ["CHANGED"] + words[61:])
    reversed_ = " ".join(reversed(words))
    docs = spark.createDataFrame(
        [(1, base), (2, mutated), (3, reversed_)], ["doc_id", "text"]
    )
    rows = {
        (r["id_a"], r["id_b"]): r["edit_sim"]
        for r in edit_distance_neardup_pairs(docs, min_sim=0.0).collect()
    }
    assert rows[(1, 3)] < 0.62 < rows[(1, 2)], rows
    kept = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_neardup_pairs(docs).collect()
    }
    assert (1, 2) in kept and (1, 3) not in kept


def test_edit_distance_default_keeps_char_semantics(spark):
    """The operator DEFAULT (ascii_fold=False) must count CHARACTER
    edits: 'abc中文' -> 'abcxy' is 2 substitutions, not the 6-byte edit
    a byte-granular DP would report. Pins the semantic the ascii_fold
    engine-parity form (registered d24) deliberately trades away, so the
    fold can never silently become the default."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.levenshtein(F.lit("abc中文"), F.lit("abcxy")).alias("chars"),
            F.levenshtein(
                F.regexp_replace(F.lit("abc中文"), "[^\\x00-\\x7F]", "\x7f"),
                F.lit("abcxy"),
            ).alias("folded"),
        )
        .first()
    )
    assert row["chars"] == 2
    # the fold keeps 1:1 char granularity too (sentinel vs x / y).
    assert row["folded"] == 2
