"""Text-query correctness + pg_trgm golden values + tier gating."""

from __future__ import annotations

import pytest

from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

TEXT_QUERIES = [n for n in registry.QUERIES if n.startswith("t")]


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_oracle_parity(spark, sf001, name):
    if name not in registry.ORACLES:
        pytest.skip("rows-only query")
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)


# pg_trgm golden values, hand-computed per the documented algorithm and
# cross-checked against PostgreSQL's pg_trgm behavior for these inputs.
@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("word", "word", 1.0),
        # trigrams('word') = {'  w',' wo','wor','ord','rd '} (5)
        # trigrams('words') = {'  w',' wo','wor','ord','rds','ds '} (6)
        # shared: '  w',' wo','wor','ord' = 4; union = 7 → 4/7
        ("word", "words", 4 / 7),
        ("", "word", 0.0),
        ("word", "", 0.0),
        # case-insensitive
        ("WORD", "word", 1.0),
        # multi-word: same word set → identical trigram set
        ("blue bolt", "bolt blue", 1.0),
    ],
)
def test_trigram_goldens(spark, a, b, expected):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.trigram import trigram_similarity

    got = (
        spark.range(1)
        .select(trigram_similarity(F.lit(a), F.lit(b)).alias("s"))
        .first()["s"]
    )
    assert abs(got - expected) < 1e-12, (a, b, got, expected)


def test_tier_selection(spark, sf001):
    exact = registry.QUERIES["t02_tiered_exact"](spark, sf001).collect()
    assert exact and all(r["match_type"] == "exact" for r in exact)
    prefix = registry.QUERIES["t03_tiered_prefix"](spark, sf001).collect()
    assert prefix and all(r["match_type"] == "prefix" for r in prefix)
    fuzzy = registry.QUERIES["t04_tiered_fuzzy"](spark, sf001).collect()
    assert fuzzy and all(r["match_type"] == "fuzzy" for r in fuzzy)
    assert fuzzy[0]["p_name"] == "blue bolt"


def test_repetition_gate_fires_on_planted_loop(spark):
    """A pathological looping doc is dropped; diverse text is kept, and
    short docs (no 5-grams) don't crash the profile."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )

    looped = "buy now " * 50
    diverse = (
        "the quick brown fox jumps over a lazy dog while seventeen "
        "violet zeppelins drift quietly beyond the old harbor wall"
    )
    docs = spark.createDataFrame(
        [(1, looped), (2, diverse), (3, "too short"), (4, "solo")],
        ["doc_id", "text"],
    )
    prof = {
        r["doc_id"]: r for r in doc_repetition_profile(docs).collect()
    }
    assert not prof[1]["keep"]
    assert prof[1]["top2_frac"] > 0.4 and prof[1]["dup5_frac"] > 0.9
    assert prof[2]["keep"] and prof[2]["dup5_frac"] == 0.0
    # 2 tokens: bigram metrics defined, 3/5-gram metrics default to 0.
    assert prof[3]["top3_frac"] == 0.0 and prof[3]["dup5_frac"] == 0.0
    # 1 token: no n-grams at all — the profile is total, scores 0.0,
    # and the gate passes the doc (round-3 ADVICE fix).
    assert prof[4]["keep"]
    assert prof[4]["top2_frac"] == 0.0 and prof[4]["dup5_frac"] == 0.0


def test_repetition_profile_plan_shape(spark):
    """One gram-grain shuffle + one doc-grain reduce; no joins, no
    windows, map-side partial aggregation present."""
    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        doc_repetition_profile(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    # widen() repartition (under-split input), gram agg, (doc,n) agg,
    # doc agg.
    assert plan.count("Exchange") <= 4


def test_nb_classifier_learns_disjoint_vocab(spark):
    """With class-disjoint vocabularies the in-engine Naive Bayes must
    classify every held-out doc correctly (the driver corpus shares one
    vocab across langs, so t24's confusion there is majority-ish — this
    pins that the operator itself learns when signal exists)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.nbayes import nb_train_apply

    rows = []
    for i in range(40):
        rows.append((i * 2, "aa", "alpha beta gamma delta " * 3))
        rows.append((i * 2 + 1, "bb", "omega psi chi phi " * 3))
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    pred = nb_train_apply(docs, F.col("doc_id") >= 10).collect()
    held = [r for r in pred]
    assert len(held) == 10  # doc_id 0..9 held out
    assert all(r["predicted"] == r["lang"] for r in held)


def test_nb_langid_plan_shape(spark, sf001):
    """Model tables broadcast into the scoring pass; no shuffled join on
    the token stream beyond the (doc, class) reduce."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    plan = (
        registry.QUERIES["t24_nb_langid"](spark, sf001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_nb_counts_merge_equals_recount(spark):
    """Incremental training invariant: merging the sufficient-statistic
    tables of two corpus halves equals counting the union — so the NB
    model absorbs appended data without re-scanning history."""
    from mtg_vector_db_spark.operators.nbayes import nb_counts, nb_merge

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lo = docs.filter("doc_id < 250")
    hi = docs.filter("doc_id >= 250")
    merged = sorted(
        tuple(r) for r in nb_merge(nb_counts(lo), nb_counts(hi)).collect()
    )
    full = sorted(tuple(r) for r in nb_counts(docs).collect())
    assert merged == full and len(full) > 5


def test_new_text_operators_survive_adversarial_docs(spark):
    """Null text, empty strings, unicode, emoji, and pathological tokens
    must not crash the round-2 text operators; outputs stay sane."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.importance import dsir_scores
    from mtg_vector_db_spark.operators.nbayes import nb_train_apply
    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )

    rows = [
        (1, None, "en"),
        (2, "", "en"),
        (3, "   ", "en"),
        (4, "é ü ß 中文 token 中文 é ü", "zh"),
        (5, "😀 😀 😀 😀 😀 😀", "en"),
        (6, "x" * 5000 + " " + "x" * 5000, "en"),
        (7, "normal words appear here normal words appear here", "en"),
        (8, "a b a b a b a b a b a b", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    prof = {r["doc_id"]: r for r in doc_repetition_profile(docs).collect()}
    # Docs with <2 tokens (null/empty/1-token): total profile — a row
    # with 0.0 metrics and keep=true (the gate has no evidence).
    for short_id in (1, 2, 3):
        assert prof[short_id]["keep"]
        assert prof[short_id]["top2_frac"] == 0.0
        assert prof[short_id]["dup5_frac"] == 0.0
    assert 0.0 <= prof[4]["top2_frac"] <= 1.0
    assert prof[5]["top2_frac"] == 1.0  # single repeated emoji bigram
    assert not prof[8]["keep"]  # planted loop

    scores = dsir_scores(docs, F.col("lang") == "en").collect()
    ids = {r["doc_id"] for r in scores}
    assert 1 not in ids and 2 not in ids  # token-less docs unscored
    assert {4, 5, 6, 7, 8} <= ids
    assert all(r["n_tokens"] > 0 for r in scores)

    pred = nb_train_apply(docs, F.col("doc_id") != 4).collect()
    assert len(pred) == 1 and pred[0]["doc_id"] == 4
    assert pred[0]["predicted"] in {"en", "zh", "de"}


def test_sql_udfs_match_column_implementations(spark, sf001):
    """The catalog-registered SQL scalar functions equal the Column
    builders row-for-row on the corpus (including empty/degenerate
    docs), so SQL-surface users get identical numbers."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions import textstats as TSS
    from mtg_vector_db_spark.functions.sqludf import register_sql_functions
    from mtg_vector_db_spark.functions.text import hash_fraction

    names = register_sql_functions(spark)
    assert "mvdb_quality" in names

    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(200)
    extra = spark.createDataFrame(
        [(9001, ""), (9002, "   "), (9003, "???!!!")],
        ["doc_id", "text"],
    )
    docs = docs.select("doc_id", "text").unionByName(extra)
    docs.createOrReplaceTempView("sqludf_docs")

    # Multiple lambda-bearing SQL UDFs over a Union child need the
    # documented RemoveRedundantAliases exclusion (sqludf.py docstring).
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.RemoveRedundantAliases",
    )

    via_sql = spark.sql(
        """SELECT doc_id, mvdb_token_count(text) AS tc,
                  mvdb_stopword_ratio(text) AS sw,
                  mvdb_noise_ratio(text) AS nz,
                  mvdb_quality(text) AS q,
                  mvdb_hash_frac(CAST(doc_id AS STRING)) AS hf
           FROM sqludf_docs"""
    ).collect()
    via_col = docs.select(
        "doc_id",
        TSS.token_count(F.col("text")).alias("tc"),
        TSS.stopword_ratio(F.col("text")).alias("sw"),
        TSS.non_alnum_ratio(F.col("text")).alias("nz"),
        TSS.quality_score(F.col("text")).alias("q"),
        hash_fraction(F.col("doc_id")).alias("hf"),
    ).collect()
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    a = {r["doc_id"]: tuple(r)[1:] for r in via_sql}
    b = {r["doc_id"]: tuple(r)[1:] for r in via_col}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])


def test_t27_heaps_parity_on_growing_vocabulary(spark, tmp_path):
    """Round-3 ADVICE: the sf fixtures' vocabulary saturates within the
    first prefix bucket, which masked a cast-rounding divergence (Spark's
    double→int cast truncates, DuckDB's rounds to nearest). This corpus
    keeps introducing new types through every bucket, and n_docs=20 makes
    step=2 so every odd first_doc lands on an x.5 quotient — bucket
    assignment breaks parity unless the oracle floors before casting."""
    import shutil

    import pandas as pd

    d = tmp_path / "grow"
    d.mkdir()
    rows = []
    for i in range(20):
        # 'common' repeats everywhere; i+1 fresh types per doc so V(n)
        # grows in every prefix bucket (beta stays well above zero).
        toks = ["common"] * 3 + [f"w{i}x{j}" for j in range(i + 1)]
        text = " ".join(toks)
        rows.append((i, text, "en", "synth", len(text)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(d / "documents.parquet")
    src = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")

    df = registry.QUERIES["t27_heaps_fit"](spark, str(d))
    assert_matches_oracle(df, registry.ORACLES["t27_heaps_fit"], str(d))
    row = df.collect()[0]
    assert row["heaps_beta"] > 0.1  # vocabulary genuinely grows
    assert row["n_points"] == 10  # all ten prefix buckets populated


def test_nb_prior_only_fallback_for_tokenless_heldout(spark):
    """Round-3 ADVICE: a held-out doc whose text tokenizes to nothing
    must still appear in the prediction output — with prior-only scores
    (one row per class) and a majority-prior argmax — instead of being
    silently dropped by the token explode."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.nbayes import (
        nb_doc_scores,
        nb_train_apply,
    )

    rows = [(i, "aa", f"alpha beta tok{i}") for i in range(12)]
    rows += [(100 + i, "bb", f"omega psi tok{i}") for i in range(4)]
    # Held out: one empty, one whitespace-only, one null text.
    rows += [(900, "bb", ""), (901, "aa", "   "), (902, "bb", None)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    held = F.col("doc_id") >= 900

    scores = nb_doc_scores(docs, ~held).collect()
    by_doc = {}
    for r in scores:
        by_doc.setdefault(r["doc_id"], {})[r["cls"]] = r["score"]
    for d in (900, 901, 902):
        assert set(by_doc[d]) == {"aa", "bb"}  # one row per class
        # prior-only: class 'aa' trained on 12 docs vs 4 → higher prior
        assert by_doc[d]["aa"] > by_doc[d]["bb"]

    pred = {r["doc_id"]: r["predicted"]
            for r in nb_train_apply(docs, ~held).collect()}
    assert set(pred) == {900, 901, 902}  # one row per held-out doc
    assert all(p == "aa" for p in pred.values())  # majority prior


def test_ccnet_buckets_are_balanced_terciles(spark, sf001):
    """t28: per language the three buckets differ by ≤1 doc, and mean
    perplexity is monotone head ≤ middle ≤ tail (that ordering is the
    whole point of the CCNet split)."""
    rows = registry.QUERIES["t28_ccnet_buckets"](spark, sf001).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) == {0, 1, 2}, lang
        sizes = [b[i]["n_docs"] for i in (0, 1, 2)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert b[0]["avg_bpc"] <= b[1]["avg_bpc"] <= b[2]["avg_bpc"], lang


def test_word_ngrams_multiset_counts(spark):
    """word_ngrams keeps repetition (multiset), emits len-n+1 grams, and
    is empty (not malformed) for docs shorter than n tokens."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.textstats import word_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["g1"], r["g2"], r["g3"])
        for r in df.select(
            "doc_id",
            word_ngrams(F.col("text"), 1).alias("g1"),
            word_ngrams(F.col("text"), 2).alias("g2"),
            word_ngrams(F.col("text"), 3).alias("g3"),
        ).collect()
    }
    assert out[1][0] == ["a", "b", "a", "b", "a"]
    assert out[1][1] == ["a b", "b a", "a b", "b a"]
    assert out[1][2] == ["a b a", "b a b", "a b a"]
    assert out[2] == (["x"], [], [])
    assert out[3] == ([], [], [])
    assert out[4][1] == [] if out[4][1] is not None else True


def test_bpe_sentinel_replace_is_greedy_left_to_right(spark):
    """The t36 merge step's correctness rests on two engine facts, pinned
    here for Spark (the DuckDB side is the same call in the oracle):
    replace() scans left-to-right over non-overlapping occurrences (which
    IS greedy BPE merge order), and the single-pad/double-separator
    sentinel encoding anchors complete symbols, so a pair whose x is the
    suffix of a longer symbol never false-matches."""
    s = "\x1f"
    row = spark.sql(
        f"SELECT replace('{s}a{s}{s}a{s}{s}a{s}{s}a{s}',"
        f" '{s}a{s}{s}a{s}', '{s}aa{s}') AS greedy,"
        f" replace('{s}ba{s}{s}b{s}', '{s}a{s}{s}b{s}', '{s}ab{s}') AS anchored"
    ).collect()[0]
    # [a,a,a,a] + merge(a,a) -> [aa, aa], NOT [aa, a, a] or overlap chaos.
    assert row["greedy"] == f"{s}aa{s}{s}aa{s}"
    # [ba, b] contains no (a, b) adjacency; 'a' inside 'ba' must not match.
    assert row["anchored"] == f"{s}ba{s}{s}b{s}"


def test_t36_bpe_merge_train_structure(spark, sf001):
    """Six rounds, each merged symbol is the concat of its pair, counts
    are positive, and at least one later round consumes an earlier
    round's product (the property that distinguishes multi-round TRAINING
    from t23's one-iteration pair count)."""
    from mtg_vector_db_spark.plans import registry

    rows = registry.QUERIES["t36_bpe_merge_train"](spark, sf001).collect()
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert all(r["merged"] == r["x"] + r["y"] for r in rows)
    assert all(r["cnt"] > 0 for r in rows)
    produced = {r["merged"] for r in rows}
    assert any(
        (r["x"] in produced and len(r["x"]) > 1)
        or (r["y"] in produced and len(r["y"]) > 1)
        for r in rows[1:]
    )


def test_t37_encode_consistent_with_t36_merges(spark, sf001):
    """The encode side must reflect the learned merges: every language's
    tokens_per_word is strictly below the unmerged (character-level)
    baseline, n_chars/n_tokens bounds hold (each token >= 1 char, each
    word >= 1 token), and the reported ratios are exactly the quotient of
    the reported sums."""
    from mtg_vector_db_spark.plans import registry

    rows = registry.QUERIES["t37_bpe_encode_stats"](spark, sf001).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_tokens"] <= r["n_chars"]
        assert r["n_words"] <= r["n_tokens"]
        # 6 merges must compress SOMETHING in every language bucket.
        assert r["tokens_per_word"] < r["n_chars"] / r["n_words"]
        assert r["tokens_per_word"] == round(r["n_tokens"] / r["n_words"], 6)
        assert r["chars_per_token"] == round(r["n_chars"] / r["n_tokens"], 6)


def test_bpe_encode_inference_matches_trainer_encoding(spark, sf001):
    """Once-in-rank-order inference must reproduce the trainer's own
    encoding exactly for every word IN the training vocabulary (the
    topological-consistency argument, checked on ~all word types), and
    encode genuinely unseen words by composing learned merges."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.bpe import (
        SEP,
        bpe_encode,
        bpe_train,
        word_types,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    merges, words = bpe_train(word_types(docs))
    trainer = words.select(
        "tok",
        (
            (F.length("w") - F.length(F.replace(F.col("w"), F.lit(SEP), F.lit(""))))
            / F.lit(2)
        ).cast("long").alias("train_syms"),
    )
    inferred = bpe_encode(words.select("tok"), merges)
    diff = (
        trainer.join(inferred, "tok")
        .filter(F.col("train_syms") != F.col("n_syms"))
        .count()
    )
    assert diff == 0

    # Unseen word composed of learned merges: with the sf corpus's top
    # merges, an OOV string still compresses below character level.
    m = {(r["x"], r["y"]) for r in merges.collect()}
    x, y = next(iter(m))
    oov = spark.createDataFrame([(x + y + x + y + "q",)], "tok string")
    (row,) = bpe_encode(oov, merges).collect()
    assert row["n_chars"] == len(x + y) * 2 + 1
    assert row["n_syms"] < row["n_chars"]  # at least one merge fired


def test_bpe_train_stops_on_exhausted_corpus_instead_of_emptying(spark):
    """Round-4 ADVICE: a training round that finds no mergeable pair
    (corpus fully merged before `rounds` complete) must STOP — keeping
    the merge table learned so far and the last successful words rewrite —
    not let the empty crossJoin silently empty the words table."""
    from mtg_vector_db_spark.operators.bpe import (
        SEP,
        bpe_encode,
        bpe_train,
    )

    # One two-char word type: exactly ONE learnable merge, then exhausted.
    wf = spark.createDataFrame([("ab", 5)], ["tok", "freq"])
    merges, words = bpe_train(wf, rounds=6)
    assert [(r["round"], r["x"], r["y"], r["cnt"]) for r in merges.collect()] == [
        (1, "a", "b", 5)
    ]
    w = words.collect()
    assert len(w) == 1  # NOT emptied by rounds 2-6
    assert w[0]["w"] == f"{SEP}ab{SEP}"  # fully merged single symbol

    # Inference at the REQUESTED round count passes through missing ranks
    # declaratively (the null-padded broadcast guard) instead of emptying.
    toks = spark.createDataFrame([("ab",), ("abab",), ("zq",)], "tok string")
    enc = {
        r["tok"]: (r["n_syms"], r["n_chars"])
        for r in bpe_encode(toks, merges, rounds=6).collect()
    }
    assert enc == {"ab": (1, 2), "abab": (2, 4), "zq": (2, 2)}

    # Degenerate-from-round-1 corpus: zero merges, words intact, encoding
    # stays character-level.
    wf1 = spark.createDataFrame([("a", 3)], ["tok", "freq"])
    merges1, words1 = bpe_train(wf1, rounds=3)
    assert merges1.count() == 0
    assert words1.count() == 1
    (row,) = bpe_encode(
        spark.createDataFrame([("aaa",)], "tok string"), merges1, rounds=3
    ).collect()
    assert (row["n_syms"], row["n_chars"]) == (3, 3)


def test_bpe_train_batched_matches_sequential_on_independent_pairs(spark):
    """Round-4 VERDICT #3: batched training (top-M non-interacting pairs
    per round) must learn IDENTICAL merges, in the identical global rank
    order, to one-merge-per-round sequential training whenever the top
    pairs are independent — and get there in ~n_merges/batch_m rounds.
    Planted corpus: 64 two-char word types over 128 DISTINCT letters
    (every candidate pair is symbol-disjoint from every other) with
    strictly decreasing frequencies (no rank ties)."""
    from mtg_vector_db_spark.operators.bpe import (
        SEP,
        bpe_encode,
        bpe_train,
        bpe_train_batched,
    )

    letters = [chr(0x0061 + i) for i in range(26)] + [
        chr(0x00E0 + i) for i in range(102)
    ]
    wf = spark.createDataFrame(
        [(letters[2 * i] + letters[2 * i + 1], 1000 - i) for i in range(64)],
        ["tok", "freq"],
    )

    m_seq, w_seq = bpe_train(wf, rounds=64)
    m_bat, w_bat = bpe_train_batched(wf, n_merges=64, batch_m=8)

    seq = [(r["round"], r["x"], r["y"], r["cnt"]) for r in
           m_seq.orderBy("round").collect()]
    bat = [(r["round"], r["x"], r["y"], r["cnt"]) for r in
           m_bat.orderBy("round").collect()]
    assert len(bat) == 64
    assert bat == seq  # identical merges at identical global ranks

    # >=64 merges learned in <=8 batch rounds (vs 64 sequential rounds).
    assert m_bat.agg({"batch_round": "max"}).first()[0] <= 8

    # Identical final encodings of every word type...
    assert sorted((r["tok"], r["w"]) for r in w_bat.collect()) == sorted(
        (r["tok"], r["w"]) for r in w_seq.collect()
    )
    # ...and the batched merge table drives inference unchanged (global
    # rank rides the `round` column).
    enc = {
        r["tok"]: r["n_syms"]
        for r in bpe_encode(
            wf.select("tok"), m_bat.drop("batch_round"), rounds=64
        ).collect()
    }
    assert all(v == 1 for v in enc.values())
    assert len(enc) == 64


def test_bpe_train_batched_defers_interacting_pairs(spark):
    """When the top pairs DO share symbols, the batch must apply only a
    non-interacting subset and re-count the rest next round — every
    applied merge is a true argmax of its own recount, exactly
    sequential training's choice sequence. Corpus: 'ab' (10) and 'bc'
    (9) share symbol b, plus independent 'de' (8)."""
    from mtg_vector_db_spark.operators.bpe import bpe_train, bpe_train_batched

    wf = spark.createDataFrame(
        [("ab", 10), ("bc", 9), ("de", 8)], ["tok", "freq"]
    )
    m_seq, _ = bpe_train(wf, rounds=3)
    m_bat, w_bat = bpe_train_batched(wf, n_merges=3, batch_m=3)
    rows = m_bat.orderBy("round").collect()
    assert [(r["round"], r["x"], r["y"]) for r in rows] == [
        (1, "a", "b"),  # round 1 takes (a,b)...
        (2, "d", "e"),  # ...and (d,e); (b,c) conflicts on b and is deferred
        (3, "b", "c"),  # round 2 recounts and applies it
    ]
    assert [r["batch_round"] for r in rows] == [1, 1, 2]
    # Same merges as sequential (only the per-round grouping differs).
    assert sorted((r["x"], r["y"], r["cnt"]) for r in rows) == sorted(
        (r["x"], r["y"], r["cnt"]) for r in m_seq.collect()
    )
    assert w_bat.count() == 3  # nothing emptied


def test_bpe_train_batched_stops_on_exhausted_corpus(spark):
    """The degenerate-corpus guard holds for the batched form too: a
    fully-merged vocabulary stops training with the merges learned so
    far, never emptying the words table."""
    from mtg_vector_db_spark.operators.bpe import bpe_train_batched

    wf = spark.createDataFrame([("ab", 5), ("cd", 4)], ["tok", "freq"])
    merges, words = bpe_train_batched(wf, n_merges=50, batch_m=8)
    assert merges.count() == 2
    assert words.count() == 2


def test_t39_batched_train_oracle_on_degenerate_corpora(spark, tmp_path):
    """The t39 oracle's recursive greedy selection must track the Spark
    trainer through every degenerate shape: merge exhaustion after one
    pick, mid-round-2 exhaustion, conflict-heavy chained pairs (picks
    deferred across rounds), zero learnable merges, and empty docs."""
    import shutil

    import pandas as pd

    src = "/root/testdata/sf0.001"
    cases = {
        "exhaust1": (["ab ab ab"], 1),
        "exhaust2": (["ab ab ab cd cd xy"], 3),
        "conflict": (["abcde abcde abcd bcde abc bcd cde ab bc cd de"] * 3, 4),
        "none": (["a b c d e"], 0),
        "empty": (["", "   ", "x"], 0),
        # Max-conflicting shape (round-5 VERDICT #8): a single-symbol
        # corpus makes EVERY candidate in every round share a symbol
        # (round 1: only (a,a); round 2: (aa,aa)/(aa,a) both consume
        # 'aa'), so the batch degenerates to M=1 — exactly one pick per
        # round, 2 merges over the 2 configured rounds. This drives the
        # oracle's recursive selection through its worst case: the full
        # 4M-candidate LIMIT scanned with every non-first candidate
        # rejected by the used-symbol guard.
        "maxconflict": (["aaaaaa aaaaa aaaa aaa aa"] * 3, 2),
    }
    for name, (texts, want_merges) in cases.items():
        d = tmp_path / name
        d.mkdir()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "embeddings"
        ).split():
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "source": ["x"] * len(texts),
                "lang": ["en"] * len(texts),
            }
        ).to_parquet(str(d / "documents.parquet"), index=False)
        df = registry.QUERIES["t39_bpe_batched_train"](spark, str(d))
        assert df.count() == want_merges, name
        assert_matches_oracle(
            df, registry.ORACLES["t39_bpe_batched_train"], str(d)
        )
