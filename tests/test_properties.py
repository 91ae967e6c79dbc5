"""Property tests: pure-function invariants (hypothesis) and batched
Spark-vs-Python-model parity on randomized corpora.

The Python models here are written independently from the Spark
expressions (straight from the pg_trgm / simhash definitions), so
agreement on a randomized corpus is evidence the expression trees encode
the intended semantics, not just the golden examples.
"""

from __future__ import annotations

import hashlib
import random
import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from mtg_vector_db_spark.operators.rerank import parse_ranking, parse_score


# --- pure-function invariants (reference db_utils.py:384-397,487-495) -----
@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80), st.integers(min_value=1, max_value=30))
def test_parse_ranking_always_permutation(text, n):
    perm = parse_ranking(text, n)
    assert sorted(perm) == list(range(n))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_parse_score_always_clamped(text):
    assert 0.0 <= parse_score(text) <= 1.0


# --- Python models -------------------------------------------------------
def pg_trgm_set(s: str) -> set[str]:
    out: set[str] = set()
    for w in re.split(r"[^a-z0-9]+", s.lower()):
        if not w:
            continue
        p = f"  {w} "
        out.update(p[i : i + 3] for i in range(len(p) - 2))
    return out


def pg_trgm_sim(a: str, b: str) -> float:
    ta, tb = pg_trgm_set(a), pg_trgm_set(b)
    union = len(ta | tb)
    return len(ta & tb) / union if union else 0.0


def py_simhash(text: str) -> str:
    votes = [0] * 64
    for tok in re.split(r"\s+", text.lower().strip()):
        if not tok:
            continue
        h = hashlib.md5(tok.encode()).hexdigest()[:16]
        for i, ch in enumerate(h):
            v = int(ch, 16)
            for k in range(4):
                votes[i * 4 + k] += 1 if (v >> k) & 1 else -1
    return "".join("1" if sm >= 0 else "0" for sm in votes)


def _random_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    words = ["dragon", "bolt", "blue", "fl", "a" * 7, "x1y2", "Ozzy"]
    texts = []
    for _ in range(n):
        k = rng.randint(0, 8)
        parts = [rng.choice(words) for _ in range(k)]
        if rng.random() < 0.3:
            parts.append("".join(rng.choices(string.printable[:70], k=rng.randint(1, 9))))
        texts.append(rng.choice([" ", "  ", " - ", ","]).join(parts))
    texts += ["", " ", "---", "a", "ab", "abc abc abc", "  padded  "]
    return texts


def test_trigram_matches_python_model_on_random_corpus(spark):
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.functions.trigram import trigram_similarity

    texts = _random_texts(150, seed=7)
    pairs = [(i, a, b) for i, (a, b) in enumerate(zip(texts, texts[1:] + texts[:1]))]
    df = spark.createDataFrame(pairs, "i long, a string, b string")
    got = {
        r["i"]: r["sim"]
        for r in df.select(
            "i", trigram_similarity(F.col("a"), F.col("b")).alias("sim")
        ).collect()
    }
    for i, a, b in pairs:
        assert abs(got[i] - pg_trgm_sim(a, b)) < 1e-12, (a, b)


def test_simhash_matches_python_model_on_random_corpus(spark):
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.dedup import simhash_expr

    texts = [t for t in _random_texts(100, seed=11)]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", simhash_expr(F.col("t")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_simhash(t), repr(t)


def py_minhash_sig(text: str, num_hashes: int = 16) -> tuple:
    from mtg_vector_db_spark.operators.dedup import MINHASH_P, minhash_coeffs

    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
    sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)} if len(toks) >= 3 else set()
    if not sh:
        return None
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P for s in sh]
    return tuple(
        min((a * h + b) % MINHASH_P for h in hs)
        for a, b in minhash_coeffs(num_hashes)
    )


def test_minhash_signature_matches_hashlib_corpus(spark, sf001):
    """Every document's full 16-seed signature equals the hashlib model —
    this is the regression pin for the sibling-HOF-columns corruption (16
    lambda-bearing projection columns silently evaluated to garbage)."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.dedup import (
        minhash_hash_values,
        minhash_signature,
        word_shingles,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    sh = docs.select("doc_id", "text", word_shingles(F.col("text")).alias("shingles"))
    rows = (
        sh.select("doc_id", "text", minhash_hash_values(F.col("shingles")).alias("hv"))
        .select("doc_id", "text", minhash_signature(F.col("hv")).alias("sig"))
        .collect()
    )
    assert len(rows) == 500
    checked = 0
    for r in rows:
        expected = py_minhash_sig(r["text"])
        if expected is None:
            continue
        assert tuple(r["sig"]) == expected, r["doc_id"]
        checked += 1
    assert checked > 400


def test_minhash_band_keys_match_hashlib(spark, sf001):
    """The banded form (sig consumed via inline/get in a later projection)
    must ALSO survive optimization — guards against projection collapse
    re-introducing the duplicated-lambda corruption downstream."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.dedup import (
        minhash_hash_values,
        minhash_signature,
        word_shingles,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    sh = docs.select("doc_id", "text", word_shingles(F.col("text")).alias("shingles"))
    sig = sh.select(
        "doc_id", "text", minhash_hash_values(F.col("shingles")).alias("hv")
    ).select("doc_id", "text", minhash_signature(F.col("hv")).alias("sig"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[F.get(F.col("sig"), b * 4 + r).cast("string") for r in range(4)],
                ).alias("band_key"),
            )
            for b in range(4)
        ]
    )
    rows = sig.select("doc_id", "text", F.inline(band_structs)).collect()
    for r in rows:
        expected = py_minhash_sig(r["text"])
        if expected is None:
            continue
        b = r["band"]
        assert r["band_key"] == "|".join(
            str(v) for v in expected[b * 4 : b * 4 + 4]
        ), (r["doc_id"], b)


def test_textstats_match_python_models_on_corpus(spark, sf001):
    """Sibling lambda-bearing stat columns in one projection vs plain
    Python models — same regression class as the MinHash corruption."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.functions import textstats as TS

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    rows = docs.select(
        "doc_id",
        "text",
        TS.token_count(F.col("text")).alias("n_tok"),
        TS.avg_token_len(F.col("text")).alias("avg_len"),
        TS.stopword_ratio(F.col("text")).alias("sw"),
        TS.non_alnum_ratio(F.col("text")).alias("noise"),
        TS.lang_id(F.col("text")).alias("lang"),
        TS.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert len(rows) == 500
    sw_set = set(TS.EN_STOPWORDS)
    for r in rows:
        t = r["text"]
        toks = [x for x in re.split(r"\s+", t.strip()) if x]
        assert r["n_tok"] == len(toks), r["doc_id"]
        if toks:
            assert abs(r["avg_len"] - sum(map(len, toks)) / len(toks)) < 1e-9
            low = [x for x in re.split(r"\s+", t.lower().strip()) if x]
            assert abs(r["sw"] - sum(x in sw_set for x in low) / len(low)) < 1e-9
        stripped = re.sub(r"[a-zA-Z0-9 ]", "", t)
        if t:
            assert abs(r["noise"] - len(stripped) / len(t)) < 1e-9
        # lang_id python model: argmax with precedence
        low = [x for x in re.split(r"\s+", t.lower().strip()) if x]
        scores = {
            lang: sum(x in set(m) for x in low)
            for lang, m in TS.LANG_MARKERS.items()
        }
        best = max(scores.values()) if scores else 0
        expect = "und"
        for lang in TS.LANG_MARKERS:
            if scores[lang] > 0 and scores[lang] == best:
                expect = lang
                break
        assert r["lang"] == expect, (r["doc_id"], r["lang"], expect)
        assert r["fp"] == hashlib.md5(
            re.sub(r"\s+", " ", t.lower()).strip().encode()
        ).hexdigest()


def test_bpe_tokens_match_python_model(spark):
    """GPT-2-style pretokenizer on messy input (contractions, digits,
    punctuation runs, unicode letters) — Spark regexp_extract_all vs a
    Python model of the same pattern."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.functions.textstats import bpe_tokens

    texts = [
        "It's the 2nd time we've won!!! 100% -- really?",
        "don't stop, can't won't shan't",
        "a1b2c3   spaced    out\ttabs",
        "Ünïcödé wörds + ascii mix 42",
        "",
        "'s alone and trailing '",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r["i"]: list(r["toks"]) for r in df.select(
        "i", bpe_tokens(F.col("t")).alias("toks")).collect()}
    pat = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|_+", re.UNICODE)
    # python model: \p{L} ~ [^\W\d_], \p{N} ~ \d, punct ~ [^\s\w]|_
    for i, t in enumerate(texts):
        expect = pat.findall(t.lower())
        assert got[i] == expect, (t, got[i], expect)


def test_parse_score_col_matches_python(spark):
    """The column-expression parser (oracle-checkable path in p15) computes
    exactly what the reference-semantics Python parser computes, across all
    reply formats and the fallback."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.rerank import parse_score, parse_score_col

    replies = [
        "85%", "7/10", "42/100", "0.73", "relevance 9.5", "3 out of 5",
        "Score: 10/10", "110%", " 55 % ", "15/10", "0", "1", "10", "11",
        "99.9", "no judgment", "", "n/a", "rated 8 of 10", "2.5/10",
        "100/100", "0.0001", "7.", ".5 maybe", "12 / 100", "  ",
    ]
    df = spark.createDataFrame([(r,) for r in replies], ["reply"])
    got = {
        r["reply"]: r["s"]
        for r in df.select(
            "reply", parse_score_col(F.col("reply")).alias("s")
        ).collect()
    }
    for text in replies:
        assert abs(got[text] - parse_score(text)) < 1e-12, repr(text)


def test_scd2_history_matches_python_model_on_random_log(spark):
    """scd2_history vs an independent run-length model over randomized
    keyed logs: intervals, counts, and open-endedness must agree."""
    rng = random.Random(1234)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randint(1, 25)):
            rows.append(
                (user, rng.randint(0, 50), eid, rng.choice("abc"))
            )
            eid += 1

    def model(rows):
        out = []
        by_user: dict[int, list] = {}
        for u, t, e, s in rows:
            by_user.setdefault(u, []).append((t, e, s))
        for u, evs in by_user.items():
            evs.sort()
            runs = []
            for t, e, s in evs:
                if runs and runs[-1][0] == s:
                    runs[-1][2] += 1
                else:
                    runs.append([s, t, 1])
            for i, (s, t0, n) in enumerate(runs):
                t_next = runs[i + 1][1] if i + 1 < len(runs) else None
                out.append((u, s, t0, t_next, n))
        return sorted(out)

    from mtg_vector_db_spark.operators.history import scd2_history

    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    got = sorted(
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"],
         r["n_events"])
        for r in scd2_history(
            df, "user_id", ["ts", "event_id"], "event_type"
        ).collect()
    )
    assert got == model(rows)


def test_latest_state_matches_python_model_on_random_log(spark):
    """latest_state vs max-by-(order) model on a randomized keyed log."""
    rng = random.Random(99)
    rows = [
        (rng.randint(0, 9), rng.randint(0, 100), i, rng.choice("xyz"))
        for i in range(300)
    ]

    def model(rows):
        best: dict[int, tuple] = {}
        for u, t, e, s in rows:
            if u not in best or (t, e) > best[u][:2]:
                best[u] = (t, e, s)
        return sorted((u, *v) for u, v in best.items())

    from mtg_vector_db_spark.operators.history import latest_state

    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    got = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["event_type"])
        for r in latest_state(
            df, "user_id", ["ts", "event_id"], ["event_type"]
        ).collect()
    )
    assert got == model(rows)


def test_bloom_positions_match_hashlib_model(spark):
    """Every shingle's k bit positions equal the pure-Python md5 model —
    the determinism pin that lets the c10 oracle (and any other engine)
    replay the filter bit-for-bit."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.bloom import (
        BLOOM_K,
        BLOOM_N_BITS,
        bloom_positions,
    )
    from mtg_vector_db_spark.operators.dedup import MINHASH_P, minhash_coeffs

    shingles = [
        "the quick brown",
        "quick brown fox",
        "a b c",
        "x" * 50,
        "unicode café touché",
        "1 2 3",
    ]

    def py_positions(s: str) -> list:
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
        return [
            ((a * h + b) % MINHASH_P) % BLOOM_N_BITS
            for a, b in minhash_coeffs(BLOOM_K)
        ]

    df = spark.createDataFrame([(s,) for s in shingles], "sh string")
    got = {
        r["sh"]: list(r["pos"])
        for r in df.select("sh", bloom_positions(F.col("sh")).alias("pos")).collect()
    }
    for s in shingles:
        assert got[s] == py_positions(s), s


def test_repetition_profile_matches_python_model_on_random_corpus(spark):
    """t22's metrics vs an independent Python model on a randomized
    small-vocab corpus (small vocab forces real n-gram collisions)."""
    import collections

    rng = random.Random(7)
    vocab = ["aa", "bb", "ccc", "dd", "e"]
    docs = []
    for i in range(40):
        n = rng.randint(0, 12)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3 and n >= 2:  # plant loops
            words = words[:2] * rng.randint(2, 5)
        docs.append((i, " ".join(words)))

    def model(words, n):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            return None
        c = collections.Counter(grams)
        chars = lambda g: len(g) - (n - 1)
        tot = sum(cnt * chars(g) for g, cnt in c.items())
        top_g, top_c = max(c.items(), key=lambda kv: (kv[1], kv[0]))
        dup = sum(cnt * chars(g) for g, cnt in c.items() if cnt > 1)
        return top_c * chars(top_g) / tot, dup / tot

    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_repetition_profile(df).collect()}
    checked = 0
    for i, text in docs:
        words = text.split()
        m2, m3, m5 = model(words, 2), model(words, 3), model(words, 5)
        if m2 is None:
            # <2 tokens: total profile — 0.0 metrics, gate passes
            assert got[i]["top2_frac"] == 0.0
            assert got[i]["top3_frac"] == 0.0
            assert got[i]["dup5_frac"] == 0.0
            assert got[i]["keep"]
            continue
        checked += 1
        assert abs(got[i]["top2_frac"] - m2[0]) < 1e-9, i
        exp3 = m3[0] if m3 else 0.0
        exp5 = m5[1] if m5 else 0.0
        assert abs(got[i]["top3_frac"] - exp3) < 1e-9, i
        assert abs(got[i]["dup5_frac"] - exp5) < 1e-9, i
    assert checked >= 20


def test_bpe_pair_counts_match_python_model(spark):
    """t23's frequency-weighted pair counts vs collections.Counter."""
    import collections

    rng = random.Random(11)
    vocab = ["spark", "scan", "agg", "a", "ww"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
        for i in range(60)
    ]
    wordfreq = collections.Counter(
        w for _, t in rows for w in t.lower().split() if w
    )
    expected = collections.Counter()
    for w, f in wordfreq.items():
        for i in range(len(w) - 1):
            expected[w[i : i + 2]] += f

    from pyspark.sql import functions as F

    from mtg_vector_db_spark.functions.text import tokens

    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = (
        df.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = F.when(
        F.length("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("tok") - 1),
            lambda i: F.substr(F.col("tok"), i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = {
        r["pair"]: r["cnt"]
        for r in words.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .collect()
    }
    assert got == dict(expected) and len(got) >= 5


def test_paragraph_dedup_matches_python_model_on_random_corpus(spark):
    """d14's engine vs an independent Python model on a randomized
    small-vocab corpus (small vocab forces real cross-doc paragraph
    collisions, including case variants)."""
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "AA", "Bb"]
    docs = []
    for i in range(60):
        n = rng.randint(0, 20)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))

    P = 4  # para_tokens

    def model(all_docs):
        seen, out = set(), {}
        for doc_id, text in sorted(all_docs):
            toks = text.split()
            if not toks:
                continue
            paras = [
                " ".join(toks[k : k + P]) for k in range(0, len(toks), P)
            ]
            kept = []
            for p in paras:
                fp = p.lower()
                if fp not in seen:
                    seen.add(fp)
                    kept.append(p)
            out[doc_id] = (len(paras), len(kept), " ".join(kept))
        return out

    from mtg_vector_db_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_kept"])
        for r in paragraph_dedup(df, para_tokens=P).collect()
    }
    want = model(docs)
    assert got == want
    assert sum(w[0] - w[1] for w in want.values()) > 5  # real collisions
