"""Text-analysis functions for large-scale corpus pipelines.

Beyond the reference's own surface (SURVEY.md §2.10 extensions): language
identification, quality scoring, token statistics and document
fingerprinting — the per-document scalar layer every training-data pipeline
runs over its corpus. All pure column expressions; the identical
constructions exist in DuckDB SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from mtg_vector_db_spark.functions.text import tokens

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deliberately tiny and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "und", "die", "das", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}

EN_STOPWORDS = (
    "the a an and or of to in is are was for on with as by at it this that".split()
)


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def avg_token_len(c: Column) -> Column:
    """Mean token length (0.0 for empty docs)."""
    toks = tokens(c)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(c))
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def non_alnum_ratio(c: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space — the
    punctuation/noise signal in quality scoring."""
    stripped = F.regexp_replace(c, r"[a-zA-Z0-9 ]", "")
    return F.when(
        F.length(c) > 0, F.length(stripped) / F.length(c)
    ).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards stopword
    presence (natural prose) and reasonable token length, penalizes
    noise characters. Weights are arbitrary but fixed."""
    return F.round(
        F.least(
            F.lit(1.0),
            F.lit(0.3)
            + F.lit(0.4) * F.least(F.lit(1.0), stopword_ratio(c) * 4)
            + F.lit(0.3) * F.least(F.lit(1.0), token_count(c) / 100.0)
            - F.lit(0.5) * non_alnum_ratio(c),
        ),
        6,
    )


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-token hit count per candidate language."""
    toks = tokens(F.lower(c))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(c: Column) -> Column:
    """Predicted language: argmax of marker counts with fixed precedence
    (en > de > es > fr > zh on ties); 'und' when no markers hit."""
    s = lang_scores(c)
    best = F.greatest(*s.values())
    expr = F.lit("und")
    # Build the CASE from lowest precedence up so higher precedence wins.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((s[lang] > 0) & (s[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed, lowercased text —
    the exact-dedup key (reference dedups on unique card_name,
    db/ingest_cards.py:240-258; content hashing is its corpus-scale form)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


# GPT-2-style pretokenizer pattern, restricted to syntax that Java regex
# (Spark) and RE2 (DuckDB) evaluate identically: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. (The original
# also has a lookahead whitespace rule — RE2 has no lookahead, and
# whitespace pseudo-tokens are not wanted for counting anyway.)
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(c: Column) -> Column:
    """BPE-ish pretokenization (the unit LLM token budgets are measured
    in, ~1 merge step above real BPE): all matches of BPE_PATTERN."""
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_PATTERN), 0)


def bpe_token_count(c: Column) -> Column:
    return F.size(bpe_tokens(c))


def word_ngrams(c: Column, n: int) -> Column:
    """ALL lowercase word n-grams of a text column, WITH repetition —
    the multiset twin of ``dedup.word_shingles`` (which dedupes per doc).
    Diversity metrics (distinct-n) need occurrence totals, so nothing is
    dropped here. Same O(tokens) zip_with-over-shifted-slices build."""
    toks = tokens(F.lower(c))
    if n == 1:
        return toks
    sz = F.size(toks)
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(sz - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        sz >= n,
        F.slice(grams, 1, F.greatest(sz - (n - 1), F.lit(0))),
    ).otherwise(F.array().cast("array<string>"))
