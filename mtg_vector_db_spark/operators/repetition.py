"""Within-document repetition profiling (Gopher-style quality gate).

The reference corpus tooling has no per-document repetition screen; this
is one of the standard LLM-training-data filters (Rae et al., "Scaling
Language Models: ... Gopher", §A1.1: duplicate n-gram fraction and
top-n-gram character fraction) that a 100 TB pipeline needs alongside
the cross-document dedup family (``operators/dedup.py``).

Metrics per document, over lowercase whitespace tokens:

- ``top2_frac`` / ``top3_frac`` — character mass of the single most
  frequent word 2-gram / 3-gram, as a fraction of the total character
  mass of all 2-grams / 3-grams in the document (ties broken toward the
  lexicographically greatest gram, deterministically in both engines).
- ``dup5_frac`` — character mass of 5-gram occurrences whose 5-gram
  appears more than once, as a fraction of all 5-gram character mass.

Character mass of one occurrence of an n-gram = its character length
minus the (n-1) joining spaces (tokens never contain whitespace), so the
fractions are the deterministic per-occurrence analog of Gopher's
per-character-position fractions — identical to replay in SQL, and
monotone in the same repetition signal.

Scale posture: ONE shuffle at (doc_id, n, gram) grain with map-side
partial aggregation (the gram stream never materializes unaggregated
across the wire beyond the combiner), then a doc-grain reduce. No joins,
no windows over the corpus, no driver-side state. At 100 TB the gram
shuffle is the dominant cost and is the same shape MinHash shingling
(``operators/dedup.py``) already pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.text import tokens
from mtg_vector_db_spark.session import widen

#: Gopher-ish gate thresholds (A1.1 uses 0.20 / 0.18 / 0.30 for the
#: closest corresponding rules).
TOP2_MAX = 0.20
TOP3_MAX = 0.18
DUP5_MAX = 0.30

_NGRAM_NS = (2, 3, 5)


def _ngrams(tk: Column, n: int) -> Column:
    """Adjacent word n-grams of a token array, space-joined; empty array
    (not a descending ``sequence``) when the document is shorter than n."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
    )
    return F.when(F.size(tk) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def doc_repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition metrics + keep/drop gate.

    Returns ``(id_col, top2_frac, top3_frac, dup5_frac, keep)`` with the
    fractions un-rounded (callers round for display); documents too short
    to have any n-gram of a given order score 0.0 for that metric. Every
    input document gets a row: a doc with no n-grams at all (fewer than
    2 tokens) scores 0.0/0.0/0.0 and keep=true — a repetition screen has
    nothing to say about it (explode_outer keeps a null-gram row through
    the same shuffle, so totality costs no extra join).
    """
    def _tag(n: int):
        # NB: a two-arg lambda would make F.transform pass the array
        # index as the second argument — close over n instead.
        def tag(g: Column) -> Column:
            return F.struct(F.lit(n).alias("n"), g.alias("gram"))

        return tag

    tk = tokens(F.lower(F.col(text_col)))
    tagged = F.concat(
        *[F.transform(_ngrams(tk, n), _tag(n)) for n in _NGRAM_NS]
    )
    # The gram build is CPU-bound per row; widen() fans a single-split
    # small scan across the cluster (no-op once the scan itself splits).
    # explode_outer, not explode: a doc whose token count is < 2 has an
    # empty gram array; the outer variant keeps one (null n, null gram)
    # row for it, which flows through both aggregates into coalesced-0.0
    # metrics — so the profile is TOTAL over its input (round-3 ADVICE).
    grams = widen(docs.select(id_col, text_col)).select(
        F.col(id_col), F.explode_outer(tagged).alias("g")
    ).select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))

    # (doc, n, gram) counts — the one wide shuffle, map-side combinable.
    gchars = F.length(F.col("gram")) - (F.col("n") - F.lit(1))
    counts = grams.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn("gchars", gchars)

    # Per (doc, n): top gram by (cnt, gram) struct max — deterministic
    # tie-break toward the lexicographically greatest gram — plus the
    # duplicated-occurrence and total character masses.
    occ_chars = F.col("cnt") * F.col("gchars")
    per_n = counts.groupBy(id_col, "n").agg(
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("top"),
        F.sum(F.when(F.col("cnt") > 1, occ_chars).otherwise(F.lit(0))).alias(
            "dup_chars"
        ),
        F.sum(occ_chars).alias("tot_chars"),
    )
    top_chars = (
        F.col("top.cnt")
        * (F.length(F.col("top.gram")) - (F.col("n") - F.lit(1)))
    ).cast("double")

    def _metric(n: int, value: Column) -> Column:
        return F.coalesce(
            F.max(F.when(F.col("n") == n, value)), F.lit(0.0)
        )

    top_frac = top_chars / F.col("tot_chars")
    dup_frac = F.col("dup_chars").cast("double") / F.col("tot_chars")
    prof = per_n.groupBy(id_col).agg(
        _metric(2, top_frac).alias("top2_frac"),
        _metric(3, top_frac).alias("top3_frac"),
        _metric(5, dup_frac).alias("dup5_frac"),
    )
    keep = (
        (F.col("top2_frac") <= TOP2_MAX)
        & (F.col("top3_frac") <= TOP3_MAX)
        & (F.col("dup5_frac") <= DUP5_MAX)
    )
    return prof.withColumn("keep", keep)
