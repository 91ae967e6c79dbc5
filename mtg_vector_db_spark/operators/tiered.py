"""3-tier fuzzy name resolution (SURVEY.md §2.7 V10).

The reference's card-name lookup (/root/reference/db/search_strategies.py:
25-116) tries progressively fuzzier strategies, stopping at the first tier
that produces an acceptable result:

  tier 1 "exact":  LOWER(name) = LOWER(q)                      (:51-58)
  tier 2 "prefix": name ILIKE q || '%' ORDER BY similarity desc,
                   accepted only if best similarity > 0.5       (:72-93)
  tier 3 "fuzzy":  similarity(name, q) > 0.3 ORDER BY name <-> q (:97-116)

The tier gating is *semantics*, not optimization (the tiers return different
result sets), so it stays explicit driver-side control flow here too — each
gate is a cheap ``head(1)`` on a top-k plan, the Spark analog of the
reference's Python-side gating between SQL round-trips.

At scale the name table is the small side (30k cards in the reference): each
tier is a broadcast-friendly scan with the trigram expression fused into
codegen; no shuffle at all except the final top-k merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mtg_vector_db_spark.session import widen
from mtg_vector_db_spark.functions.trigram import trigram_similarity


def tiered_name_search(
    names: DataFrame,
    q: str,
    name_col: str = "name",
    k: int = 10,
    prefix_accept: float = 0.5,
    fuzzy_threshold: float = 0.3,
    round_digits: int = 6,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Resolve ``q`` against a name table; returns matched rows plus
    ``match_type`` ∈ {exact, prefix, fuzzy} and ``sim``.

    Mirrors search_strategies.py:50-116 semantics exactly, including the
    prefix-tier acceptance gate (best sim must exceed ``prefix_accept``).
    ``tiebreak`` columns make top-k cuts deterministic when names repeat.
    """
    name = F.col(name_col)
    # The fuzzy tier's trigram fold is CPU-bound per row; widen() guards
    # the single-split small-scan case (no-op on real multi-split scans).
    names = widen(names)
    sim = F.round(trigram_similarity(name, F.lit(q)), round_digits)
    order = [F.desc("sim"), F.asc(name_col), *[F.asc(c) for c in tiebreak]]

    exact = (
        names.filter(F.lower(name) == q.lower())
        .withColumn("match_type", F.lit("exact"))
        .withColumn("sim", F.lit(1.0))
    )
    if exact.head(1):
        return exact

    prefix = (
        names.filter(F.lower(name).startswith(q.lower()))
        .withColumn("match_type", F.lit("prefix"))
        .withColumn("sim", sim)
        .orderBy(*order)
        .limit(k)
    )
    best = prefix.head(1)
    if best and best[0]["sim"] > prefix_accept:
        return prefix

    return (
        names.withColumn("match_type", F.lit("fuzzy"))
        .withColumn("sim", sim)
        .filter(F.col("sim") > fuzzy_threshold)
        .orderBy(*order)
        .limit(k)
    )
