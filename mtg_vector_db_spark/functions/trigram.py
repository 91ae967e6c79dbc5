"""pg_trgm-compatible trigram similarity as Catalyst expressions.

The reference's fuzzy card-name tier uses PostgreSQL's pg_trgm
(``similarity(card_name, q)`` and the ``<->`` distance operator,
/root/reference/db/search_strategies.py:97-106, extension loaded at
db/init.sql:9, GIN index at :32). pg_trgm semantics, reproduced here exactly:

1. fold case;
2. split the string into "words" (maximal alphanumeric runs);
3. pad each word with two leading spaces and one trailing space;
4. take every 3-character substring of each padded word;
5. the string's trigram *set* is the dedup'd union across words;
6. ``similarity(a, b) = |A ∩ B| / |A ∪ B|``.

Everything is built from higher-order functions — no UDF, runs in codegen,
and the identical construction is expressible in DuckDB lambdas, which is
what makes this operator oracle-checkable (the hardest parity item in
SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_WORD_SPLIT = "[^a-z0-9]+"


def trigram_set(s: Column | str) -> Column:
    """Dedup'd pg_trgm trigram set of a string column."""
    c = F.col(s) if isinstance(s, str) else s
    words = F.filter(
        F.split(F.lower(c), _WORD_SPLIT), lambda w: F.length(w) > 0
    )
    padded = F.transform(words, lambda w: F.concat(F.lit("  "), w, F.lit(" ")))
    tris = F.flatten(
        F.transform(
            padded,
            lambda w: F.transform(
                F.sequence(F.lit(1), F.length(w) - 2),
                lambda i: w.substr(i, F.lit(3)),
            ),
        )
    )
    return F.array_distinct(tris)


def trigram_similarity(a: Column | str, b: Column | str) -> Column:
    """pg_trgm ``similarity()``: |A∩B| / |A∪B| as double (0.0 when either
    side has no trigrams, matching pg_trgm's 0 result for empty strings).

    Both trigram sets are bound ONCE per row through a singleton-array
    lambda variable (same interpreted-HOF discipline as
    vector.l2_normalize): referencing ``trigram_set`` directly in both
    the intersection and the union would re-derive each set twice per
    row. Same arithmetic, same results; a literal side still constant-
    folds to an array literal before this wrapper matters.
    """
    ta = trigram_set(a)
    tb = trigram_set(b)

    def sim(s: Column) -> Column:
        inter = F.size(F.array_intersect(s["ta"], s["tb"]))
        union = F.size(F.array_distinct(F.concat(s["ta"], s["tb"])))
        return F.when(union > 0, inter / union).otherwise(F.lit(0.0))

    return F.get(
        F.transform(
            F.array(F.struct(ta.alias("ta"), tb.alias("tb"))), lambda s: sim(s)
        ),
        0,
    )


def trigram_distance(a: Column | str, b: Column | str) -> Column:
    """pg_trgm ``<->`` operator: ``1 - similarity`` (search_strategies.py:103)."""
    return F.lit(1.0) - trigram_similarity(a, b)


def duckdb_trigram_set_sql(expr: str) -> str:
    """The same trigram-set construction in DuckDB SQL (for oracle strings).

    Mirrors :func:`trigram_set` operation-for-operation so integer set sizes
    (and hence similarities) match exactly.
    """
    padded = f"list_transform(list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), w -> len(w) > 0), w -> '  ' || w || ' ')"
    return (
        "list_distinct(flatten(list_transform("
        + padded
        + ", p -> list_transform(range(1, len(p) - 1), i -> substring(p, i, 3)))))"
    )


def duckdb_trigram_similarity_sql(a: str, b: str) -> str:
    """DuckDB SQL expression for pg_trgm similarity(a, b)."""
    ta, tb = duckdb_trigram_set_sql(a), duckdb_trigram_set_sql(b)
    return (
        f"CASE WHEN len(list_distinct(list_concat({ta}, {tb}))) > 0 "
        f"THEN len(list_intersect({ta}, {tb})) * 1.0 / len(list_distinct(list_concat({ta}, {tb}))) "
        f"ELSE 0.0 END"
    )
