"""Vector algebra as Catalyst higher-order-function expressions.

Re-implements the pgvector operators the reference relies on
(``<=>`` cosine distance — /root/reference/db/init.sql:174,177-178 — and the
``1 - distance`` similarity score returned by its search functions,
init.sql:174,203,230) as pure column expressions over ``array<float>``
columns.

Why HOFs and not a pandas UDF: these expressions run inside whole-stage
codegen on the JVM — no Python worker, no Arrow hop, no per-batch overhead —
and they are exactly reproducible against the DuckDB oracle (accumulate in
float64 in array order). For very wide vectors (≥1k dims) a numpy
``mapInPandas`` kernel can win; see ``operators/knn.py`` which keeps that as
an opt-in fast path while HOF remains the semantic definition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def vec_lit(v: Sequence[float]) -> Column:
    """A literal vector as an ``array<double>`` column (broadcast to every
    row at codegen time — the Spark analog of the reference passing the query
    embedding into a plpgsql function, init.sql:159-181)."""
    return F.array(*[F.lit(float(x)) for x in v])


def _as_double(v: Column | Sequence[float]) -> Column:
    if isinstance(v, Column):
        return F.transform(v, lambda x: x.cast("double"))
    return vec_lit(v)


def dot(a: Column | Sequence[float], b: Column | Sequence[float]) -> Column:
    """Sequential-order float64 dot product (bit-reproducible)."""
    da, db = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | Sequence[float]) -> Column:
    da = _as_double(a)
    return F.sqrt(
        F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity(
    a: Column | Sequence[float], b: Column | Sequence[float]
) -> Column:
    """``1 - (a <=> b)`` in pgvector terms (init.sql:174)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(
    a: Column | Sequence[float], b: Column | Sequence[float]
) -> Column:
    """pgvector ``<=>`` (init.sql:177-178)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def cosine_similarity_prenorm(
    a: Column, na: Column, b: Column, nb: Column
) -> Column:
    """``cosine_similarity(a, b)`` with the two norms supplied as columns.

    Bit-identical to :func:`cosine_similarity` when ``na``/``nb`` are
    :func:`l2_norm` of ``a``/``b``: the expression tree is the same
    ``dot / (norm_a * norm_b)`` — same float64 ops in the same order —
    only the norm subtrees are evaluated ONCE PER VECTOR (in the
    projection that produced ``na``/``nb``) instead of once per pair.
    Higher-order functions are interpreted (CodegenFallback, no common-
    subexpression elimination), so on pair-expanded data the norm folds
    are 2/3 of the scoring cost; hoisting them is the round-8 measured
    2.1× on a 600k-pair NN-Descent scoring stage with zero unrounded
    mismatches (OPTIMIZATION_r08.md)."""
    return dot(a, b) / (na * nb)


def lit_l2_norm(v: Sequence[float]) -> Column:
    """The :func:`l2_norm` of a PLAN-LITERAL vector, computed driver-side.

    Same arithmetic as the Catalyst fold — sequential float64
    ``acc += x*x`` in array order, then ``sqrt`` — so the literal is
    bit-identical to what ``l2_norm(vec_lit(v))`` evaluates to per row;
    IEEE-754 doubles make the Python and JVM results the same bits.
    Hoisting it means a single-query scan pays one O(d) fold per row
    (the row vector's norm) instead of two."""
    import math

    acc = 0.0
    for x in v:
        acc += float(x) * float(x)
    return F.lit(math.sqrt(acc))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector column. On the unit sphere, cosine top-k ≡
    Euclidean top-k, which is what lets MLlib's Euclidean LSH stand in for
    the reference's HNSW cosine index (init.sql:50-53); see operators/ann.py.

    The norm is bound ONCE per row through a singleton-array lambda
    variable: higher-order functions are interpreted (CodegenFallback,
    no common-subexpression elimination), so referencing the norm fold
    directly inside the per-element lambda would re-evaluate the whole
    O(d) aggregate for every element — O(d²) per row (measured 6× on the
    IVF assignment stage at d=64). Same arithmetic, same results.
    """
    n = l2_norm(a)
    return F.get(
        F.transform(
            F.array(n),
            lambda nn: F.transform(a, lambda x: x.cast("double") / nn),
        ),
        0,
    )
