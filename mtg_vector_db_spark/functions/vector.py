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
