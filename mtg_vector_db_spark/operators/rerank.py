"""Two-stage retrieve-then-rerank (SURVEY.md §2.7 V6-V9).

The reference retrieves ``initial_k`` candidates by vector distance, sends
them in one prompt to an LLM reranker, parses the returned permutation, and
keeps the top ``final_k`` (/root/reference/db/search_strategies.py:118-215;
ranker internals db/db_utils.py:283-344). Capabilities re-provided here:

* :func:`parse_ranking` / :func:`parse_score` — the reference's permutation
  and score parsing with its exact repair semantics (db_utils.py:346-407,
  455-495): extract integers, 1-based → 0-based, drop invalid/duplicate,
  append missing; scores parse %, /10, /100 or bare floats and clamp to
  [0,1]. Pure functions (property: output is always a permutation).
* :func:`stub_rerank` — a deterministic, SQL-expressible stand-in for the
  LLM: ranks candidates by (similarity rounded to 2 decimals desc, md5 of
  the id asc) — i.e. "the model roughly agrees with retrieval but shuffles
  within coarse similarity ties" — then scores ``1 - rank/n`` exactly like
  the reference (db_utils.py:329-338). Deterministic ⇒ oracle-checkable.
* :func:`rerank_with` — the generic applyInPandas hook for a real model:
  candidates are grouped per query and handed to a Python callable in one
  Arrow batch (the reference's one-prompt-per-query shape, parallelized
  across queries instead of serialized).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def parse_ranking(text: str, n: int) -> list[int]:
    """Parse an LLM ranking reply into a permutation of 0..n-1
    (db_utils.py:346-407 semantics: ints are 1-based in the reply)."""
    out: list[int] = []
    seen: set[int] = set()
    for tok in re.findall(r"\d+", text or ""):
        i = int(tok) - 1
        if 0 <= i < n and i not in seen:
            out.append(i)
            seen.add(i)
    out.extend(i for i in range(n) if i not in seen)
    return out


def parse_score(text: str) -> float:
    """Parse a pointwise relevance reply to a [0,1] score
    (db_utils.py:455-495 semantics: %, /10, /100, bare float; 0.5 fallback)."""
    t = (text or "").strip()
    m = re.search(r"(\d+(?:\.\d+)?)\s*%", t)
    if m:
        return min(1.0, max(0.0, float(m.group(1)) / 100.0))
    m = re.search(r"(\d+(?:\.\d+)?)\s*/\s*(10|100)\b", t)
    if m:
        return min(1.0, max(0.0, float(m.group(1)) / float(m.group(2))))
    m = re.search(r"\d+(?:\.\d+)?", t)
    if m:
        v = float(m.group(0))
        if v > 1.0:
            v = v / 100.0 if v > 10 else v / 10.0
        return min(1.0, max(0.0, v))
    return 0.5


_PCT = r"(\d+(?:\.\d+)?)\s*%"
_FRAC = r"(\d+(?:\.\d+)?)\s*/\s*(10|100)\b"
_BARE = r"\d+(?:\.\d+)?"


def parse_score_col(c: F.Column) -> F.Column:
    """:func:`parse_score` as a pure column expression (db_utils.py:455-495
    re-expressed JVM-side): %, /10, /100, bare float, 0.5 fallback, clamped
    to [0,1]. Same regexes, same branch order — and SQL-replayable, which
    upgrades the score-parsing path from property-tested to oracle-checked.
    Equality with the Python parser is pinned in tests/test_properties.py."""
    t = F.trim(c)
    pct = F.regexp_extract(t, _PCT, 1)
    num = F.regexp_extract(t, _FRAC, 1)
    den = F.regexp_extract(t, _FRAC, 2)
    bare = F.regexp_extract(t, _BARE, 0)
    bare_v = bare.cast("double")
    scaled = (
        F.when(bare_v > 10.0, bare_v / 100.0)
        .when(bare_v > 1.0, bare_v / 10.0)
        .otherwise(bare_v)
    )
    raw = (
        F.when(pct != "", pct.cast("double") / 100.0)
        .when(num != "", num.cast("double") / den.cast("double"))
        .when(bare != "", scaled)
        .otherwise(F.lit(0.5))
    )
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw))


def stub_rerank(
    candidates: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "sim",
    final_k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic rerank of a (small) candidate set: permutation by
    (coarse similarity, md5(id)), score = 1 - (rank-1)/n, keep top final_k.

    The candidate set is ≤ initial_k rows (30 in the reference), so the
    window sort is a single tiny partition — same cost shape as the
    reference's one LLM call, minus the network.
    """
    w = Window.orderBy(
        F.desc(F.round(F.col(sim_col), 2)),
        F.asc(F.md5(F.col(id_col).cast("string"))),
    )
    n = F.count(F.lit(1)).over(Window.partitionBy())
    ranked = candidates.select(
        id_col,
        sim_col,
        F.row_number().over(w).cast("long").alias("rank"),
        F.round(
            F.lit(1.0) - (F.row_number().over(w) - 1) / n, round_digits
        ).alias("rerank_score"),
    )
    return ranked.orderBy(F.asc("rank")).limit(final_k)


def rerank_with(
    candidates: DataFrame,
    ranker: Callable[[list[str]], list[int]],
    query_col: str = "query_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    final_k: int = 10,
) -> DataFrame:
    """Rerank per-query candidate groups with an external ranker callable.

    ``ranker(docs) -> permutation`` is invoked once per query group inside
    ``applyInPandas`` (Arrow-batched; external model calls happen on
    executors, in parallel across queries — the reference's serial
    per-query HTTP loop, distributed). The returned permutation is repaired
    with :func:`parse_ranking` invariants.
    """
    schema = (
        f"{query_col} long, {id_col} long, rank long, rerank_score double"
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sim", ascending=False).reset_index(drop=True)
        n = len(pdf)
        perm = ranker(list(pdf[text_col]))
        # repair to a valid permutation, reference-style
        perm = parse_ranking(" ".join(str(i + 1) for i in perm), n)
        out = pdf.iloc[perm].reset_index(drop=True)
        out["rank"] = range(1, n + 1)
        out["rerank_score"] = [1.0 - i / n for i in range(n)]
        return out[[query_col, id_col, "rank", "rerank_score"]].head(final_k)

    return candidates.groupBy(query_col).applyInPandas(per_query, schema)
