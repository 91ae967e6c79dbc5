"""MMR diversity re-ranking over retrieved candidate sets.

Maximal marginal relevance (Carbonell & Goldstein): greedily pick the
candidate maximizing ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`` — the
diversity-aware sibling of the reference's LLM rerank stage
(/root/reference/db/search_strategies.py:118-215): same
retrieve-candidates-then-reorder shape, different objective.

Spark shape: candidates arrive already top-k'd per query (k·queries rows,
never the corpus), grouped by query id into one Arrow batch each —
``applyInPandas`` with a NumPy pairwise-similarity kernel inside. The
greedy loop is O(k²) per query over ≤ initial_k rows; all parallelism is
across queries. Deterministic: float64 arithmetic with doc-id
tie-breaking, so results are reproducible across partitionings (pinned by
a pure-Python model parity test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def mmr_select(
    rel: "np.ndarray", pair_sim: "np.ndarray", k: int, lam: float
) -> list[tuple[int, float]]:
    """Greedy MMR over one candidate set: returns [(index, mmr_score)] in
    selection order. First pick is pure relevance; ties break on the
    LOWER index (callers pre-sort candidates by (rel desc, id asc))."""
    n = len(rel)
    selected: list[tuple[int, float]] = []
    chosen: list[int] = []
    remaining = list(range(n))
    while remaining and len(chosen) < k:
        best_i, best_v = None, None
        for i in remaining:
            penalty = max((pair_sim[i][j] for j in chosen), default=0.0)
            v = lam * rel[i] - (1.0 - lam) * penalty
            if best_v is None or v > best_v:
                best_i, best_v = i, v
        selected.append((best_i, float(best_v)))
        chosen.append(best_i)
        remaining.remove(best_i)
    return selected


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    emb_col: str = "embedding",
    score_col: str = "sim",
    round_digits: int = 6,
) -> DataFrame:
    """Per-query MMR over candidate rows ``(query_id, doc_id, sim,
    embedding)`` → ``(query_id, doc_id, mmr_rank, mmr_score)``.

    Candidate embeddings are L2-normalized inside the kernel, so the
    diversity penalty is cosine similarity regardless of input scale.
    """
    schema = (
        f"{query_col} long, {id_col} long, mmr_rank long, mmr_score double"
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.array(pdf[emb_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        # Pairwise sims are rounded BEFORE the greedy loop so every float
        # feeding a comparison is reproducible across engines: a SQL
        # replay computing round(cosine, d) from the raw vectors lands on
        # identical penalties (numpy GEMM vs sequential fold differ only
        # past the rounding digit).
        pair = np.round(V @ V.T, round_digits)
        picks = mmr_select(
            pdf[score_col].to_numpy(dtype=np.float64), pair, k, lam
        )
        # Scores are emitted UNROUNDED: the objective 0.7·rel − 0.3·pen
        # over 6-decimal inputs lands on exact 7th-decimal halves, where
        # Python's correctly-rounded round() and a SQL engine's scaled
        # round() disagree on the same double. The raw doubles are
        # bit-identical across engines (identical rounded inputs,
        # identical IEEE ops), so any downstream canonicalization rounds
        # both sides the same way.
        return pd.DataFrame(
            {
                query_col: [pdf[query_col].iloc[0]] * len(picks),
                id_col: [int(pdf[id_col].iloc[i]) for i, _ in picks],
                "mmr_rank": list(range(1, len(picks) + 1)),
                "mmr_score": [v for _, v in picks],
            }
        )

    return candidates.groupBy(query_col).applyInPandas(_mmr, schema)
