"""Text→vector embedding generation (SURVEY.md §2.7 V4).

The reference embeds per-document via serial HTTP calls to a local Ollama
model (/root/reference/db/db_utils.py:100-169; 768-d, 30 s timeout,
3 retries — the 30-60 min ingestion bottleneck, QUICKSTART.md:105-109).

Spark-native shape: an Arrow-batched pandas UDF. Each executor embeds its
partition in vectorized batches; a real model backend plugs in as a
callable (network retries live inside the UDF; Spark task retry is the
outer loop). The default backend is a deterministic md5-based fake so every
test and oracle run is reproducible without any model service.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64


def hash_embed_np(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic unit-norm embedding: md5-seeded pseudo-random floats.
    Stable across processes/engines (no PYTHONHASHSEED dependence)."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(
            hashlib.md5((t or "").encode("utf-8")).digest()[:8], "big"
        )
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        out[i] = (v / np.linalg.norm(v)).astype(np.float32)
    return out


def make_embedder(
    backend: Callable[[list[str]], np.ndarray] | None = None,
    dim: int = DEFAULT_DIM,
) -> Callable[[Column], Column]:
    """Build a pandas_udf column function ``text -> array<float>``.

    ``backend(texts) -> (n, dim) float array`` is called once per Arrow
    batch on the executor — the integration point for a real embedding
    service (batch the HTTP call, retry inside).
    """
    fn = backend or (lambda ts: hash_embed_np(ts, dim))

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        vecs = fn(texts.fillna("").tolist())
        return pd.Series([v.tolist() for v in vecs])

    return embed


def embed_text(c: Column) -> Column:
    """Default deterministic embedder as a column function. Built lazily —
    creating a pandas_udf requires an active session, which doesn't exist
    when executors re-import this module."""
    return make_embedder()(c)
