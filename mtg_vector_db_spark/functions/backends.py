"""HTTP model backends for the embed/rerank hooks (SURVEY.md §2.7 V4/V6).

The reference calls a local Ollama service per document with 3 attempts,
``2**attempt`` exponential backoff, and a graceful fallback after
exhaustion (/root/reference/db/db_utils.py:100-136 for embeddings,
283-344 for the reranker). These are the same semantics packaged as
executor-side backends for :func:`functions.embedding.make_embedder` and
:func:`operators.rerank.rerank_with`:

* embeddings FAIL LOUD after retries (``BackendError``) — Spark task
  retry is the outer loop; a silent per-row None would zero vectors
  somewhere inside 100 TB and nobody would notice;
* the reranker falls back to the identity ranking (the reference returns
  the original order with flat scores, db_utils.py:327-329) — a rerank is
  an ordering refinement, so degrading beats dying.

stdlib ``urllib`` only, so the module imports in any environment; tests
exercise it against an in-process HTTP fake (tests/test_backends.py).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable

import numpy as np


class BackendError(RuntimeError):
    """A backend call failed after exhausting its retry budget."""


def with_retries(
    call: Callable[[], object],
    max_retries: int = 3,
    backoff: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
):
    """The reference's retry loop (db_utils.py:116-133): try up to
    ``max_retries`` times, sleeping ``backoff**attempt`` between attempts
    (no sleep after the last). ``sleep`` is injectable so tests assert
    the backoff schedule without waiting it out."""
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return call()
        except Exception as exc:  # urllib errors, bad payloads, timeouts
            last = exc
            if attempt < max_retries - 1:
                sleep(backoff**attempt)
    raise BackendError(f"backend failed after {max_retries} attempts") from last


def _post_json(url: str, payload: dict, timeout: float) -> dict:
    body = json.dumps(payload).encode("utf-8")
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def http_embed_backend(
    url: str,
    dim: int = 64,
    model: str | None = None,
    max_retries: int = 3,
    timeout: float = 30.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[list[str]], np.ndarray]:
    """Batch HTTP embedding backend: POSTs ``{"model", "texts"}`` and
    expects ``{"embeddings": [[...], ...]}`` (the reference's per-text
    Ollama call, batched per Arrow batch). Shape-checks the reply and
    raises :class:`BackendError` after the retry budget."""

    def backend(texts: list[str]) -> np.ndarray:
        def call() -> np.ndarray:
            out = _post_json(url, {"model": model, "texts": texts}, timeout)
            embs = np.asarray(out["embeddings"], dtype=np.float32)
            if embs.shape != (len(texts), dim):
                raise ValueError(
                    f"backend returned shape {embs.shape}, "
                    f"expected {(len(texts), dim)}"
                )
            return embs

        return with_retries(call, max_retries=max_retries, sleep=sleep)

    return backend


def http_rerank_backend(
    url: str,
    model: str | None = None,
    max_retries: int = 3,
    timeout: float = 30.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[list[str]], list[int]]:
    """Listwise HTTP rerank backend: POSTs ``{"model", "query",
    "documents"}`` and expects ``{"ranking": "3 1 5 2 4"}`` — the
    reference's space-separated 1-based reply format, repaired with
    :func:`operators.rerank.parse_ranking`. After the retry budget it
    returns the identity ranking (db_utils.py:327-329's fallback)."""

    def ranker(docs: list[str]) -> list[int]:
        from mtg_vector_db_spark.operators.rerank import parse_ranking

        def call() -> str:
            out = _post_json(
                url, {"model": model, "documents": docs}, timeout
            )
            return str(out["ranking"])

        try:
            reply = with_retries(call, max_retries=max_retries, sleep=sleep)
        except BackendError:
            return list(range(len(docs)))
        return parse_ranking(reply, len(docs))

    return ranker
