"""On-disk index ARTIFACTS: the build-once / serve-many split.

The reference's whole value proposition is that indexes are built once at
schema-create time (``/root/reference/db/init.sql:50-53`` — HNSW + trigram
GIN) and every query thereafter only WALKS them
(``/root/reference/db/search_strategies.py:147-162``). The in-query index
builds of p40/p42 are the right shape for self-contained oracles, but they
charge every execution the build cost; this module gives the engine the
other half: a content-addressed parquet artifact store so the serving
queries (p44 graph walk, p45 IVF pruned probe) read a FROZEN index and pay
only query-time work.

Design points, all scale-motivated:

* **Content-addressed**: the artifact key hashes the SOURCE table's
  parquet footprint (file names, sizes, footer row counts — read via
  pyarrow metadata, no Spark job) plus the build parameters and an
  algorithm version. Data or parameters change → different key → rebuild.
  mtimes are deliberately excluded: a fresh ``git clone`` rewrites them,
  and a committed artifact must stay valid across clones.
* **Race-safe**: builders write to a unique temp dir then ``os.rename``
  into place — atomic on POSIX; the loser of a concurrent build removes
  its temp output and reuses the winner's. Validity = the ``_SUCCESS``
  marker Spark's committer writes last, so a crashed half-build is never
  trusted (it is cleared and rebuilt).
* **Cluster note**: local mode uses the filesystem rename; on object
  storage the same protocol is a job-commit concern (write to a staging
  prefix, finalize via the committer) — the fingerprint/key logic is
  storage-agnostic.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable


def artifact_root() -> str:
    """Root directory for index artifacts: ``$SPARK_GRAFT_ARTIFACTS`` if
    set, else ``<repo>/artifacts`` (committed small-scale artifacts ship
    with the repo so fresh clones serve without a first-run build)."""
    env = os.environ.get("SPARK_GRAFT_ARTIFACTS")
    if env:
        return env
    import mtg_vector_db_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    return os.path.join(repo, "artifacts")


def dataset_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a parquet table (file or directory):
    md5 over sorted ``(basename, size, footer num_rows)`` triples. Footer
    reads are O(files), never O(rows) — no Spark job, safe to run per
    query execution."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
    parts = []
    for f in files:
        n_rows = pq.ParquetFile(f).metadata.num_rows
        parts.append(f"{os.path.basename(f)}:{os.path.getsize(f)}:{n_rows}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()


def artifact_key(*fields: object) -> str:
    """Stable 16-hex key over the build descriptor fields."""
    return hashlib.md5(
        "|".join(str(f) for f in fields).encode()
    ).hexdigest()[:16]


def _valid(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_SUCCESS")
    )


def write_partitioned(df, tmp: str, *cols: str) -> None:
    """``df.write.partitionBy(*cols).parquet(tmp)`` that stays READABLE
    when ``df`` is empty (round 8, found by the empty-tables totality
    gate via c31): a partitioned write of zero rows emits only a
    ``_SUCCESS`` marker — no part files, no partition dirs — and a later
    ``spark.read.parquet`` raises UNABLE_TO_INFER_SCHEMA, turning an
    empty corpus into a plan-time error for every stored-layout serving
    query. The empty case is written unpartitioned instead: one
    schema-bearing empty file whose columns (incl. the would-be
    partition columns, in the same trailing order a partitioned read
    appends them) and types are identical, so readers see the same
    empty relation an empty partitioned layout means. The emptiness
    probe is a bounded take(1) on a build-once path."""
    if df.isEmpty():
        df.select(
            *[c for c in df.columns if c not in cols], *cols
        ).write.parquet(tmp)
    else:
        df.write.partitionBy(*cols).parquet(tmp)


def ensure_artifact(path: str, build: Callable[[str], None]) -> str:
    """Build-once guard: if ``path`` holds a completed artifact, return
    ``"reused"``; otherwise run ``build(tmp_dir)`` (which must write a
    parquet dataset incl. ``_SUCCESS``) and atomically rename it into
    place, returning ``"built"``. Concurrent builders: exactly one rename
    wins; losers discard their temp output and reuse the winner's."""
    if _valid(path):
        return "reused"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.isdir(path):
        # Crashed half-build (no _SUCCESS): clear before rebuilding.
        shutil.rmtree(path, ignore_errors=True)
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
        if not _valid(tmp):
            raise RuntimeError(
                f"artifact build produced no _SUCCESS marker at {tmp}"
            )
        try:
            os.rename(tmp, path)
            return "built"
        except OSError:
            # Lost the race — another process renamed first.
            if _valid(path):
                return "reused"
            raise
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
