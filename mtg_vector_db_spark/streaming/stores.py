"""Crash-safe persistence primitives for the streaming maintainers.

Every maintainer in :mod:`mtg_vector_db_spark.streaming.pipelines` keeps
one or more parquet stores that must stay consistent across micro-batch
replays. foreachBatch gives at-least-once delivery: after a crash
between the sink write and the checkpoint commit, the SAME ``batch_id``
is re-delivered with the same rows. The round-7 discipline (guarded
appends ordered stats-first / index-last) handled the crash-BETWEEN-
writes torn states but treated each parquet append as atomic; a driver
crash mid job-commit can leave a PARTIAL multi-file append already
carrying ``batch_id = N``, and a skip-on-watermark guard then sees
``max(batch_id) = N`` and skips the replay — permanently dropping the
rest of the batch (round-7 ADVICE, medium). Similarly the bounded-state
faces used ``mode("overwrite")`` read-modify-writes, where a crash
after the delete but before the commit destroys the accumulated state
outright.

This module replaces both patterns with two primitives whose replay
story does not depend on append atomicity:

* **Idempotent batch append** (:func:`append_batch` /
  :func:`before_batch`): the store is hive-partitioned by ``batch_id``
  and each micro-batch is written with DYNAMIC partition overwrite —
  a replay of batch N REPLACES partition ``batch_id=N`` wholesale
  instead of double-appending, so any torn partial from the crashed
  attempt is healed, with no watermark guard at all. The one
  obligation on the caller: the batch's rows must be recomputed
  DETERMINISTICALLY on replay, which requires that every read of the
  store during the fold is filtered to ``batch_id < N``
  (:func:`before_batch`) so a torn partial of the current batch can
  never feed back into its own recomputation.

* **Versioned snapshot** (:func:`snapshot_write` /
  :func:`snapshot_read`): read-modify-write state (sketch cells, HLL
  registers, manifests, moments, reservoirs, Bloom bitsets, the CC
  map) is written as immutable version directories
  ``<path>/v<batch_id>`` and committed by the parquet job's
  ``_SUCCESS`` marker; readers see only the newest COMMITTED version.
  A fold for batch N reads the newest committed version STRICTLY
  BELOW N and writes ``v<N>`` — so a replay recomputes ``v<N>`` from
  the same base (never from its own partial output, and never
  double-folds a fully-written-but-unacknowledged ``v<N>``), and a
  crash at any point leaves either no ``v<N>`` or an uncommitted one,
  both invisible to serving reads. Superseded versions are garbage-
  collected down to the two the replay contract needs.

Migration: stores written by the pre-round-8 code (flat appends with a
``batch_id`` DATA column, or un-versioned overwrite states) are not
readable through these primitives; :func:`before_batch` raises a clear
error telling the operator to rebuild rather than risking a silent
wrong watermark (round-7 ADVICE, low). Rebuild = drop the store dir
and replay the source through the maintainer.

On object stores without atomic directory semantics (S3), ``_SUCCESS``
-gated version dirs remain correct (visibility is gated on one marker
object); the partition-overwrite append relies on the cluster's
committer giving per-partition replace, which production deployments
get from a table format (Delta/Iceberg) — the logical discipline here
(replay replaces, never re-appends) is exactly what those formats
implement natively.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

_VERSION_RE = re.compile(r"^v(\d{12})$")


# ---------------------------------------------------------------------------
# Idempotent per-batch appends
# ---------------------------------------------------------------------------


def _store_max_batch(spark: SparkSession, path: str) -> int | None:
    """MAX over the store's batch_id PARTITION column (file-listing
    values only — no row data is read), or None when the store does not
    exist yet."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return None
    if "batch_id" not in df.columns:
        return None
    # collect: single-row aggregate over partition-column values.
    row = df.agg(F.max("batch_id")).collect()[0]
    return row[0]


def read_store(spark: SparkSession, path: str) -> DataFrame | None:
    """Read an append store, or ``None`` when it does not exist OR holds
    no readable data files. The second case is crash-reachable (found by
    the crash-replay harness): a job commit interrupted after creating
    the partition directory but before renaming any task file leaves a
    dir Spark cannot infer a schema from — for a batch-partitioned
    append store that state is exactly "empty", and the replay's
    dynamic overwrite repopulates it. Any OTHER read failure (corrupt
    file, FS hiccup) still raises so the micro-batch retries — the
    round-3 discipline of pipelines._state_df."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cond = None
        for attr in ("getCondition", "getErrorClass"):
            get = getattr(e, attr, None)
            if get is None:
                continue
            try:
                cond = get()
            except Exception:
                continue
            if cond is not None:
                break
        if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            return None
        msg = str(e)
        if "Path does not exist" in msg or "Unable to infer schema" in msg:
            return None
        raise


def append_batch(
    df: DataFrame,
    path: str,
    batch_id: int,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Append one micro-batch's rows as hive partition ``batch_id=N``
    via dynamic partition overwrite. Replaying the same batch REPLACES
    the partition (healing any torn partial from a crashed job commit)
    instead of double-appending. Extra ``partition_cols`` (e.g. the IVF
    ``cell``) nest ABOVE batch_id so layout-pruned serving reads keep
    working.

    A batch id STRICTLY BELOW the store's max cannot be a crash replay
    (within one checkpoint, ids are monotone and only the last batch is
    re-delivered) — it means the checkpoint was reset against an
    existing store, and re-folding history would double it; such
    deliveries are skipped, preserving the store. Reprocessing from
    scratch requires dropping the store with the checkpoint."""
    last = _store_max_batch(df.sparkSession, path)
    if last is not None and batch_id < last:
        return
    (
        df.withColumn("batch_id", F.lit(batch_id).cast("int"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols, "batch_id")
        .parquet(path)
    )


def before_batch(store: DataFrame | None, batch_id: int) -> DataFrame | None:
    """The ONLY legal way for a fold to read its own append store: rows
    strictly before the batch being (re)computed, so a torn partial of
    the current batch can never feed back into its own replay. Raises
    on legacy (un-partitioned) stores rather than inventing a
    watermark."""
    if store is None:
        return None
    if "batch_id" not in store.columns:
        raise ValueError(
            "store lacks a batch_id partition column — it was written by "
            "a pre-round-8 maintainer (flat append). Rebuild it: drop the "
            "store directory and replay the source through the maintainer."
        )
    return store.filter(F.col("batch_id") < F.lit(int(batch_id)))


# ---------------------------------------------------------------------------
# Versioned snapshots
# ---------------------------------------------------------------------------


def _version_dir(path: str, batch_id: int) -> str:
    return os.path.join(path, f"v{int(batch_id):012d}")


def _committed_versions(path: str) -> list[int]:
    """Version ids under ``path`` whose parquet job committed (has the
    ``_SUCCESS`` marker — written after all task files are renamed into
    place, so marker present ⇒ directory complete)."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = _VERSION_RE.match(n)
        if m and os.path.exists(os.path.join(path, n, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(path: str, before: int | None = None) -> int | None:
    vs = _committed_versions(path)
    if before is not None:
        vs = [v for v in vs if v < before]
    return vs[-1] if vs else None


def snapshot_write(df: DataFrame, path: str, batch_id: int) -> None:
    """Write the post-fold state as version ``v<batch_id>`` (mode
    overwrite clears any uncommitted junk from a crashed attempt), then
    GC versions the replay contract no longer needs: everything below
    the newest committed version that is still < batch_id. Storage is
    thereby bounded at two committed versions (current + replay base).

    Like :func:`append_batch`, a batch id strictly below the newest
    committed version is a checkpoint reset against an existing store,
    not a crash replay — skipped, preserving the store."""
    newest = latest_version(path)
    if newest is not None and batch_id < newest:
        return
    df.write.mode("overwrite").parquet(_version_dir(path, batch_id))
    keep = latest_version(path, before=batch_id)
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return
    for n in names:
        m = _VERSION_RE.match(n)
        if not m:
            continue
        v = int(m.group(1))
        if v == batch_id or (keep is not None and v == keep):
            continue
        if v < batch_id:
            shutil.rmtree(os.path.join(path, n), ignore_errors=True)


def snapshot_read(
    spark: SparkSession, path: str, before: int | None = None
) -> DataFrame | None:
    """Newest committed snapshot (optionally strictly before a batch
    id), or ``None`` when the store has no committed version yet. Folds
    MUST pass ``before=batch_id``; serving reads pass nothing."""
    v = latest_version(path, before=before)
    if v is None:
        return None
    return spark.read.parquet(_version_dir(path, v))


def snapshot_rows(
    spark: SparkSession, path: str, before: int | None = None
) -> list:
    """:func:`snapshot_read` + collect, ``[]`` when missing. Callers are
    the bounded-state faces only (sketch cells, registers, manifests,
    moments, reservoir rows — never corpus-sized; same contract as the
    former ``_state_rows``)."""
    df = snapshot_read(spark, path, before=before)
    # collect: bounded per the call-site contracts listed above.
    return [] if df is None else df.collect()


# ---------------------------------------------------------------------------
# Per-bucket versioned snapshots (the bucketed CC map layout)
# ---------------------------------------------------------------------------


def _bucket_dir(path: str, bucket: int) -> str:
    return os.path.join(path, f"bucket={int(bucket)}")


def bucketed_snapshot_buckets(path: str) -> list[int]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("bucket="):
            try:
                out.append(int(n.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def bucketed_snapshot_write(
    df: DataFrame, path: str, bucket_col: str, batch_id: int
) -> None:
    """Write ONLY the buckets present in ``df``, each as its own
    version dir ``bucket=B/v<batch_id>`` — the incremental-rewrite
    property of dynamic partition overwrite with the crash story of
    :func:`snapshot_write`: a bucket flips to the new state only when
    its version dir commits, untouched buckets' files are never
    rewritten, and a replay rewrites exactly the same bucket versions
    from the same ``before=batch_id`` base. The job stages all buckets
    in one write (one Spark job), then renames per bucket."""
    # Checkpoint-reset guard, GLOBAL across buckets (a genuine crash
    # replay is always of the store's max batch id — within one
    # checkpoint ids are monotone and only the last batch re-delivers;
    # a lower id means the checkpoint was reset, and re-folding history
    # must not rewrite byte-frozen buckets).
    gmax = None
    for b in bucketed_snapshot_buckets(path):
        v = latest_version(_bucket_dir(path, b))
        if v is not None and (gmax is None or v > gmax):
            gmax = v
    if gmax is not None and batch_id < gmax:
        return
    stage = os.path.join(path, f".stage-{int(batch_id):012d}")
    shutil.rmtree(stage, ignore_errors=True)
    # Partition the staged job by a SHADOW of the bucket column so the
    # data files keep the real column (a version dir is read directly,
    # below the partition-discovery base, so a hive-pruned column would
    # vanish from the serving read).
    (
        df.withColumn(bucket_col, F.col(bucket_col).cast("long"))
        .withColumn("__pb", F.col(bucket_col))
        .write.mode("overwrite")
        .partitionBy("__pb")
        .parquet(stage)
    )
    for n in os.listdir(stage):
        if not n.startswith("__pb="):
            continue
        b = int(n.split("=", 1)[1])
        newest = latest_version(_bucket_dir(path, b))
        if newest is not None and batch_id < newest:
            # Checkpoint reset against an existing store (see
            # append_batch): never roll a bucket backwards.
            continue
        vdir = _version_dir(_bucket_dir(path, b), batch_id)
        os.makedirs(os.path.dirname(vdir), exist_ok=True)
        shutil.rmtree(vdir, ignore_errors=True)
        os.rename(os.path.join(stage, n), vdir)
        # Commit marker per bucket (the staged job's _SUCCESS lives at
        # the stage root, not under the partition dirs).
        with open(os.path.join(vdir, "_SUCCESS"), "w"):
            pass
        keep = latest_version(_bucket_dir(path, b), before=batch_id)
        for vn in os.listdir(_bucket_dir(path, b)):
            m = _VERSION_RE.match(vn)
            if not m:
                continue
            v = int(m.group(1))
            if v == batch_id or (keep is not None and v == keep):
                continue
            if v < batch_id:
                shutil.rmtree(
                    os.path.join(_bucket_dir(path, b), vn),
                    ignore_errors=True,
                )
    shutil.rmtree(stage, ignore_errors=True)


def bucketed_snapshot_read(
    spark: SparkSession,
    path: str,
    bucket_col: str,
    before: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame | None:
    """Union of each bucket's newest committed version (optionally
    strictly before a batch id; optionally restricted to a bucket
    subset — the partition-pruned affected-bucket read). Directory
    listing is O(buckets), bounded by the layout's ``bucket_by``."""
    want = bucketed_snapshot_buckets(path)
    if buckets is not None:
        bset = {int(b) for b in buckets}
        want = [b for b in want if b in bset]
    paths = []
    for b in want:
        v = latest_version(_bucket_dir(path, b), before=before)
        if v is not None:
            paths.append(_version_dir(_bucket_dir(path, b), v))
    if not paths:
        return None
    return spark.read.parquet(*paths)
