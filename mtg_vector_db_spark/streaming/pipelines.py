"""Streaming forms of the engine's pipelines.

The reference is entirely batch (SURVEY.md §2.10); these are the clearly
flagged extensions that let the same logical plans run incrementally:

* :func:`streaming_ingest` — the ingestion DAG as readStream+foreachBatch:
  each micro-batch runs the batch dedup/embed pipeline against the current
  sink state (the standard idempotent-upsert pattern).
* :func:`hourly_event_counts` — watermarked tumbling-window aggregation
  over an event stream; the batch query r08_events_hourly is its exact
  batch equivalent (same window spec), which is how we test it.

Persistence discipline (round 8): every maintainer's stores ride the
crash-safe primitives in :mod:`mtg_vector_db_spark.streaming.stores`
(idempotent per-batch partition appends / versioned snapshots), and
every maintainer's fold is exposed as a module-level ``*_fold`` factory
so the crash-replay harness (tests/test_crash_replay.py) can kill and
replay it at arbitrary write boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import DataStreamWriter


def _missing_path(exc: Exception) -> bool:
    """True IFF ``exc`` is Spark's path-does-not-exist error. Prefers the
    STRUCTURED error class (round-4 ADVICE: a Spark release rewording the
    message must not turn every first micro-batch bootstrap into a raise):
    ``getCondition()`` on Spark 4+, ``getErrorClass()`` on older releases.
    The message substring is only the last-resort fallback for exceptions
    that carry no error class at all."""
    for attr in ("getCondition", "getErrorClass"):
        get = getattr(exc, attr, None)
        if get is None:
            continue
        try:
            cond = get()
        except Exception:
            continue
        if cond is not None:
            return cond == "PATH_NOT_FOUND"
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def _state_df(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a maintenance store, or ``None`` IFF the store does not exist
    yet (first micro-batch). Any OTHER read failure — FS hiccup, partial
    or corrupt file — RAISES so the micro-batch fails and the checkpoint
    retries it (round-3 ADVICE): every maintenance face follows this
    read with a merge + overwrite (or a dedup + append), so treating a
    transient failure as "no state yet" would silently replace the
    accumulated state with one batch's worth — unrecoverable in the
    exactness-critical maintainers (moments, Bloom, HLL, CMS)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if _missing_path(e):
            return None
        raise




def hourly_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour event-time windows with late-data watermark.
    Works on both streaming and batch frames (same plan, two runners)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (``session_window`` — dynamic
    windows that close after ``gap`` of inactivity). Batch and streaming
    share the plan; streaming adds the watermark so state for closed
    sessions is dropped. Session bounds come back as epoch-micros longs
    (exact integers — stable for cross-engine comparison)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            key_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def sessionize_chunked(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    chunk: str = "day",
) -> DataFrame:
    """Skew-hardened two-phase sessionization, result-identical to
    :func:`sessionize` (pinned by tests/test_asof_sessions.py).

    ``session_window`` clusters EVERY event of a key into one reducer
    task; a monster key — bot traffic that is 30% of a 100 TB day —
    serializes that task, and AQE cannot split it (skew-split applies to
    joins, and gap-sessionization is not an algebraic partial agg).
    Phase 1 sessionizes within ``(key, date_trunc(chunk))`` via
    gaps-and-islands, bounding every task by events-per-key-per-chunk.
    Phase 2 re-runs gaps-and-islands per key over the per-chunk SESSION
    rows — orders of magnitude fewer than events for any realistic hot
    key — merging sessions that span chunk borders (a session ending
    within ``gap`` of midnight continues into the next day's first
    session). Correctness argument: within a chunk, output sessions are
    ≥ gap apart by construction, so phase 2's merge relation exactly
    reproduces the single-pass islands; chunking by event time keeps
    ``last_ts`` monotone in session-start order, so one lag() suffices.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    w1 = Window.partitionBy(key_col, "_chunk").orderBy(ts_col)
    phase1 = (
        events.withColumn("_chunk", F.date_trunc(chunk, F.col(ts_col)))
        .withColumn("_prev", F.lag(us).over(w1))
        .withColumn(
            "_new",
            F.when(
                # STRICTLY greater: session_window keeps an event at
                # exactly last+gap in the SAME session (probed round 3;
                # [start, last+gap] is closed at the merge step), and
                # this operator's contract is result-identity with it.
                F.col("_prev").isNull() | (us - F.col("_prev") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn(
            "_sid",
            F.sum("_new").over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(key_col, "_chunk", "_sid")
        .agg(
            F.min(us).alias("_first_us"),
            F.max(us).alias("_last_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_val"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("_first_us")
    return (
        phase1.withColumn("_prev_last", F.lag("_last_us").over(w2))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_last").isNull()
                # Same strict-greater boundary as phase 1.
                | (F.col("_first_us") - F.col("_prev_last") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_island",
            F.sum("_new").over(
                w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(key_col, "_island")
        .agg(
            F.min("_first_us").alias("session_start_us"),
            (F.max("_last_us") + gap_us).alias("session_end_us"),
            F.sum("n_events").alias("n_events"),
            F.sum("_val").cast("double").alias("total_value"),
        )
        .select(
            key_col,
            "session_start_us",
            "session_end_us",
            "n_events",
            "total_value",
        )
    )


def streaming_ingest(
    spark: SparkSession,
    source_dir: str,
    docs_path: str,
    rejected_path: str,
    schema: str,
    checkpoint: str,
) -> DataStreamWriter:
    """Incremental ingestion: watch ``source_dir`` for JSON batches, run
    the batch dedup against the sink's current state per micro-batch, and
    append (idempotently, per batch partition — round-8). Start with
    ``.trigger(availableNow=True)`` for catch-up runs."""
    fold = ingest_fold(docs_path, rejected_path)
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def ingest_fold(docs_path: str, rejected_path: str, key: str = "card_name"):
    """:func:`streaming_ingest`'s fold, directly callable for the
    crash-replay harness."""
    from mtg_vector_db_spark.operators.ingest import dedup_against
    from mtg_vector_db_spark.streaming.stores import (
        append_batch,
        before_batch,
        read_store,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        existing = before_batch(read_store(s, docs_path), batch_id)
        new_rows, rejected = dedup_against(batch_df, existing, key=key)
        append_batch(new_rows, docs_path, batch_id)
        append_batch(
            rejected.withColumn("reject_reason", F.lit("duplicate")),
            rejected_path,
            batch_id,
        )

    return upsert


def exactly_once_event_ingest(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    schema: str = "event_id long, ts timestamp, user_id long, "
    "event_type string, value double",
    watermark: str = "1 hour",
) -> DataStreamWriter:
    """At-least-once source → effectively-once sink: drop replayed
    ``event_id``s with ``dropDuplicatesWithinWatermark``, whose dedup
    state is EVICTED once the watermark passes — bounded memory at any
    scale, unlike plain ``dropDuplicates`` whose key set grows forever.
    This is the streaming face of the batch D1 dedup (SURVEY §2.9): same
    business-key semantics, state limited to the replay horizon.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )


def running_user_totals(
    events: DataFrame,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event_count, value_total) emitted on every
    micro-batch, with state evicted after ``timeout_minutes`` of processing
    -time inactivity — the pattern for stateful logic session_window/window
    can't express (counters, custom sessionization, CDC-style merge).

    On a batch DataFrame this falls back to a plain groupBy aggregation
    with identical output (the testable equivalence).
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_neardup_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    verify_threshold: float = 0.5,
) -> "DataStreamWriter":
    """Incremental near-duplicate detection: maintain the MinHash band
    index across micro-batches.

    Per batch: (1) compute band keys for the new documents only;
    (2) join them against the PERSISTED band index (equi-join on the band
    key — new docs only meet old docs that share a bucket, never the whole
    history); (3) verify candidates with exact Jaccard and append the
    surviving (new_id, old_id, jaccard) pairs; (4) append the new band
    keys to the index. The index grows by O(new docs) per batch and the
    batch cost is O(new docs + colliding candidates) — the incremental
    form of the batch minhash_lsh_pairs, for 100 TB corpora that arrive
    continuously.

    Crash consistency (round-8, the stores.py discipline — replacing
    the round-7 watermark guards, whose skip-on-watermark treated a
    multi-file parquet append as atomic): BOTH stores are batch_id-
    partitioned and written with idempotent dynamic partition overwrite
    (stores.append_batch), and every read of either store during the
    fold sees only rows from STRICTLY EARLIER batches
    (stores.before_batch) — so a replay recomputes the batch
    deterministically from the pre-batch state and REPLACES its own
    partitions, healing any torn partial append from the crashed
    attempt instead of skipping past it.
    """
    fold = neardup_fold(index_path, pairs_path, verify_threshold)
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def neardup_fold(
    index_path: str, pairs_path: str, verify_threshold: float = 0.5
):
    """The :func:`streaming_neardup_ingest` micro-batch fold as a
    directly-callable (batch_df, batch_id) hook — factored out so the
    crash-replay harness (tests/test_crash_replay.py) can kill and
    replay it at arbitrary points without a streaming query."""
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.dedup import (
        jaccard,
        minhash_hash_values,
        minhash_signature,
        word_shingles,
    )
    from mtg_vector_db_spark.streaming.stores import (
        append_batch,
        before_batch,
        read_store,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        index = before_batch(read_store(s, index_path), batch_id)
        new_docs = batch_df
        if index is not None:
            new_docs = new_docs.join(
                index.select("doc_id").distinct(), "doc_id", "left_anti"
            )
        sh = new_docs.select(
            "doc_id", word_shingles(F.col("text")).alias("shingles")
        )
        sig = sh.select(
            "doc_id",
            "shingles",
            minhash_hash_values(F.col("shingles")).alias("hv"),
        ).select(
            "doc_id",
            "shingles",
            minhash_signature(F.col("hv"), 16).alias("sig"),
        )
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        *[
                            F.get(F.col("sig"), b * 4 + r).cast("string")
                            for r in range(4)
                        ],
                    ).alias("band_key"),
                )
                for b in range(4)
            ]
        )
        new_banded = sig.select(
            F.col("doc_id"), F.col("shingles"), F.inline(band_structs)
        ).localCheckpoint(eager=True)

        cross_pairs = None
        if index is not None:
            cand = (
                new_banded.alias("n")
                .join(
                    index.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.band_key") == F.col("o.band_key"))
                    & (F.col("n.doc_id") != F.col("o.doc_id")),
                )
                .select(
                    F.col("n.doc_id").alias("id_new"),
                    F.col("o.doc_id").alias("id_old"),
                    F.col("n.shingles").alias("sh_new"),
                    F.col("o.shingles").alias("sh_old"),
                )
                .distinct()
            )
            j = jaccard(F.col("sh_new"), F.col("sh_old"))
            cross_pairs = (
                cand.select(
                    "id_new", "id_old", F.round(j, 6).alias("jaccard")
                )
                .filter(F.col("jaccard") >= verify_threshold)
            )

        # In-batch pairs: same bucket expansion as the batch operator.
        from mtg_vector_db_spark.operators.dedup import bucket_pairs

        inb = bucket_pairs(
            new_banded.select("doc_id", "band", "band_key", "shingles"),
            ["band", "band_key"],
            payload_col="shingles",
        )
        jb = jaccard(F.col("p_a"), F.col("p_b"))
        in_pairs = (
            inb.select(
                F.col("id_b").alias("id_new"),
                F.col("id_a").alias("id_old"),
                F.round(jb, 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= verify_threshold)
        )
        all_pairs = (
            in_pairs
            if cross_pairs is None
            else cross_pairs.unionByName(in_pairs)
        )
        # Idempotent per-batch writes: replay REPLACES both partitions.
        append_batch(all_pairs, pairs_path, batch_id)
        append_batch(
            new_banded.select("doc_id", "shingles", "band", "band_key"),
            index_path,
            batch_id,
        )

    return upsert


def streaming_ivf_ingest(
    spark: SparkSession,
    source_dir: str,
    centroids: DataFrame,
    index_path: str,
    checkpoint: str,
    schema: str = "vec_id long, embedding array<float>",
) -> "DataStreamWriter":
    """Incremental IVF index maintenance: vectors arriving on a stream are
    assigned to the FROZEN coarse quantizer (operators/ann.py:ivf_assign —
    map-side argmin, no shuffle, no refit) and appended into the
    cell-partitioned parquet layout that IS the index. Existing files are
    never rewritten; the probe path (ivf_search over the pruned cells)
    sees new vectors as soon as the batch commits.

    This is the online half of the reference's HNSW build
    (/root/reference/db/init.sql:50-53 — pgvector inserts update the graph
    per row): at 100 TB/day the graph walk is replaced by cell append +
    periodic batch refit (kmeans_ivf_build) when cell-size skew drifts.

    Crash consistency (round-8): rows land under (cell, batch_id)
    partitions via idempotent dynamic overwrite — a replayed batch
    replaces exactly its own (cell, batch_id) leaves (assignment is
    deterministic against the frozen quantizer), so neither a torn
    append nor a re-delivery can duplicate or drop vectors. The probe
    path's cell pruning is unchanged (cell stays the outer partition).
    """
    fold = ivf_ingest_fold(centroids, index_path)
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def ivf_ingest_fold(centroids: DataFrame, index_path: str):
    """:func:`streaming_ivf_ingest`'s fold, directly callable for the
    crash-replay harness."""
    from mtg_vector_db_spark.operators.ann import ivf_assign
    from mtg_vector_db_spark.streaming.stores import append_batch

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(
            ivf_assign(batch_df, centroids),
            index_path,
            batch_id,
            partition_cols=("cell",),
        )

    return upsert


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream (or batch-batch) interval join: each purchase matched
    to the same user's clicks in the ``within`` window ending at the
    purchase → ``(event_id, user_id, purchase_ts, click_ts)`` pairs.

    One plan, two runners (this module's convention): on batch frames it is
    a plain equi-join with a range post-filter; on streaming frames the
    ``watermark`` plus the two-sided time bound lets Spark size and evict
    the join state — the canonical watermarked stream-stream join. The join
    keys on user_id, so both sides shuffle-partition by user; the range
    condition never becomes a nested-loop.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    p = purchases.select(
        "event_id",
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    if watermark is not None:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            > F.col("purchase_ts") - F.expr(f"INTERVAL {within}")
        )
    )
    return p.join(c, cond, "inner").select(
        "event_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_ts",
    )


def enrich_events_stream(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    out_path: str,
    checkpoint: str,
    schema: str = "event_id long, ts timestamp, user_id long, "
    "event_type string, value double",
) -> DataStreamWriter:
    """Stream-static enrichment: join each micro-batch against a static
    dimension (broadcast — the dimension never shuffles the stream).
    The static side is re-resolved per micro-batch, so a dimension
    backed by a path picks up slowly-changing updates without restarts
    — the standard fact-stream × dimension pattern.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    return (
        enriched.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )


def streaming_funnel(
    events: DataFrame,
    horizon_hours: int = 24,
) -> DataFrame:
    """Stateful sequence detection (streaming CEP): per user, first
    'view', then first 'click' within the horizon of it, then first
    'purchase' within the horizon of that — emit ONE conversion row the
    moment the sequence completes. State is three timestamps per user,
    evicted on processing-time timeout; batch r45_event_funnel counts
    the same stages corpus-wide.

    On a batch DataFrame, falls back to the equivalent join-chain and
    returns all completed conversions (the testable equivalence — feed
    the stream time-ordered batches, since state advances in ts order).
    """
    H = horizon_hours * 3_600_000_000  # micros

    if not events.isStreaming:
        v = (
            events.filter(F.col("event_type") == "view")
            .groupBy("user_id").agg(F.min("ts").alias("t_view"))
        )
        c = (
            events.filter(F.col("event_type") == "click")
            .join(v, "user_id")
            .filter(
                (F.col("ts") > F.col("t_view"))
                & (F.unix_micros("ts") <= F.unix_micros("t_view") + H)
            )
            .groupBy("user_id")
            .agg(F.first("t_view").alias("t_view"), F.min("ts").alias("t_click"))
        )
        return (
            events.filter(F.col("event_type") == "purchase")
            .join(c, "user_id")
            .filter(
                (F.col("ts") > F.col("t_click"))
                & (F.unix_micros("ts") <= F.unix_micros("t_click") + H)
            )
            .groupBy("user_id")
            .agg(
                F.first("t_view").alias("t_view"),
                F.first("t_click").alias("t_click"),
                F.min("ts").alias("t_purchase"),
            )
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        # Timeout fired for this key: evict and emit nothing. Completed
        # conversions keep a (tv, tc, tp) tombstone until this TTL so a
        # late replay can't double-emit, but never longer — without this
        # branch the handler below would resurrect and re-arm every
        # timed-out key forever and per-user state would grow unbounded.
        if state.hasTimedOut:
            state.remove()
            return
        tv, tc, tp = state.get if state.exists else (0, 0, 0)
        out = None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                if tp:
                    break
                t = int(row["ts"].value // 1000)  # pandas ns -> us
                et = row["event_type"]
                if et == "view" and not tv:
                    tv = t
                elif et == "click" and tv and not tc and tv < t <= tv + H:
                    tc = t
                elif et == "purchase" and tc and not tp and tc < t <= tc + H:
                    tp = t
                    out = pd.DataFrame(
                        {
                            "user_id": [key[0]],
                            "t_view_us": [tv],
                            "t_click_us": [tc],
                            "t_purchase_us": [tp],
                        }
                    )
        state.update((tv, tc, tp))
        state.setTimeoutDuration(7 * 24 * 3600 * 1000)
        if out is not None:
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, t_view_us long, t_click_us long, "
        "t_purchase_us long",
        stateStructType="tv long, tc long, tp long",
        # each conversion is emitted exactly once — append semantics,
        # which also lets the result feed file sinks directly.
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_bloom_maintenance(
    spark: SparkSession,
    source_dir: str,
    filter_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
) -> "DataStreamWriter":
    """Incremental decontamination-filter maintenance: benchmark documents
    arriving on a stream are folded into the persisted Bloom bitset
    (operators/bloom.py) by ``bit_or`` merge — never a rebuild over the
    accumulated history.

    Per batch: build a bitset over the batch's shingles (O(batch)), merge
    with the stored filter (≤ n_bits/64 rows — the merge is driver-cheap
    regardless of how much history the filter summarizes), and commit
    the merged state as a new snapshot VERSION (stores.snapshot_write —
    round-8: a plain ``mode("overwrite")`` deletes the accumulated
    filter before the new job commits, so a crash in that window
    destroyed state; versioned snapshots make the replacement atomic
    under the ``_SUCCESS`` marker and the fold read
    ``before=batch_id``-safe). The serving side (probe_bloom over the
    training corpus) picks up new benchmark content on its next
    snapshot read. This is the filter-structure analogue of
    streaming_ivf_ingest: frozen geometry, monotone accumulation,
    periodic re-size (bigger n_bits) as a batch job when
    bloom_fill_stats drifts above the FPR budget.
    """
    fold = bloom_fold(filter_path)
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def bloom_fold(filter_path: str):
    """:func:`streaming_bloom_maintenance`'s fold, directly callable
    for the crash-replay harness."""
    from mtg_vector_db_spark.operators.bloom import build_bloom, merge_blooms
    from mtg_vector_db_spark.streaming.stores import (
        snapshot_rows,
        snapshot_write,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        new = build_bloom(batch_df)
        # Bounded by n_bits/64 bitset rows; before=batch_id so a replay
        # folds onto the pre-batch state, not its own partial output.
        old_rows = snapshot_rows(s, filter_path, before=batch_id)
        if old_rows:
            old = s.createDataFrame(old_rows, "word_idx bigint, word bigint")
            new = merge_blooms(old, new)
        snapshot_write(new, filter_path, batch_id)

    return upsert


def streaming_quality_gate(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
) -> "DataStreamWriter":
    """Quality-gate documents as they arrive: apply the within-document
    repetition screen (operators/repetition.py) per micro-batch and
    append the survivors.

    The gate's grain is ONE document — every n-gram of a doc lives in
    its row — so the batch operator is correct on any micro-batch slice
    with no cross-batch state, no watermark, no dedup store. foreachBatch
    (not a streaming agg) because the profile internally aggregates at
    (doc, gram) grain, which append-mode streaming would reject; inside
    the batch hook it is just the batch plan, so batch and stream share
    one implementation and one test oracle. The survivors land via the
    idempotent per-batch partition append (round-8), so a replayed
    batch replaces its own partition instead of double-appending.
    """
    fold = quality_gate_fold(out_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def quality_gate_fold(out_path: str):
    """:func:`streaming_quality_gate`'s fold, directly callable for the
    crash-replay harness."""
    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )
    from mtg_vector_db_spark.streaming.stores import append_batch

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        kept = (
            batch_df.join(
                doc_repetition_profile(batch_df).filter(F.col("keep")),
                "doc_id",
                "left_semi",
            )
        )
        append_batch(kept, out_path, batch_id)

    return gate


def streaming_manifest_maintenance(
    spark: SparkSession,
    source_dir: str,
    manifest_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string, source string",
) -> "DataStreamWriter":
    """Incremental provenance-manifest maintenance: every c19 column is
    additive (counts and token sums add; min/max ids fold; the content
    checksum is a commutative sum), so documents arriving on a stream
    fold into the persisted per-source manifest per micro-batch — the
    manifest-structure analogue of streaming_bloom_maintenance, and the
    proof that c19 never needs a history rescan.

    The additive columns are NOT replay-idempotent (a re-delivered
    micro-batch would double-count n_docs/n_tokens/checksum); round-8
    replaces the ``last_batch`` watermark with the versioned-snapshot
    discipline (stores.snapshot_write): a replay folds the batch onto
    the newest snapshot STRICTLY BELOW its batch id and rewrites the
    same version — double-count impossible by construction, and the
    read-modify-write can no longer destroy state mid-overwrite.
    """
    fold = manifest_fold(manifest_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def manifest_fold(manifest_path: str):
    """:func:`streaming_manifest_maintenance`'s fold, directly callable
    for the crash-replay harness."""
    from mtg_vector_db_spark.functions.textstats import token_count
    from mtg_vector_db_spark.streaming.stores import (
        snapshot_rows,
        snapshot_write,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        h32 = F.conv(
            F.substring(F.md5("text"), 1, 8), 16, 10
        ).cast("long")
        # Bounded by one manifest row per distinct source — a handful
        # of rows, never corpus-sized.
        old_rows = snapshot_rows(s, manifest_path, before=batch_id)
        new = batch_df.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text")).cast("long")).alias(
                "n_tokens"
            ),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum(h32).alias("content_checksum"),
        )
        if old_rows:
            old = s.createDataFrame(
                old_rows,
                "source string, n_docs long, n_tokens long,"
                " min_doc_id long, max_doc_id long,"
                " content_checksum long",
            )
            new = (
                old.unionByName(new)
                .groupBy("source")
                .agg(
                    F.sum("n_docs").alias("n_docs"),
                    F.sum("n_tokens").alias("n_tokens"),
                    F.min("min_doc_id").alias("min_doc_id"),
                    F.max("max_doc_id").alias("max_doc_id"),
                    F.sum("content_checksum").alias("content_checksum"),
                )
            )
        snapshot_write(new, manifest_path, batch_id)

    return upsert


def streaming_paragraph_dedup(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    store_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    para_tokens: int = 8,
) -> "DataStreamWriter":
    """Incremental CCNet paragraph dedup (batch face:
    operators/dedup.py:paragraph_dedup): documents arriving on a stream
    are stripped of paragraphs whose fingerprint was already seen — in
    the persisted store (all prior batches) or earlier in this batch —
    then reassembled and appended; NEW fingerprints are appended to the
    store.

    First-occurrence is ARRIVAL order across batches (within a batch,
    (doc_id, para_id) order — identical to the batch operator on that
    slice), so stream output equals the batch operator whenever arrival
    order respects doc_id order, which the equivalence test pins.

    Scale shape: per batch one fingerprint-keyed window over BATCH
    paragraphs plus one left-anti join against the store (keyed probe,
    never a history rescan); the store grows O(new unique paragraphs)
    per batch via parquet append — it is corpus-fingerprint-sized, so it
    is never collected to the driver (contrast the bounded Bloom/manifest
    collects above).

    Crash consistency (round-8, the stores.py discipline): both stores
    are batch_id-partitioned with idempotent dynamic overwrite
    (stores.append_batch) and the fold reads the fingerprint store at
    ``before=batch_id`` only — a replay recomputes the batch from the
    pre-batch state and replaces its own partitions, so torn partial
    appends heal instead of being skipped past.
    """
    fold = paragraph_dedup_fold(out_path, store_path, para_tokens)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def paragraph_dedup_fold(
    out_path: str, store_path: str, para_tokens: int = 8
):
    """:func:`streaming_paragraph_dedup`'s fold, directly callable for
    the crash-replay harness."""
    from mtg_vector_db_spark.functions.textstats import fingerprint
    from mtg_vector_db_spark.operators.dedup import doc_paragraphs
    from mtg_vector_db_spark.streaming.stores import (
        append_batch,
        before_batch,
        read_store,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        store = before_batch(read_store(s, store_path), batch_id)
        paras = doc_paragraphs(batch_df, para_tokens=para_tokens).withColumn(
            "fp", fingerprint(F.col("ptext"))
        )
        seen = store.select("fp") if store is not None else None
        w = Window.partitionBy("fp").orderBy("doc_id", "para_id")
        first_in_batch = (
            paras.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        fresh = (
            first_in_batch.join(seen, "fp", "left_anti")
            if seen is not None
            else first_in_batch
        )
        kept = fresh.select("doc_id", "para_id", F.lit(True).alias("kept"))
        out = (
            paras.join(kept, ["doc_id", "para_id"], "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_paras"),
                F.sum(
                    F.coalesce(F.col("kept"), F.lit(False)).cast("long")
                ).alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.coalesce(
                                        F.col("kept"), F.lit(False)
                                    ),
                                    F.struct("para_id", "ptext"),
                                )
                            )
                        ),
                        lambda st: st["ptext"],
                    ),
                    " ",
                ).alias("text_kept"),
            )
        )
        # Idempotent per-batch writes: replay REPLACES both partitions.
        append_batch(out, out_path, batch_id)
        # Append only the batch's new fingerprints: O(new), no rebuild.
        append_batch(fresh.select("fp"), store_path, batch_id)

    return fold


def streaming_hll_maintenance(
    spark: SparkSession,
    source_dir: str,
    registers_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string, source string",
) -> "DataStreamWriter":
    """Incremental distinct-cardinality tracking: documents arriving on a
    stream fold into a persisted HLL register store
    (operators/sketches.py) by per-bucket MAX — never a recount over the
    accumulated history.

    Per batch: sketch the batch's texts (O(batch), map-side combined),
    merge with the stored registers, commit the merged state as a new
    snapshot version (stores.snapshot_write — round-8: the former
    ``mode("overwrite")`` could destroy the accumulated registers on a
    mid-overwrite crash). The serving side (``hll_estimate`` over the
    newest committed snapshot) answers "how many distinct documents has
    this source ever sent" from ≤ sources × 4096 rows no matter how
    much history the registers summarize. MAX-merge makes replays
    idempotent anyway; the ``before=batch_id`` fold read makes that
    unconditional rather than algebra-dependent.
    """
    fold = hll_fold(registers_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def hll_fold(registers_path: str):
    """:func:`streaming_hll_maintenance`'s fold, directly callable for
    the crash-replay harness."""
    from mtg_vector_db_spark.operators.sketches import hll_registers
    from mtg_vector_db_spark.streaming.stores import (
        snapshot_rows,
        snapshot_write,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        new = hll_registers(
            batch_df.filter(F.col("text").isNotNull()),
            F.col("text"),
            ["source"],
        )
        # Bounded by sources × 4096 register rows — the whole point of
        # the sketch is that this cap never grows.
        old_rows = snapshot_rows(s, registers_path, before=batch_id)
        if old_rows:
            old = s.createDataFrame(
                old_rows, "source string, bucket int, m_j int"
            )
            new = (
                new.unionByName(old)
                .groupBy("source", "bucket")
                .agg(F.max("m_j").alias("m_j"))
            )
        snapshot_write(new, registers_path, batch_id)

    return fold


def streaming_cms_maintenance(
    spark: SparkSession,
    source_dir: str,
    sketch_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string, source string",
) -> "DataStreamWriter":
    """Incremental token-frequency sketch: arriving documents fold into
    the persisted count-min cells (operators/sketches.py) by per-cell
    SUM.

    Unlike the bloom/HLL faces, SUM-merge is NOT idempotent — a
    replayed micro-batch would double-count. Round-8 retires the
    ``last_batch`` watermark for the versioned-snapshot discipline: a
    replay folds the batch onto the newest snapshot STRICTLY BELOW its
    batch id and rewrites the same version, so the non-idempotent SUM
    is effectively-once by construction AND a mid-overwrite crash can
    no longer destroy the sketch.

    The store stays ≤ depth × width cells forever — heavy-hitter
    probes against unbounded history from 32 KiB of state.
    """
    fold = cms_fold(sketch_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def cms_fold(sketch_path: str):
    """:func:`streaming_cms_maintenance`'s fold, directly callable for
    the crash-replay harness."""
    from mtg_vector_db_spark.functions.text import tokens
    from mtg_vector_db_spark.operators.sketches import cms_build
    from mtg_vector_db_spark.streaming.stores import (
        snapshot_rows,
        snapshot_write,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # Bounded by depth × width sketch cells.
        old_rows = snapshot_rows(s, sketch_path, before=batch_id)
        toks = batch_df.filter(F.col("text").isNotNull()).select(
            F.explode(tokens(F.lower(F.col("text")))).alias("token")
        )
        tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        new = cms_build(tc)
        if old_rows:
            old = s.createDataFrame(
                old_rows, "row int, cell long, total long"
            )
            new = (
                new.unionByName(old)
                .groupBy("row", "cell")
                .agg(F.sum("total").alias("total"))
            )
        snapshot_write(new, sketch_path, batch_id)

    return fold


def streaming_reservoir_maintenance(
    spark: SparkSession,
    source_dir: str,
    reservoir_path: str,
    checkpoint: str,
    k: int = 20,
    schema: str = "doc_id long, text string, source string, n_chars long",
) -> "DataStreamWriter":
    """Incremental weighted reservoir (Efraimidis–Spirakis A-ES):
    arriving documents keep a quality/size-weighted sample of the WHOLE
    stream history in k rows of state.

    The A-ES key (operators/corpus.py aes_key) is deterministic per
    doc, which turns sampling into merge algebra: the global top-K by
    key over all history equals the top-K of (stored top-K ∪ batch) —
    so each micro-batch unions k + |batch| rows, dedups by doc_id (a
    replayed batch contributes byte-identical rows), and takes the
    top-K again — committed as a snapshot version (round-8:
    stores.snapshot_write, closing the mid-overwrite crash window).
    Idempotence falls out of the merge itself (distinct ∘ top-K) and of
    the ``before=batch_id`` fold read; unlike reservoir algorithms with
    mutable random state, a crash replay cannot skew inclusion
    probabilities because nothing is random at fold time.

    State stays exactly ≤ k rows forever; the fold is one TakeOrdered
    over k + |batch| rows per micro-batch.
    """
    fold = reservoir_fold(reservoir_path, k)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def reservoir_fold(reservoir_path: str, k: int = 20):
    """:func:`streaming_reservoir_maintenance`'s fold, directly
    callable for the crash-replay harness."""
    from mtg_vector_db_spark.operators.corpus import aes_key
    from mtg_vector_db_spark.streaming.stores import (
        snapshot_rows,
        snapshot_write,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        new = batch_df.select(
            "doc_id",
            F.col("n_chars").alias("weight_chars"),
            aes_key(F.col("doc_id"), F.col("n_chars")).alias("es_key"),
        )
        # Bounded by the k stored reservoir rows.
        old_rows = snapshot_rows(s, reservoir_path, before=batch_id)
        if old_rows:
            old = s.createDataFrame(
                old_rows, "doc_id long, weight_chars long, es_key double"
            )
            new = new.unionByName(old)
        snapshot_write(
            new.distinct().orderBy(F.desc("es_key"), "doc_id").limit(k),
            reservoir_path,
            batch_id,
        )

    return fold


def streaming_winnow_decontamination(
    spark: SparkSession,
    source_dir: str,
    eval_fp_path: str,
    report_path: str,
    checkpoint: str,
    k: int = 5,
    w: int = 4,
    max_shared: int = 0,
    schema: str = "doc_id long, text string, source string",
) -> "DataStreamWriter":
    """Exact-span decontamination of a training stream against a FROZEN
    eval set: arriving documents are winnowed (operators/dedup.py
    winnow_fingerprints — any shared run of ≥ w+k−1 tokens with an eval
    doc is guaranteed to share a fingerprint) and probed against the
    eval set's persisted fingerprint store; docs sharing more than
    ``max_shared`` fingerprints are reported as contaminated.

    The complement of streaming_bloom_maintenance: the Bloom face grows
    a probabilistic SET of the eval corpus and answers "probably seen",
    this face keeps the EXACT winnowed span sample (state bounded by
    the EVAL set — ~2/(w+1) of its gram stream, built once offline via
    winnow_fingerprints and never touched by the stream) and answers
    with zero false negatives for runs ≥ w+k−1 tokens. Per batch: the
    batch is winnowed (O(batch), scan-side array domain), one join
    against the store keyed on 60-bit fingerprint ints, one idempotent
    per-batch partition append of the per-doc report (round-8:
    stores.append_batch — a replay replaces its own partition, so the
    former read-side (batch_id, doc_id) dedup contract is gone; the
    report is exact as stored).
    """
    fold = winnow_probe_fold(eval_fp_path, report_path, k, w, max_shared)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def winnow_probe_fold(
    eval_fp_path: str,
    report_path: str,
    k: int = 5,
    w: int = 4,
    max_shared: int = 0,
):
    """:func:`streaming_winnow_decontamination`'s fold, directly
    callable for the crash-replay harness."""
    from mtg_vector_db_spark.operators.dedup import winnow_fingerprints
    from mtg_vector_db_spark.streaming.stores import append_batch

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        fp = winnow_fingerprints(batch_df, k=k, w=w)
        store = s.read.parquet(eval_fp_path).select(
            F.col("fp").alias("fp"), F.lit(1).alias("hit")
        )
        shared = (
            fp.join(store, "fp", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_fp"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias(
                    "n_shared"
                ),
            )
            .filter(F.col("n_shared") > max_shared)
        )
        append_batch(shared, report_path, batch_id)

    return probe


def streaming_graph_append(
    spark: SparkSession,
    source_dir: str,
    graph_path: str,
    corpus_path: str,
    out_path: str,
    checkpoint: str,
    n_buckets: int = 16,
    k: int = 10,
    schema: str = "vec_id long, embedding array<float>",
) -> "DataStreamWriter":
    """Incremental k-NN-GRAPH maintenance: vectors arriving on a stream
    get neighbor lists against the FROZEN graph + corpus
    (operators/ann.py:nn_descent_append — bucket-mates plus their frozen
    lists, exact rescore) and the lists are appended; existing lists are
    never rewritten. The graph sibling of streaming_ivf_ingest, and the
    online half of the reference's per-row HNSW insert
    (/root/reference/db/init.sql:50-53) — at 100 TB/day the sequential
    graph walk becomes a keyed candidate join per micro-batch, with the
    periodic batch rebuild (nn_descent rounds) as the refit path.

    Each new vector's list depends only on the frozen state — no
    cross-batch coupling — so any micro-batch slicing produces exactly
    the lists the one-shot batch append would (pinned by the stream ≡
    batch test), and the idempotent per-batch partition append
    (round-8: stores.append_batch) makes a replayed batch replace its
    own lists instead of double-appending them.
    """
    fold = graph_append_fold(graph_path, corpus_path, out_path, n_buckets, k)
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def graph_append_fold(
    graph_path: str,
    corpus_path: str,
    out_path: str,
    n_buckets: int = 16,
    k: int = 10,
):
    """:func:`streaming_graph_append`'s fold, directly callable for the
    crash-replay harness."""
    from mtg_vector_db_spark.operators.ann import nn_descent_append
    from mtg_vector_db_spark.streaming.stores import append_batch

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        graph = s.read.parquet(graph_path)
        corpus = s.read.parquet(corpus_path)
        append_batch(
            nn_descent_append(
                graph, corpus, batch_df, n_buckets=n_buckets, k=k
            ),
            out_path,
            batch_id,
        )

    return upsert


def streaming_lsh_maintenance(
    spark: SparkSession,
    source_dir: str,
    buckets_path: str,
    checkpoint: str,
    schema: str = "vec_id long, embedding array<float>",
    n_tables: int | None = None,
    bucket_length: float | None = None,
    seed: int | None = None,
    dim: int = 64,
) -> "DataStreamWriter":
    """Incremental RP-LSH bucket-table maintenance — the p50 store's
    streaming face, completing the incremental set for the last index
    family (graph / IVF / IVF-PQ / trigram / BM25 / CC / sketches all
    have one; the MRL prefix store needs none beyond a plain projection
    append, being a pure per-row column slice). Planes are FROZEN
    seeded literals (the same rp_planes every batch — an LSH table is
    only consistent under one plane set), so each arriving vector's 8
    bucket rows depend on nothing but itself: per-batch work is
    O(batch), history is never rescanned, any micro-batch slicing
    yields exactly the one-shot table (stream ≡ batch pinned).
    Re-delivered vectors are skipped by anti-join against STRICTLY
    EARLIER batches (bucket rows are per-vector-complete; double rows
    would double candidates); a replayed batch replaces its own
    partition via the idempotent append (round-8: stores.append_batch).
    Serving probes the store exactly like p50 probes the artifact: the
    query's (table, bucket) pairs pushed to the scan, distinct
    candidates, exact rescore."""
    fold = lsh_maintenance_fold(
        buckets_path, n_tables, bucket_length, seed, dim
    )
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def lsh_maintenance_fold(
    buckets_path: str,
    n_tables: int | None = None,
    bucket_length: float | None = None,
    seed: int | None = None,
    dim: int = 64,
):
    """:func:`streaming_lsh_maintenance`'s fold, directly callable for
    the crash-replay harness."""
    from mtg_vector_db_spark.operators.ann import (
        RP_BUCKET_LENGTH,
        RP_SEED,
        RP_TABLES,
        rp_planes,
    )
    from mtg_vector_db_spark.functions.vector import dot, l2_normalize
    from mtg_vector_db_spark.streaming.stores import (
        append_batch,
        before_batch,
        read_store,
    )

    nt = n_tables if n_tables is not None else RP_TABLES
    bl = bucket_length if bucket_length is not None else RP_BUCKET_LENGTH
    sd = seed if seed is not None else RP_SEED
    planes = rp_planes(dim, nt, sd)
    planes_lit = F.array(*[F.array(*[F.lit(v) for v in p]) for p in planes])

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        existing = before_batch(read_store(s, buckets_path), batch_id)
        new = batch_df.filter(F.col("vec_id").isNotNull())
        if existing is not None:
            new = new.join(
                existing.select("vec_id").distinct(), "vec_id", "left_anti"
            )
        nx = l2_normalize(F.col("embedding"))
        buckets = F.transform(
            F.sequence(F.lit(1), F.lit(nt)),
            lambda w: F.struct(
                w.cast("int").alias("w"),
                F.floor(
                    F.round(
                        dot(F.element_at(planes_lit, w.cast("int")), nx)
                        / F.lit(bl),
                        9,
                    )
                ).cast("long").alias("b"),
            ),
        )
        append_batch(
            new.select("vec_id", F.explode(buckets).alias("wb")).select(
                F.col("wb.w").alias("w"), F.col("wb.b").alias("b"), "vec_id"
            ),
            buckets_path,
            batch_id,
        )

    return fold


def refresh_appended_graph_store(
    spark: SparkSession,
    graph_path: str,
    corpus_path: str,
    appended_lists_path: str,
    new_vectors_path: str,
    k: int = 10,
    rounds: int = 1,
) -> str:
    """Periodic BATCH refit of the appended graph region — the job a
    scheduler runs between streaming_graph_append micro-batches (the
    graph twin of an IVF refit; round-5 VERDICT #5). Reads the frozen
    graph + the live appended-lists store + the appended vectors, runs
    :func:`~mtg_vector_db_spark.operators.ann.nn_descent_refresh_appended`
    (bounded re-descent seeded from the appended nodes' current lists;
    O(|appended|·k²), corpus lists untouched), and writes the REFRESHED
    appended lists as a content-addressed artifact.

    The artifact key hashes the frozen graph's AND the appended store's
    parquet fingerprints plus the refresh params — so every new append
    batch bumps the key (a fresh refresh runs over the grown backlog)
    while re-running with unchanged inputs reuses the existing artifact
    byte-for-byte (test-pinned, with the stream-appended ≡ one-shot
    batch-appended refresh equality). Returns the artifact path; serving
    reads frozen graph ∪ this artifact instead of frozen ∪ live store."""
    import os

    from mtg_vector_db_spark.operators.ann import (
        nn_descent_refresh_appended,
    )
    from mtg_vector_db_spark.operators.artifacts import (
        artifact_key,
        artifact_root,
        dataset_fingerprint,
        ensure_artifact,
    )

    key = artifact_key(
        "graph_appended_refresh",
        "v1",
        k,
        rounds,
        dataset_fingerprint(graph_path),
        dataset_fingerprint(appended_lists_path),
    )
    path = os.path.join(artifact_root(), "graph_refresh", key)

    def build(tmp: str) -> None:
        g = spark.read.parquet(graph_path)
        app = spark.read.parquet(appended_lists_path).select(
            "a", "b", "sim"
        )
        corpus = spark.read.parquet(corpus_path)
        new = spark.read.parquet(new_vectors_path)
        refreshed = nn_descent_refresh_appended(
            g.unionByName(app), corpus, new, k=k, rounds=rounds
        )
        refreshed.join(
            new.select(F.col("vec_id").alias("a")), "a", "left_semi"
        ).write.parquet(tmp)

    ensure_artifact(path, build)
    return path


def streaming_moment_maintenance(
    spark: SparkSession,
    source_dir: str,
    stats_path: str,
    checkpoint: str,
    schema: str = "vec_id long, embedding array<float>",
) -> "DataStreamWriter":
    """Incremental per-dimension embedding MOMENTS — the sufficient
    statistics behind the spectral diagnostics (plans/vector_queries.py
    v16/v17: mean vector, per-dim variance, trace) maintained as
    vectors arrive, so "has the corpus drifted / collapsed?" is a
    64-row read instead of a history rescan.

    State is exact and additive BY CONSTRUCTION: components are folded
    to ABSOLUTE nano-unit integers (floor(x·1e9 + 0.5) — a fixed scale,
    unlike the batch queries' corpus-max relative scale, because a
    data-dependent scale is not mergeable) and summed as DECIMAL(38,0),
    so any micro-batch slicing produces bit-identical state (stream ≡
    batch pinned). Σv and Σv² per dim + n; mean = Σv·1e-9/n,
    var = Σv²·1e-18/n − mean². The integer sums are NOT
    replay-idempotent; round-8 retires the ``last_batch`` watermark for
    the versioned-snapshot discipline (fold onto the newest snapshot
    strictly below the batch id, rewrite the same version — see
    streaming_cms_maintenance). State is 64 rows forever — the
    d-bounded analog of the sketch faces.
    """
    fold = moment_fold(stats_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def moment_fold(stats_path: str):
    """:func:`streaming_moment_maintenance`'s fold, directly callable
    for the crash-replay harness."""
    from mtg_vector_db_spark.streaming.stores import (
        snapshot_rows,
        snapshot_write,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # Bounded by one row per embedding dimension.
        old_rows = snapshot_rows(s, stats_path, before=batch_id)
        eint = F.transform(
            F.col("embedding"),
            lambda y: F.floor(y.cast("double") * F.lit(1e9) + F.lit(0.5)),
        )
        new = (
            batch_df.filter(F.col("embedding").isNotNull())
            .select(F.posexplode(eint).alias("dim", "val"))
            .groupBy("dim")
            .agg(
                F.sum(F.col("val").cast("decimal(38,0)")).alias("s"),
                # decimal BEFORE the square: long·long overflows int64
                # for |x| > ~3 (the v16 fuzz lesson — absolute scale
                # here, so large-magnitude embeddings must stay safe).
                F.sum(
                    F.col("val").cast("decimal(19,0)")
                    * F.col("val").cast("decimal(19,0)")
                ).cast("decimal(38,0)").alias("sq"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        if old_rows:
            old = s.createDataFrame(
                old_rows,
                "dim int, s decimal(38,0), sq decimal(38,0), n long",
            )
            new = (
                new.unionByName(old)
                .groupBy("dim")
                .agg(
                    F.sum("s").cast("decimal(38,0)").alias("s"),
                    F.sum("sq").cast("decimal(38,0)").alias("sq"),
                    F.sum("n").alias("n"),
                )
            )
        snapshot_write(new, stats_path, batch_id)

    return fold


def streaming_vocab_maintenance(
    spark: SparkSession,
    source_dir: str,
    vocab_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
) -> "DataStreamWriter":
    """Incremental word-TYPE count store — the BPE trainer's sufficient
    statistics (operators/bpe.py:word_types) kept fresh as documents
    arrive, so tokenizer (re-)training reads a maintained table instead
    of rescanning corpus history.

    Store shape: APPEND-ONLY per-batch deltas ``(tok, freq)`` under
    ``batch_id`` partitions — the unbounded-state discipline of the
    paragraph-dedup face (the vocabulary is corpus-sized, so unlike the
    sketch faces it is NEVER collected to the driver). Serving reads
    aggregate with :func:`vocab_counts` (SUM per tok — addition is
    associative, so any micro-batch slicing folds to the batch answer;
    the equivalence test pins stream ≡ batch AND trained-merges ≡
    batch-trained-merges). Appended deltas are O(batch vocabulary) per
    batch; compact periodically with operators/partitioning.py:compact
    if small files accumulate.

    SUM-merge is not idempotent; round-8 replaces the high-watermark
    skip with the idempotent per-batch partition append
    (stores.append_batch) — a replayed batch replaces its own delta
    partition, effectively-once without trusting append atomicity.
    """
    fold = vocab_fold(vocab_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def vocab_fold(vocab_path: str):
    """:func:`streaming_vocab_maintenance`'s fold, directly callable
    for the crash-replay harness."""
    from mtg_vector_db_spark.operators.bpe import word_types
    from mtg_vector_db_spark.streaming.stores import append_batch

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(
            word_types(batch_df.filter(F.col("text").isNotNull())),
            vocab_path,
            batch_id,
        )

    return fold


def vocab_counts(spark: SparkSession, vocab_path: str) -> DataFrame:
    """Serving read of the maintained vocab store: fold the per-batch
    deltas to ``(tok, freq)`` — drop-in input for operators/bpe.bpe_train."""
    return (
        spark.read.parquet(vocab_path)
        .groupBy("tok")
        .agg(F.sum("freq").alias("freq"))
    )


def streaming_cc_maintenance(
    spark: SparkSession,
    source_dir: str,
    clusters_path: str,
    checkpoint: str,
    schema: str = "id_a long, id_b long",
    bucket_by: int | None = None,
) -> "DataStreamWriter":
    """Incremental connected components over an arriving near-dup pair
    stream — the streaming face of
    operators/corpus.dup_clusters_converged (round-4 VERDICT #8): per
    micro-batch only the components the new pairs TOUCH are re-solved;
    untouched clusters pass through by identity.

    Per batch, with the persisted map M: ``doc_id -> cluster_id``:

    1. Translate each new pair's endpoints through M (left join +
       coalesce-to-self). Endpoints inside known clusters collapse to
       their cluster ROOTS, so the CC instance below is over touched
       roots plus genuinely new doc ids — bounded by the batch and what
       it touches, never by corpus history.
    2. Run the convergence-safe batch resolver on the translated edges
       (the SAME operator — same star-contraction, same fixpoint raise),
       yielding a remap ``old root / new doc -> final root``.
    3. Rewrite M: a join on ``cluster_id`` relabels every member of a
       merged cluster in one pass; an anti-join appends first-seen docs.

    Exactness: every stored cluster is connected by induction, so
    contracting it to its root preserves the union graph's components —
    after any batch the map equals ``dup_clusters_converged`` over ALL
    pairs ever seen (pinned stream ≡ batch on planted cross-batch
    merges, incl. a chain assembled one edge per batch).

    Replay: folding the same pairs twice is IDEMPOTENT — their endpoints
    then map into one root, the translated edges vanish at the
    ``lo != hi`` filter, and the rewrite is the identity — so no
    batch-id watermark is needed (the monotone-accumulation contract of
    the Bloom/HLL faces, by graph semantics instead of bit algebra).

    Scale: the CC solve is bounded by touched components and the remap
    is broadcast-small (one row per touched root). With ``bucket_by``
    unset the relabel rewrites the full map per batch (fine for
    moderate stores); set ``bucket_by=N`` for the 100 TB layout — the
    map is hive-partitioned by ``pmod(doc_id, N)`` and the rewrite uses
    DYNAMIC PARTITION OVERWRITE over only the buckets holding RELABELED
    docs (changed labels + first-seen rows): untouched buckets' files
    are never rewritten (test-pinned via partition mtimes). Bucketing
    keys on doc_id, NOT cluster_id, deliberately: a doc's bucket is
    immutable, so a cluster merge can never strand stale rows in a
    partition the dynamic overwrite doesn't emit (the cluster-keyed
    layout has exactly that hazard when every member leaves a bucket).
    The affected-bucket read is itself partition-pruned (broadcast join
    on the partition column → DPP, the p45 mechanism). The new map is
    pinned (eager localCheckpoint) before the overwrite so the write
    never reads its own input files.
    """
    fold = cc_maintenance_fold(clusters_path, bucket_by)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def cc_maintenance_fold(clusters_path: str, bucket_by: int | None = None):
    """:func:`streaming_cc_maintenance`'s fold, directly callable for
    the crash-replay harness. Round-8 storage: the map lives in
    versioned snapshots (whole-map when unbucketed, PER-BUCKET when
    bucketed — stores.bucketed_snapshot_write), so the rewrite commits
    atomically under ``_SUCCESS`` markers and a replay folds onto the
    pre-batch map; the former dynamic-partition-overwrite rewrite could
    lose a bucket outright if the driver died between the partition
    delete and the staged-file rename, a torn state no replay could
    heal because the batch's pairs need not mention every doc of a
    relabeled bucket."""
    from mtg_vector_db_spark.operators.corpus import dup_clusters_converged
    from mtg_vector_db_spark.session import pin
    from mtg_vector_db_spark.streaming.stores import (
        bucketed_snapshot_read,
        bucketed_snapshot_write,
        snapshot_read,
        snapshot_write,
    )

    def cc_fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if bucket_by is None:
            m = snapshot_read(s, clusters_path, before=batch_id)
        else:
            m = bucketed_snapshot_read(
                s, clusters_path, "cluster_bucket", before=batch_id
            )
        pairs = batch_df.filter(
            F.col("id_a").isNotNull() & F.col("id_b").isNotNull()
        )
        if m is None:
            cols = "doc_id long, cluster_id long"
            if bucket_by is not None:
                cols += ", cluster_bucket long"
            m = s.createDataFrame([], cols)
        elif bucket_by is not None:
            m = m.withColumn(
                "cluster_bucket", F.col("cluster_bucket").cast("long")
            )
        translated = (
            pairs.join(
                m.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("cluster_id").alias("_ra"),
                ),
                "id_a",
                "left",
            )
            .join(
                m.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("cluster_id").alias("_rb"),
                ),
                "id_b",
                "left",
            )
            .select(
                F.coalesce("_ra", F.col("id_a")).alias("id_a"),
                F.coalesce("_rb", F.col("id_b")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )
        remap = dup_clusters_converged(translated).select(
            F.col("doc_id").alias("old_id"),
            F.col("cluster_id").alias("new_root"),
        )
        relabeled = (
            m.join(
                F.broadcast(remap.withColumnRenamed("old_id", "cluster_id")),
                "cluster_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("new_root", F.col("cluster_id")).alias("cluster_id"),
            )
        )
        first_seen = remap.join(
            m.select("doc_id"),
            remap["old_id"] == m["doc_id"],
            "left_anti",
        ).select(
            F.col("old_id").alias("doc_id"),
            F.col("new_root").alias("cluster_id"),
        )
        if bucket_by is None:
            snapshot_write(
                pin(relabeled.unionByName(first_seen)),
                clusters_path,
                batch_id,
            )
            return
        # Bucketed path: rewrite ONLY the buckets holding relabeled or
        # first-seen docs, each as its own committed snapshot version.
        bkt = lambda c: F.pmod(F.col(c), F.lit(bucket_by))  # noqa: E731
        remap_cid = F.broadcast(
            remap.withColumnRenamed("old_id", "cluster_id")
        )
        changed_buckets = (
            m.join(remap_cid, "cluster_id")
            .filter(F.col("new_root") != F.col("cluster_id"))
            .select(bkt("doc_id").alias("cluster_bucket"))
            .unionByName(
                first_seen.select(bkt("doc_id").alias("cluster_bucket"))
            )
            .distinct()
        )
        # collect: bounded by the layout's bucket_by (≤ one row per
        # bucket, a config-sized constant — the bucket ids steer the
        # driver's version-dir selection below, the path-level analogue
        # of the former broadcast-DPP bucket probe).
        blist = [r["cluster_bucket"] for r in changed_buckets.collect()]
        if not blist:
            # Nothing relabeled and nothing first-seen: the pre-batch
            # map is already the post-batch map; no bucket versions to
            # commit.
            return
        # Partition-pruned read of just the affected buckets (version
        # dirs selected by bucket id — only those paths are scanned).
        affected = bucketed_snapshot_read(
            s,
            clusters_path,
            "cluster_bucket",
            before=batch_id,
            buckets=blist,
        )
        if affected is None:
            affected = s.createDataFrame(
                [], "doc_id long, cluster_id long, cluster_bucket long"
            )
        relabeled_aff = affected.join(remap_cid, "cluster_id", "left").select(
            "doc_id",
            F.coalesce("new_root", F.col("cluster_id")).alias("cluster_id"),
        )
        out = pin(
            relabeled_aff.unionByName(first_seen).withColumn(
                "cluster_bucket", bkt("doc_id")
            )
        )
        bucketed_snapshot_write(out, clusters_path, "cluster_bucket", batch_id)

    return cc_fold


def streaming_trgm_maintenance(
    spark: SparkSession,
    source_dir: str,
    postings_path: str,
    checkpoint: str,
    schema: str = "p_name string",
) -> "DataStreamWriter":
    """Incremental trigram posting-list maintenance — the GIN analog's
    streaming face (t40 serves the batch-built artifact; this keeps a
    LIVE posting store fresh as names arrive, the pattern of
    streaming_ivf_ingest: frozen geometry, appended rows).

    Per batch: explode each NEW distinct name into its pg_trgm posting
    rows ``(tg, p_name, n_d, batch_id)`` — O(batch names × ~name_len)
    — and land them via the idempotent per-batch partition append
    (round-8: stores.append_batch — a replayed batch replaces its own
    partition); history is never rescanned or rewritten. Names already
    in STRICTLY EARLIER batches are skipped via a left-anti probe
    (posting rows are per-name-complete, so re-adding a name would
    double its shared counts at serve time). Serving probes the store
    exactly like t40 probes the artifact: IN-filter on the query's
    trigrams, shared-count aggregation, exact pg_trgm similarity.
    """
    fold = trgm_maintenance_fold(postings_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def trgm_maintenance_fold(postings_path: str):
    """:func:`streaming_trgm_maintenance`'s fold, directly callable for
    the crash-replay harness."""
    from mtg_vector_db_spark.functions.trigram import trigram_set
    from mtg_vector_db_spark.streaming.stores import (
        append_batch,
        before_batch,
        read_store,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        existing = before_batch(read_store(s, postings_path), batch_id)
        new_names = batch_df.select("p_name").distinct().filter(
            F.col("p_name").isNotNull()
        )
        if existing is not None:
            new_names = new_names.join(
                existing.select("p_name").distinct(), "p_name", "left_anti"
            )
        tris = trigram_set(F.col("p_name"))
        append_batch(
            new_names.select(
                "p_name",
                F.size(tris).alias("n_d"),
                F.explode(tris).alias("tg"),
            ),
            postings_path,
            batch_id,
        )

    return fold


def trgm_probe(spark: SparkSession, postings_path: str, q: str, k: int = 10):
    """Serve a fuzzy-name query from the MAINTAINED posting store —
    identical math to t40's artifact probe (exact pg_trgm similarity
    from shared counts), the read side of streaming_trgm_maintenance."""
    from mtg_vector_db_spark.plans.text_queries import _pg_trgm_set

    qtris = _pg_trgm_set(q)
    nq = len(qtris)
    post = spark.read.parquet(postings_path)
    shared = (
        post.filter(F.col("tg").isin(qtris))
        .groupBy("p_name", "n_d")
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    sim = F.round(
        F.col("sh").cast("double")
        / (F.lit(nq) + F.col("n_d") - F.col("sh")).cast("double"),
        6,
    )
    return (
        shared.select("p_name", sim.alias("sim"))
        .filter(F.col("sim") > 0.0)
        .orderBy(F.desc("sim"), F.asc("p_name"))
        .limit(k)
    )


def streaming_bm25_maintenance(
    spark: SparkSession,
    source_dir: str,
    postings_path: str,
    stats_path: str,
    checkpoint: str,
    schema: str = "doc_id long, text string",
) -> "DataStreamWriter":
    """Incremental BM25 posting-index maintenance — the keyword arm's
    streaming face (t41 serves the batch-built artifact; this keeps a
    LIVE posting store + corpus-stats store fresh as documents arrive,
    the streaming_trgm_maintenance pattern).

    Per batch, O(new docs) work only:

    * postings: explode each NEW doc (left-anti on doc_id — posting
      append, like SUM, is not idempotent) into ``(term, doc_id, tf,
      doclen, batch_id)`` rows and APPEND; history is never rescanned.
    * stats: append ONE ``(n_docs, total_len, batch_id)`` delta row per
      batch; serve-time avgdl = sum(total_len)/sum(n_docs) — additive
      sufficient statistics, the nbayes.py discipline, so the store
      needs no read-modify-write.

    Crash consistency across the TWO stores (round-8, superseding the
    round-6/7 ordered-guarded-append scheme): both stores are
    batch_id-partitioned with idempotent dynamic overwrite
    (stores.append_batch) and the doc_id anti-join reads only STRICTLY
    EARLIER batches (stores.before_batch), so a replay recomputes the
    batch from the pre-batch state and replaces both of its partitions
    — a crash at ANY point (between the writes, or mid job-commit of
    either) heals without a watermark, and neither double-counting nor
    the silent-undercount torn state is reachable. Serving reads both
    stores (:func:`bm25_probe`) with math identical to the t41 artifact
    probe, so stream-appended ≡ batch-built is pinned exactly."""
    fold = bm25_maintenance_fold(postings_path, stats_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def bm25_maintenance_fold(postings_path: str, stats_path: str):
    """:func:`streaming_bm25_maintenance`'s fold, directly callable for
    the crash-replay harness."""
    from mtg_vector_db_spark.functions.text import tokens
    from mtg_vector_db_spark.session import pin
    from mtg_vector_db_spark.streaming.stores import (
        append_batch,
        before_batch,
        read_store,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        existing = before_batch(read_store(s, postings_path), batch_id)
        new_docs = batch_df.filter(F.col("doc_id").isNotNull())
        if existing is not None:
            new_docs = new_docs.join(
                existing.select("doc_id").distinct(), "doc_id", "left_anti"
            )
        tok = pin(
            new_docs.select(
                "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
            )
        )
        append_batch(
            tok.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size("toks")).alias("total_len"),
            ).coalesce(1),
            stats_path,
            batch_id,
        )
        append_batch(
            tok.select(
                "doc_id",
                F.size("toks").alias("doclen"),
                F.explode("toks").alias("term"),
            )
            .groupBy("doc_id", "doclen", "term")
            .agg(F.count(F.lit(1)).alias("tf")),
            postings_path,
            batch_id,
        )

    return fold


def bm25_probe(
    spark: SparkSession,
    postings_path: str,
    stats_path: str,
    query_terms,
    k: int = 10,
) -> DataFrame:
    """Serve a keyword query from the MAINTAINED posting store — the
    read side of streaming_bm25_maintenance, sharing the t41 artifact
    probe's scoring DAG (operators/text_search.py:bm25_from_postings).
    The only extra step: fold the additive stats deltas into one
    (n_docs, avgdl) row — avgdl = Σtotal_len/Σn_docs is the same
    double division F.avg performs, so stream ≡ batch is exact."""
    from mtg_vector_db_spark.operators.text_search import bm25_from_postings

    post = spark.read.parquet(postings_path)
    stats = spark.read.parquet(stats_path).agg(
        F.sum("n_docs").alias("n_docs"),
        (
            F.sum("total_len").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("avgdl"),
    )
    return bm25_from_postings(post, stats, query_terms, k)


def streaming_ivfpq_append(
    spark: SparkSession,
    source_dir: str,
    centroids: DataFrame,
    codebooks: list,
    layout_path: str,
    checkpoint: str,
    schema: str = "vec_id long, embedding array<float>",
) -> "DataStreamWriter":
    """Incremental IVF-PQ index maintenance — the streaming face of the
    p47 stored layout, completing the set (graph: streaming_graph_append;
    IVF cells: streaming_ivf_ingest; trigram postings:
    streaming_trgm_maintenance; CC map: streaming_cc_maintenance).

    Per batch, against FROZEN geometry: assign each new vector to its
    coarse cell (map-side centroid-literal argmin, no refit) and encode
    it against the frozen PQ codebooks (Arrow-batched argmin, no
    retrain), then APPEND ``(vec_id, codes, batch_id)`` rows into the
    ``partitionBy(cell)`` layout — existing files never rewritten, the
    p47 probe path sees new vectors at the next read, per-batch work is
    O(batch). Codebook/centroid refit is a periodic batch job (the
    kmeans_ivf_build / pq_train pattern), exactly like the cell face.

    Unlike raw-vector cell append, code rows are NOT naturally
    idempotent under re-delivery (a doubled code row double-counts in
    any candidate aggregation); round-8 replaces the high-watermark
    skip with the idempotent (cell, batch_id)-partitioned append — the
    encoding is deterministic against the frozen geometry, so a replay
    replaces exactly its own leaves.
    """
    fold = ivfpq_append_fold(centroids, codebooks, layout_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def ivfpq_append_fold(centroids: DataFrame, codebooks: list, layout_path: str):
    """:func:`streaming_ivfpq_append`'s fold, directly callable for the
    crash-replay harness."""
    from mtg_vector_db_spark.operators.ann import ivf_assign
    from mtg_vector_db_spark.operators.quantize import pq_encode
    from mtg_vector_db_spark.streaming.stores import append_batch

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        coded = pq_encode(batch_df, codebooks).select("vec_id", "codes")
        cells = ivf_assign(batch_df, centroids).select("vec_id", "cell")
        append_batch(
            coded.join(cells, "vec_id"),
            layout_path,
            batch_id,
            partition_cols=("cell",),
        )

    return fold
