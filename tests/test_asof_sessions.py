"""as-of join + sessionization semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from mtg_vector_db_spark.operators.asof import asof_join
from mtg_vector_db_spark.streaming.pipelines import sessionize



def _snap(spark, path):
    """Serving read of a versioned snapshot store (round-8 layout)."""
    from mtg_vector_db_spark.streaming.stores import snapshot_read

    return snapshot_read(spark, str(path))

def ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_asof_matches_latest_preceding_and_equal(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(5)), (2, 10, ts(10)), (3, 10, ts(2)), (4, 20, ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, ts(3), 1.0), (101, 10, ts(5), 2.0), (102, 10, ts(7), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, keys=["user_id"], payload_cols=("value",),
            tie_col="event_id",
        ).collect()
    }
    assert out[1] == 2.0  # equal-ts right row matches (>= semantics)
    assert out[2] == 3.0  # latest preceding
    assert out[3] is None  # nothing precedes ts=2
    assert out[4] is None  # no right rows for user 20


def test_asof_equal_ts_ties_resolve_to_largest_tie_col(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, ts(4), 1.0), (101, 10, ts(4), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    (row,) = asof_join(
        left, right, keys=["user_id"], payload_cols=("value",), tie_col="event_id"
    ).collect()
    assert row["asof_value"] == 2.0


def test_sessionize_gap_splits(spark):
    events = spark.createDataFrame(
        [(10, ts(0), 1.0), (10, ts(10), 1.0), (10, ts(50), 1.0), (20, ts(0), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = sorted(
        sessionize(events, gap="30 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start_us"]),
    )
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(10, 2), (10, 1), (20, 1)]
    first = rows[0]
    # session end = last event + gap
    assert first["session_end_us"] - first["session_start_us"] == (10 + 30) * 60_000_000


def _session_tuples(df):
    return sorted(
        (
            r["user_id"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in df.collect()
    )


def test_sessionize_chunked_equals_single_pass_on_sf(spark, sf001):
    """The skew-hardened two-phase sessionization is result-identical to
    session_window on the real events table."""
    from mtg_vector_db_spark.plans.registry import events_df
    from mtg_vector_db_spark.streaming.pipelines import sessionize_chunked

    events = events_df(spark, sf001)
    assert _session_tuples(
        sessionize_chunked(events, gap_minutes=30)
    ) == _session_tuples(sessionize(events, gap="30 minutes"))


def test_sessionize_chunked_merges_chunk_boundary_sessions(spark):
    """A monster key with activity crossing midnight: phase-1 chunking
    splits at the day border, phase 2 must stitch the halves back into
    the exact session_window result (incl. a session that spans the
    border within the gap, and one that genuinely breaks there)."""
    import datetime as dtm

    from mtg_vector_db_spark.streaming.pipelines import sessionize_chunked

    base = dtm.datetime(2024, 3, 1, 23, 0, 0)
    rows = []
    # hot user 1: events every 10 min from 23:00 through 01:00 (crosses
    # midnight inside the gap — ONE session end to end)
    for i in range(13):
        rows.append((1, base + dtm.timedelta(minutes=10 * i), 1.0))
    # hot user 1 again: a second burst well past the gap
    rows.append((1, base + dtm.timedelta(hours=5), 2.0))
    # user 3: two events EXACTLY gap apart — session_window merges at
    # the boundary (probed round 3), so chunked must merge too.
    rows.append((3, base, 1.0))
    rows.append((3, base + dtm.timedelta(minutes=30), 1.0))
    # user 2: one event just before midnight, next one 31 min later
    # (crosses the border OUTSIDE the gap — two sessions)
    rows.append((2, dtm.datetime(2024, 3, 1, 23, 58, 0), 1.0))
    rows.append((2, dtm.datetime(2024, 3, 2, 0, 29, 0), 1.0))
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    got = _session_tuples(sessionize_chunked(events, gap_minutes=30))
    want = _session_tuples(sessionize(events, gap="30 minutes"))
    assert got == want
    # shape sanity: user 1 -> 2 sessions (13-event span + burst),
    # user 2 -> 2 sessions
    by_user = {}
    for u, *_rest, n, _v in [(t[0], t[1], t[2], t[3], t[4]) for t in got]:
        by_user.setdefault(u, []).append(n)
    assert sorted(by_user[1]) == [1, 13]
    assert by_user[2] == [1, 1]
    assert by_user[3] == [2]  # exact-gap pair merges into ONE session


def test_sessionize_streaming_matches_batch_for_closed_sessions(spark, tmp_path):
    """sessionize shares one plan across runners: the streaming run (append
    mode, watermark-driven eviction) emits exactly the batch result for
    every session the watermark has closed."""
    rows = [
        (10, ts(0), 1.0),
        (10, ts(10), 2.0),
        (10, dt.datetime(2024, 1, 1, 2, 0), 3.0),
        # sentinel far in the future: pushes the final watermark past every
        # user-10 session end so they all emit; its own session stays open.
        (99, dt.datetime(2024, 1, 1, 10, 0), 0.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    src = str(tmp_path / "events_src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = sessionize(stream, gap="30 minutes", watermark="1 second")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = sorted(
        tuple(r) for r in spark.table("sessions_stream").collect()
    )
    batch = sorted(
        tuple(r)
        for r in sessionize(df, gap="30 minutes")
        .filter("user_id = 10")
        .collect()
    )
    assert streamed == batch
    assert len(streamed) == 2  # [00:00,00:40) and [02:00,02:30)


def test_range_join_equals_naive_between(spark, sf001):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.range_join import range_join
    from mtg_vector_db_spark.plans.registry import events_df

    events = events_df(spark, sf001).limit(2000)
    win = spark.range(8).select(
        F.col("id").alias("window_id"),
        F.timestamp_micros(F.lit(1704067200_000000) + F.col("id") * F.lit(7200_000000)).alias("start_ts"),
        F.timestamp_micros(F.lit(1704067200_000000) + F.col("id") * F.lit(7200_000000) + F.lit(5400_000000)).alias("end_ts"),
    )
    fast = range_join(events, win, bucket_seconds=3600).select("event_id", "window_id")
    naive = events.join(
        win,
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")),
    ).select("event_id", "window_id")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_range_join_boundary_semantics(spark):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.range_join import range_join

    # interval [01:00, 02:30) — point at start in, at end out, spans buckets
    win = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 2, 30))],
        "window_id long, start_ts timestamp, end_ts timestamp",
    )
    pts = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 1, 0)),       # == start: included
            (2, dt.datetime(2024, 1, 1, 2, 29, 59)),  # just inside
            (3, dt.datetime(2024, 1, 1, 2, 30)),      # == end: excluded
            (4, dt.datetime(2024, 1, 1, 0, 59, 59)),  # before
        ],
        "event_id long, ts timestamp",
    )
    got = sorted(
        r["event_id"] for r in range_join(pts, win, bucket_seconds=3600).collect()
    )
    assert got == [1, 2]


def test_running_user_totals_stateful_stream_matches_batch(spark, tmp_path):
    from mtg_vector_db_spark.streaming.pipelines import running_user_totals

    rows = [
        (10, ts(0), 1.5), (10, ts(10), 2.5), (20, ts(5), 4.0), (10, ts(20), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    src = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user == the batch aggregate
    latest = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("running_totals").collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals(df).collect()
    }
    assert latest == batch == {10: (3, 5.0), 20: (1, 4.0)}


def test_streaming_neardup_ingest(spark, tmp_path):
    """Incremental MinHash dedup: batch 2 finds its near-dup against the
    batch-1 index (cross-batch), and in-batch dups are caught too."""
    import json

    from mtg_vector_db_spark.streaming.pipelines import streaming_neardup_ingest

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    other = "completely different text about shipping priority and revenue numbers"

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t})
                  for i, t in [(1, base), (2, other)])
    )

    def run():
        q = streaming_neardup_ingest(
            spark, str(src), str(tmp_path / "index"), str(tmp_path / "pairs"),
            str(tmp_path / "ckpt"),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(str(tmp_path / "index")).count() == 2 * 4  # 4 bands/doc

    # batch 2: near-dup of doc 1 (cross-batch) + two in-batch dups
    (src / "b2.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t})
                  for i, t in [(3, near), (4, base + " extra"), (5, base + " extra")])
    )
    run()
    pairs = {
        (r["id_new"], r["id_old"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert (3, 1) in pairs          # cross-batch near-dup
    assert (5, 4) in pairs          # in-batch dup
    assert all(a != b for a, b in pairs)


def test_asof_join_matches_pandas_merge_asof_random(spark):
    """Randomized equivalence vs pandas merge_asof (backward,
    allow_exact_matches) — an independent model of as-of semantics.
    (user, ts) pairs are de-duplicated on the right side so both engines'
    tie rules coincide."""
    import random

    import pandas as pd

    rng = random.Random(42)
    left_rows, right_rows, seen = [], [], set()
    for i in range(400):
        left_rows.append((i, rng.randint(1, 8), ts(rng.randint(0, 59), rng.randint(0, 59))))
    for i in range(200):
        u, t = rng.randint(1, 8), ts(rng.randint(0, 59), rng.randint(0, 59))
        if (u, t) in seen:
            continue
        seen.add((u, t))
        right_rows.append((1000 + i, u, t, round(rng.uniform(0, 100), 2)))

    left = spark.createDataFrame(left_rows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, keys=["user_id"], payload_cols=("value",), tie_col="event_id"
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        right_rows, columns=["r_event_id", "user_id", "ts", "value"]
    ).sort_values("ts")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward", allow_exact_matches=True
    )
    for _, row in merged.iterrows():
        expect = None if pd.isna(row["value"]) else row["value"]
        assert got[row["event_id"]] == expect, row["event_id"]


def test_attribute_purchases_stream_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join emits exactly the batch
    join's pairs once the availableNow run drains both sides."""
    from mtg_vector_db_spark.streaming.pipelines import attribute_purchases

    sf = "/root/testdata/sf0.001"
    from mtg_vector_db_spark.plans.registry import events_df

    events = events_df(spark, sf)
    clicks = events.filter("event_type = 'click'").select("event_id", "user_id", "ts", "value")
    purchases = events.filter("event_type = 'purchase'").select("event_id", "user_id", "ts", "value")
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.coalesce(1).write.parquet(cdir)
    purchases.coalesce(1).write.parquet(pdir)

    schema = "event_id long, user_id long, ts timestamp, value double"
    cs = spark.readStream.schema(schema).parquet(cdir)
    ps = spark.readStream.schema(schema).parquet(pdir)
    out = attribute_purchases(cs, ps, within="1 hour", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("attrib_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = sorted(tuple(r) for r in spark.table("attrib_stream").collect())
    batch = sorted(
        tuple(r)
        for r in attribute_purchases(clicks, purchases, within="1 hour").collect()
    )
    assert streamed == batch
    assert len(batch) > 0


def test_exactly_once_event_ingest_drops_replays(spark, tmp_path):
    """Overlapping file batches (an at-least-once replay) land exactly
    once in the sink; dedup state stays inside the watermark horizon."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.streaming.pipelines import exactly_once_event_ingest

    src = tmp_path / "incoming"
    src.mkdir()

    def batch(lo: int, hi: int, name: str) -> None:
        (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    F.lit(1704067200_000000) + F.col("id") * F.lit(60_000_000)
                ).alias("ts"),
                (F.col("id") % 7).alias("user_id"),
                F.lit("click").alias("event_type"),
                (F.col("id") * 0.5).alias("value"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / name))
        )

    batch(0, 100, "b1")
    batch(50, 150, "b2")  # replays 50-99

    q = (
        exactly_once_event_ingest(
            spark,
            str(src) + "/*",
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 150
    assert out.select("event_id").distinct().count() == 150


def test_enrich_events_stream_joins_static_dim(spark, tmp_path):
    """Stream-static join: every event lands enriched with its user's
    segment; users missing from the dimension keep NULL (left join)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.streaming.pipelines import enrich_events_stream

    src = tmp_path / "incoming"
    src.mkdir()
    (
        spark.range(0, 60)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1704067200_000000) + F.col("id") * F.lit(1_000_000)
            ).alias("ts"),
            (F.col("id") % 6).alias("user_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
        .coalesce(1)
        .write.parquet(str(src / "b1"))
    )
    dim = spark.createDataFrame(
        [(0, "gold"), (1, "silver"), (2, "bronze")], ["user_id", "segment"]
    )
    q = (
        enrich_events_stream(
            spark, str(src) + "/*", dim, str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 60
    assert out.filter(F.col("segment").isNotNull()).count() == 30
    assert out.filter(F.col("user_id") == 0).select("segment").first()[0] == "gold"


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Stateful streaming funnel ≡ the batch join-chain when batches
    arrive in time order, including a conversion SPLIT across batches
    (view+click in batch 1, purchase in batch 2 — pure state carry)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.streaming.pipelines import streaming_funnel

    T0 = 1704067200_000000
    MIN = 60_000_000

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, u, et)
                for i, (u, et) in enumerate(rows)
            ],
            ["seq", "user_id", "event_type"],
        ).select(
            F.col("seq").alias("event_id"),
            F.timestamp_micros(F.lit(T0) + F.col("seq") * F.lit(MIN)).alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
        )

    # user 1 converts inside batch 1; user 2's purchase comes in batch 2;
    # user 3 never clicks; user 4 purchases before clicking (no match).
    b1 = [(1, "view"), (1, "click"), (1, "purchase"),
          (2, "view"), (2, "click"), (3, "view"), (4, "view"), (4, "purchase")]
    b2 = [(2, "purchase"), (3, "error"), (4, "click")]

    src = tmp_path / "ev"
    src.mkdir()
    mk(b1).coalesce(1).write.parquet(str(src / "b1"))

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")

    def run():
        q = (
            streaming_funnel(stream)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # batch-2 events continue user 2's funnel from carried state
    offset = len(b1)
    mk([(u, et) for u, et in b2]).select(
        (F.col("event_id") + offset).alias("event_id"),
        F.timestamp_micros(
            F.lit(T0) + (F.col("event_id") + offset) * F.lit(MIN)
        ).alias("ts"),
        "user_id", "event_type", "value",
    ).coalesce(1).write.parquet(str(src / "b2"))
    run()

    got = {
        r["user_id"]: (r["t_view_us"], r["t_click_us"], r["t_purchase_us"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    all_events = mk(b1).unionByName(
        mk([(u, et) for u, et in b2]).select(
            (F.col("event_id") + offset).alias("event_id"),
            F.timestamp_micros(
                F.lit(T0) + (F.col("event_id") + offset) * F.lit(MIN)
            ).alias("ts"),
            "user_id", "event_type", "value",
        )
    )
    expect = {
        r["user_id"]: (
            r["t_view"].timestamp() * 1e6,
            r["t_click"].timestamp() * 1e6,
            r["t_purchase"].timestamp() * 1e6,
        )
        for r in streaming_funnel(all_events).collect()
    }
    assert set(got) == set(expect) == {1, 2}
    for u in got:
        assert got[u] == tuple(int(x) for x in expect[u])


def test_streaming_bloom_maintenance_accumulates(spark, tmp_path):
    """The persisted filter after two micro-batches equals a one-shot
    build over both batches' documents, and every ingested document
    probes fully positive (no false negatives across batches)."""
    import json

    from mtg_vector_db_spark.operators.bloom import build_bloom, probe_bloom
    from mtg_vector_db_spark.streaming.pipelines import streaming_bloom_maintenance

    t1 = "held out benchmark question about shipping priority revenue"
    t2 = "another eval prompt concerning vector similarity search quality"

    src = tmp_path / "bench"
    src.mkdir()
    (src / "b1.json").write_text(json.dumps({"doc_id": 1, "text": t1}))

    def run():
        q = (
            streaming_bloom_maintenance(
                spark, str(src), str(tmp_path / "filter"), str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    (src / "b2.json").write_text(json.dumps({"doc_id": 2, "text": t2}))
    run()

    stored = _snap(spark, tmp_path / "filter")
    both = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    oneshot = {
        (r["word_idx"], r["word"]) for r in build_bloom(both).collect()
    }
    assert {(r["word_idx"], r["word"]) for r in stored.collect()} == oneshot

    probed = probe_bloom(both, stored).collect()
    assert len(probed) == 2
    assert all(r["n_hits"] == r["n_shingles"] for r in probed)


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    """The repetition gate streams via foreachBatch with zero cross-batch
    state (per-document grain): streamed survivors == batch survivors,
    regardless of how the source splits into micro-batches."""
    from mtg_vector_db_spark.operators.repetition import (
        doc_repetition_profile,
    )
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_quality_gate,
    )

    rows = [(1, "buy now " * 40), (2, "a healthy varied document "
            "with many different words and no loops at all"),
            (3, "spam spam spam spam spam spam spam spam spam spam"),
            (4, "solo")]  # < 2 tokens: no n-grams, gate passes it
    rows += [(10 + i, f"doc number {i} mixes fresh tokens like "
             f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_src")
    # Two files → at least the source COULD split; availableNow drains all.
    df.repartition(2).write.parquet(src)

    out = str(tmp_path / "kept")
    q = (
        streaming_quality_gate(
            spark, src, out, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        r["doc_id"]
        for r in df.join(
            doc_repetition_profile(df).filter("keep"), "doc_id", "left_semi"
        ).collect()
    )
    assert streamed == batch
    assert 1 not in streamed and 3 not in streamed  # looped docs dropped
    assert 2 in streamed
    # Totality (round-3 ADVICE): a doc too short to have any n-gram is
    # NOT silently dropped by a repetition screen — it passes the gate.
    assert 4 in streamed


def test_streaming_manifest_equals_batch_manifest(spark, tmp_path):
    """The per-source provenance manifest maintained incrementally over
    a stream equals the one-shot batch manifest over the same docs —
    every manifest column is additive, so no history rescan is needed."""
    from mtg_vector_db_spark.plans import registry
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_manifest_maintenance,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    manifest = str(tmp_path / "manifest")

    def run(ckpt):
        q = (
            streaming_manifest_maintenance(
                spark, src, manifest, str(tmp_path / ckpt)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt")

    def streamed():
        return sorted(
            tuple(r) for r in _snap(spark, manifest).collect()
        )

    batch = sorted(
        tuple(r)
        for r in registry.QUERIES["c19_provenance_manifest"](
            spark, sf
        ).collect()
    )
    assert streamed() == batch and len(batch) == 20

    # Double delivery (fresh checkpoint, same files): the additive
    # columns would double without the last_batch watermark.
    run("ckpt-replayed")
    assert streamed() == batch


def test_streaming_paragraph_dedup_matches_batch(spark, tmp_path):
    """The incremental paragraph-dedup face (persisted fingerprint store,
    O(new) appends) must equal the batch operator over the union when
    batches arrive in doc_id order — including a boilerplate paragraph
    first seen in batch 1 being stripped from batch 2 arrivals."""
    from mtg_vector_db_spark.operators.dedup import paragraph_dedup
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_paragraph_dedup,
    )

    boiler = "subscribe to our newsletter for updates every day"  # 8 toks
    b1 = [(1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
          (2, "iota kappa lambda mu nu xi omicron pi " + boiler)]
    b2 = [(3, boiler),  # all repeats: survives as an empty doc row
          (4, "rho sigma tau upsilon phi chi psi omega"),
          (5, "rho sigma tau upsilon phi chi psi omega extra tail here")]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "kept")
    store = str(tmp_path / "fps")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            streaming_paragraph_dedup(
                spark, str(src), out, store, ckpt, schema=schema
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    drain()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    drain()

    streamed = {
        r["doc_id"]: r for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            spark.createDataFrame(b1 + b2, schema)
        ).collect()
    }
    assert set(streamed) == set(batch)
    for d in batch:
        assert streamed[d]["n_paras"] == batch[d]["n_paras"], d
        assert streamed[d]["n_kept"] == batch[d]["n_kept"], d
        assert streamed[d]["text_kept"] == batch[d]["text_kept"], d
    # The cross-batch drop actually happened: doc 3 is all boilerplate.
    assert streamed[3]["n_kept"] == 0 and streamed[3]["text_kept"] == ""
    # The store holds exactly the distinct fingerprints, no rebuilds.
    n_fps = spark.read.parquet(store).count()
    distinct_fps = spark.read.parquet(store).select("fp").distinct().count()
    assert n_fps == distinct_fps


def test_streaming_hll_maintenance_equals_oneshot(spark, tmp_path):
    """Registers after two micro-batches equal a one-shot sketch over
    both batches' documents (MAX-merge ≡ rebuild), and re-folding a
    batch is a no-op (idempotent replay — the exactly-once argument)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_hll_maintenance,
    )

    rows1 = [(i, f"doc text number {i}", "web") for i in range(40)]
    rows2 = [(i, f"doc text number {i}", "web") for i in range(30, 70)] + [
        (100 + i, f"book passage {i}", "books") for i in range(20)
    ]
    schema = "doc_id long, text string, source string"

    src = tmp_path / "arrivals"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def run():
        q = (
            streaming_hll_maintenance(
                spark,
                str(src / "*"),
                str(tmp_path / "registers"),
                str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    run()

    stored = _snap(spark, tmp_path / "registers")
    both = spark.createDataFrame(rows1 + rows2, schema)
    oneshot = {
        (r["source"], r["bucket"]): r["m_j"]
        for r in hll_registers(both, F.col("text"), ["source"]).collect()
    }
    got = {
        (r["source"], r["bucket"]): r["m_j"] for r in stored.collect()
    }
    assert got == oneshot

    # Replay batch 1's content: MAX-merge must leave the store unchanged.
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b3")
    )
    run()
    again = {
        (r["source"], r["bucket"]): r["m_j"]
        for r in _snap(spark, tmp_path / "registers").collect()
    }
    assert again == oneshot

    # The estimate over the (re-read — the store was just overwritten)
    # registers answers per-source cardinality within sketch error
    # (70 web + 20 books distinct texts here).
    est = {
        r["source"]: r["n_hll"]
        for r in hll_estimate(
            _snap(spark, tmp_path / "registers"), ["source"]
        ).collect()
    }
    assert abs(est["web"] - 70) / 70 < 0.15
    assert abs(est["books"] - 20) / 20 < 0.15


def test_streaming_cms_maintenance_sum_merge_with_replay_guard(
    spark, tmp_path
):
    """Cells after two micro-batches equal a one-shot sketch over both
    batches' tokens, and a simulated double-delivery (fresh checkpoint
    re-reading the same files as batch 0) is skipped by the last_batch
    watermark — SUM-merge needs the guard where MAX/bit_or don't."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.text import tokens
    from mtg_vector_db_spark.operators.sketches import cms_build
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_cms_maintenance,
    )

    rows1 = [(i, "alpha beta gamma common", "web") for i in range(10)]
    rows2 = [(50 + i, "delta common epsilon", "web") for i in range(5)]
    schema = "doc_id long, text string, source string"

    src = tmp_path / "arrivals"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def run(ckpt):
        q = (
            streaming_cms_maintenance(
                spark,
                str(src / "*"),
                str(tmp_path / "sketch"),
                str(tmp_path / ckpt),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    run("ckpt")

    both = spark.createDataFrame(rows1 + rows2, schema)
    tc = (
        both.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    oneshot = {
        (r["row"], r["cell"]): r["total"] for r in cms_build(tc).collect()
    }

    def stored():
        return {
            (r["row"], r["cell"]): r["total"]
            for r in _snap(spark, tmp_path / "sketch").collect()
        }

    assert stored() == oneshot

    # Double delivery: a FRESH checkpoint re-reads every file as batch 0.
    # Without the watermark this would double every cell; with it the
    # replay is skipped and the store is unchanged.
    run("ckpt-replayed")
    assert stored() == oneshot


def test_streaming_reservoir_equals_oneshot_with_replay(spark, tmp_path):
    """Reservoir after two micro-batches equals the one-shot A-ES top-K
    over both batches (merge ≡ rebuild); replaying a batch is a no-op
    (distinct ∘ top-K idempotence — the exactly-once argument)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.corpus import aes_key
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_reservoir_maintenance,
    )

    rows1 = [(i, f"text {i}", "web", 10 + 7 * i) for i in range(40)]
    rows2 = [(100 + i, f"text {i}", "books", 500 - 3 * i) for i in range(40)]
    schema = "doc_id long, text string, source string, n_chars long"

    src = tmp_path / "arrivals"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def run():
        q = (
            streaming_reservoir_maintenance(
                spark,
                str(src / "*"),
                str(tmp_path / "reservoir"),
                str(tmp_path / "ckpt"),
                k=15,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    run()

    both = spark.createDataFrame(rows1 + rows2, schema)
    oneshot = [
        (r["doc_id"], r["weight_chars"], r["es_key"])
        for r in both.select(
            "doc_id",
            F.col("n_chars").alias("weight_chars"),
            aes_key(F.col("doc_id"), F.col("n_chars")).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(15)
        .collect()
    ]
    stored = sorted(
        (
            (r["doc_id"], r["weight_chars"], r["es_key"])
            for r in _snap(spark, tmp_path / "reservoir").collect()
        ),
        key=lambda t: (-t[2], t[0]),
    )
    assert stored == oneshot
    assert len(stored) == 15

    # Replay batch 1: the merged top-K must not change.
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b3")
    )
    run()
    again = sorted(
        (
            (r["doc_id"], r["weight_chars"], r["es_key"])
            for r in _snap(spark, tmp_path / "reservoir").collect()
        ),
        key=lambda t: (-t[2], t[0]),
    )
    assert again == oneshot


def test_streaming_winnow_decontamination_flags_eval_overlap(
    spark, tmp_path
):
    """A streamed doc sharing a >= w+k-1-token run with the frozen eval
    set is flagged; clean docs are not; stream report rows equal the
    one-shot batch probe over the same arrivals."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.dedup import winnow_fingerprints
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_winnow_decontamination,
    )

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    eval_docs = spark.createDataFrame(
        [(900, f"intro {leak} outro closing words here"),
         (901, "completely different evaluation content here today")],
        ["doc_id", "text"],
    )
    winnow_fingerprints(eval_docs).select("fp").distinct().write.parquet(
        str(tmp_path / "evalfp")
    )

    rows1 = [
        (1, f"training doc with {leak} copied inside", "web"),
        (2, "benign training doc one two three four five six", "web"),
    ]
    rows2 = [(3, f"another leak {leak} again", "books"),
             (4, "more benign content seven eight nine ten eleven", "books")]
    schema = "doc_id long, text string, source string"
    src = tmp_path / "arrivals"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    def run():
        q = (
            streaming_winnow_decontamination(
                spark,
                str(src / "*"),
                str(tmp_path / "evalfp"),
                str(tmp_path / "report"),
                str(tmp_path / "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    run()

    rep = spark.read.parquet(str(tmp_path / "report"))
    flagged = {r["doc_id"] for r in rep.collect()}
    assert flagged == {1, 3}  # exactly the planted leaks
    for r in rep.collect():
        assert r["n_shared"] >= 1 and r["n_fp"] >= r["n_shared"]

    # One-shot equivalence: batch probe over all arrivals = stream rows.
    both = spark.createDataFrame(rows1 + rows2, schema)
    store = spark.read.parquet(str(tmp_path / "evalfp")).withColumn(
        "hit", F.lit(1)
    )
    oneshot = {
        (r["doc_id"], r["n_fp"], r["n_shared"])
        for r in winnow_fingerprints(both)
        .join(store, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_shared"),
        )
        .filter("n_shared > 0")
        .collect()
    }
    got = {
        (r["doc_id"], r["n_fp"], r["n_shared"]) for r in rep.collect()
    }
    assert got == oneshot


def test_streaming_graph_append_matches_batch(spark, tmp_path, sf001):
    """Stream ≡ batch for frozen-graph append: the same 20 new vectors
    delivered as two micro-batches produce exactly the neighbor lists
    one batch call computes (per-vector lists depend only on the frozen
    state, so slicing cannot change them)."""
    import json

    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.ann import (
        nn_descent_append,
        nn_descent_init,
        nn_descent_round,
    )
    from mtg_vector_db_spark.streaming.pipelines import streaming_graph_append

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") < 480)
    new = emb.filter(F.col("vec_id") >= 480).collect()
    assert len(new) == 20

    g = nn_descent_round(nn_descent_init(corpus), corpus)
    corpus_path = str(tmp_path / "corpus")
    graph_path = str(tmp_path / "graph")
    corpus.write.parquet(corpus_path)
    g.write.parquet(graph_path)

    src = tmp_path / "incoming"
    src.mkdir()

    def rows(batch):
        return "\n".join(
            json.dumps(
                {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
            )
            for r in batch
        )

    (src / "b1.json").write_text(rows(new[:9]))

    def run():
        q = streaming_graph_append(
            spark, str(src), graph_path, corpus_path,
            str(tmp_path / "lists"), str(tmp_path / "ckpt"),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()
    (src / "b2.json").write_text(rows(new[9:]))
    run()

    streamed = {
        (r["a"], r["b"], r["sim"])
        for r in spark.read.parquet(str(tmp_path / "lists")).collect()
    }
    frozen_g = spark.read.parquet(graph_path)
    frozen_c = spark.read.parquet(corpus_path)
    batch = {
        (r["a"], r["b"], r["sim"])
        for r in nn_descent_append(
            frozen_g, frozen_c, emb.filter(F.col("vec_id") >= 480)
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_lsh_maintenance_matches_batch_table(spark, tmp_path, sf001):
    """The maintained LSH bucket store after two waves holds EXACTLY the
    one-shot bucket table over all vectors seen (frozen planes — every
    row depends only on itself, so slicing cannot change it),
    re-delivered vectors are not double-bucketed, and a fresh-checkpoint
    replay leaves the store unchanged."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.vector import dot, l2_normalize
    from mtg_vector_db_spark.operators.ann import (
        RP_BUCKET_LENGTH,
        RP_TABLES,
        rp_planes,
    )
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_lsh_maintenance,
    )

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    vecs = emb.filter(F.col("vec_id") < 40)
    src = tmp_path / "vecs"
    src.mkdir()
    store = str(tmp_path / "buckets")

    def run(ckpt):
        q = streaming_lsh_maintenance(
            spark, str(src), store, str(tmp_path / ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    w1 = vecs.filter(F.col("vec_id") < 25)
    w2 = vecs.filter(F.col("vec_id") >= 20)  # 20-24 re-delivered
    w1.coalesce(1).write.mode("append").parquet(str(src))
    run("ckpt")
    w2.coalesce(1).write.mode("append").parquet(str(src))
    run("ckpt")

    got = {
        (r["w"], r["b"], r["vec_id"])
        for r in spark.read.parquet(store).collect()
    }
    planes = rp_planes(64, RP_TABLES)
    planes_lit = F.array(*[F.array(*[F.lit(v) for v in p]) for p in planes])
    nx = l2_normalize(F.col("embedding"))
    buckets = F.transform(
        F.sequence(F.lit(1), F.lit(RP_TABLES)),
        lambda w: F.struct(
            w.cast("int").alias("w"),
            F.floor(
                F.round(
                    dot(F.element_at(planes_lit, w.cast("int")), nx)
                    / F.lit(RP_BUCKET_LENGTH),
                    9,
                )
            ).cast("long").alias("b"),
        ),
    )
    want = {
        (r["wb"]["w"], r["wb"]["b"], r["vec_id"])
        for r in vecs.select(
            "vec_id", F.explode(buckets).alias("wb")
        ).collect()
    }
    assert got == want and len(want) == 40 * RP_TABLES

    before = len(got)
    run("ckpt_replay")  # fresh checkpoint: batch 0 re-delivers everything
    assert spark.read.parquet(store).count() == before


def test_refresh_appended_graph_store_stream_equals_batch(
    spark, tmp_path, sf001
):
    """The periodic refresh job over a STREAM-built appended store must
    produce exactly the lists of refreshing a one-shot batch append
    (stream-appended ≡ refresh-then-serve), the artifact must be reused
    byte-for-byte when inputs are unchanged, and a further append batch
    must BUMP the content-addressed key (new backlog → new refresh)."""
    import json
    import os as _os

    from pyspark.sql import functions as F

    from mtg_vector_db_spark.operators.ann import (
        nn_descent_append,
        nn_descent_init,
        nn_descent_refresh_appended,
        nn_descent_round,
    )
    from mtg_vector_db_spark.streaming.pipelines import (
        refresh_appended_graph_store,
        streaming_graph_append,
    )

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") < 480)
    new_df = emb.filter(
        (F.col("vec_id") >= 480) & (F.col("vec_id") < 494)
    )
    new = new_df.collect()

    g = nn_descent_round(nn_descent_init(corpus), corpus)
    corpus_path = str(tmp_path / "corpus")
    graph_path = str(tmp_path / "graph")
    new_path = str(tmp_path / "newvecs")
    corpus.write.parquet(corpus_path)
    g.write.parquet(graph_path)
    new_df.write.parquet(new_path)

    src = tmp_path / "incoming"
    src.mkdir()

    def rows(batch):
        return "\n".join(
            json.dumps(
                {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
            )
            for r in batch
        )

    lists_path = str(tmp_path / "lists")

    def run():
        q = streaming_graph_append(
            spark, str(src), graph_path, corpus_path,
            lists_path, str(tmp_path / "ckpt"),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    (src / "b1.json").write_text(rows(new[:7]))
    run()
    (src / "b2.json").write_text(rows(new[7:]))
    run()

    p1 = refresh_appended_graph_store(
        spark, graph_path, corpus_path, lists_path, new_path
    )
    got = {
        (r["a"], r["b"], r["sim"])
        for r in spark.read.parquet(p1).collect()
    }

    frozen_g = spark.read.parquet(graph_path)
    frozen_c = spark.read.parquet(corpus_path)
    app = nn_descent_append(frozen_g, frozen_c, new_df)
    want = {
        (r["a"], r["b"], r["sim"])
        for r in nn_descent_refresh_appended(
            frozen_g.unionByName(app), frozen_c, new_df
        )
        .join(
            new_df.select(F.col("vec_id").alias("a")), "a", "left_semi"
        )
        .collect()
    }
    assert got == want and len(want) > 0

    # Unchanged inputs: same key, artifact untouched (reused).
    mtime = _os.path.getmtime(p1)
    assert refresh_appended_graph_store(
        spark, graph_path, corpus_path, lists_path, new_path
    ) == p1
    assert _os.path.getmtime(p1) == mtime

    # A further append batch changes the store fingerprint → key bump.
    extra = emb.filter(
        (F.col("vec_id") >= 494) & (F.col("vec_id") < 500)
    )
    (src / "b3.json").write_text(rows(extra.collect()))
    run()
    extra_new_path = str(tmp_path / "newvecs2")
    emb.filter(
        (F.col("vec_id") >= 480) & (F.col("vec_id") < 500)
    ).write.parquet(extra_new_path)
    p2 = refresh_appended_graph_store(
        spark, graph_path, corpus_path, lists_path, extra_new_path
    )
    assert p2 != p1


def test_streaming_moment_maintenance_matches_batch_and_skips_replay(
    spark, tmp_path, sf001
):
    """Stream ≡ batch for the spectral sufficient stats: two
    micro-batches fold to EXACTLY the one-shot integer sums (decimal
    adds are associative), derived mean/trace match numpy to the
    nano-quantization error, and a replayed batch_id is a no-op (the
    cms-style high-watermark)."""
    import json
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_moment_maintenance,
    )

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet").collect()
    src = tmp_path / "incoming"
    src.mkdir()

    def write(name, batch):
        import pandas as pd

        pd.DataFrame(
            [(r["vec_id"], list(r["embedding"])) for r in batch],
            columns=["vec_id", "embedding"],
        ).to_parquet(src / name, index=False)

    write("b1.parquet", emb[:200])

    stats_path = str(tmp_path / "stats")

    def run():
        q = streaming_moment_maintenance(
            spark, str(src), stats_path, str(tmp_path / "ckpt"),
            schema="vec_id long, embedding array<double>",
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()
    write("b2.parquet", emb[200:])
    run()

    got = {r["dim"]: r for r in _snap(spark, stats_path).collect()}
    assert len(got) == 64

    x = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    # int() per element: astype(object) would keep float64 objects and
    # their squares (~9e16) exceed float64's exact-integer range.
    xi = [[int(v) for v in row] for row in np.floor(x * 1e9 + 0.5)]
    for d in (0, 17, 63):
        assert int(got[d]["s"]) == sum(row[d] for row in xi)
        assert int(got[d]["sq"]) == sum(row[d] * row[d] for row in xi)
        assert got[d]["n"] == len(emb)
        mean = float(int(got[d]["s"])) * 1e-9 / len(emb)
        assert math.isclose(mean, float(x[:, d].mean()), abs_tol=1e-8)

    # Replay of an already-folded batch id must not double-count: the
    # checkpoint prevents re-delivery here, so exercise the guard
    # directly through a fresh stream with a stale checkpoint clone.
    before = {r["dim"]: int(r["s"]) for r in
              _snap(spark, stats_path).collect()}
    run()  # no new files -> no batch; state unchanged
    after = {r["dim"]: int(r["s"]) for r in
             _snap(spark, stats_path).collect()}
    assert before == after


def test_running_user_totals_recovers_from_checkpoint_restart(spark, tmp_path):
    """Checkpoint RECOVERY, not just stream≡batch (round-3 VERDICT #7):
    stop the stateful query after its first wave of data, then restart a
    NEW query from the SAME checkpoint dir with more data waiting. The
    restarted query must (a) restore per-user state from the state store
    — user 10's totals continue from wave 1, (b) not reprocess wave-1
    files (n_events would double), and (c) end at exactly the batch
    aggregate over all events. At 100 TB the restart path IS the
    product: every long-running maintainer rides this mechanism."""
    from mtg_vector_db_spark.streaming.pipelines import running_user_totals

    src = tmp_path / "ev"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"

    wave1 = spark.createDataFrame(
        [(10, ts(0), 1.5), (10, ts(10), 2.5), (20, ts(5), 4.0)], schema
    )
    wave1.coalesce(1).write.mode("append").parquet(str(src))

    # memory sink refuses checkpoint recovery by design; foreachBatch →
    # parquet is the recoverable sink every production maintainer here uses.
    sink = str(tmp_path / "sink")

    def run_once():
        import pyspark.sql.functions as F

        def emit(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink)

        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(emit)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).collect()
        latest = {}
        for r in sorted(rows, key=lambda r: r["batch_id"]):
            latest[r["user_id"]] = (r["n_events"], r["total_value"])
        return latest, max(r["batch_id"] for r in rows), rows

    first, last_batch_1, _ = run_once()
    assert first == {10: (2, 4.0), 20: (1, 4.0)}

    # Query is fully stopped; wave 2 lands while nothing is running.
    wave2 = spark.createDataFrame([(10, ts(20), 1.0), (30, ts(30), 7.0)], schema)
    wave2.coalesce(1).write.mode("append").parquet(str(src))

    second, last_batch_2, rows = run_once()
    # Batch ids continue past run 1's — state-store epochs resumed, not
    # restarted from scratch.
    assert last_batch_2 > last_batch_1
    run2 = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in rows
        if r["batch_id"] > last_batch_1
    }
    # User 10 CONTINUES from recovered state (3 events, not 1 and not 5);
    # user 20 had no wave-2 events, so update mode emits nothing for it.
    assert run2[10] == (3, 5.0)
    assert run2[30] == (1, 7.0)
    assert 20 not in run2
    # Latest-per-user across both runs is the recovered end state.
    assert second == {10: (3, 5.0), 20: (1, 4.0), 30: (1, 7.0)}

    # End state == the batch aggregate over everything ever written.
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals(
            spark.read.schema(schema).parquet(str(src))
        ).collect()
    }
    assert batch == second


def test_streaming_vocab_maintenance_feeds_bpe_trainer(spark, tmp_path, sf001):
    """The BPE trainer's input kept fresh incrementally: two micro-batch
    waves fold to EXACTLY the batch word-type table (SUM deltas are
    associative), a re-delivered batch id is skipped (fresh checkpoint
    over the same files -> batch 0 replay -> store unchanged), and the
    trainer over the MAINTAINED store learns the IDENTICAL merge table
    to batch training over the full corpus."""
    from mtg_vector_db_spark.operators.bpe import bpe_train, word_types
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_vocab_maintenance,
        vocab_counts,
    )

    docs = spark.read.parquet(f"{sf001}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = docs.collect()
    src = tmp_path / "incoming"
    src.mkdir()
    vocab_path = str(tmp_path / "vocab")

    def write(name, batch):
        import pandas as pd

        pd.DataFrame(
            [(r["doc_id"], r["text"]) for r in batch],
            columns=["doc_id", "text"],
        ).to_parquet(src / name, index=False)

    def run(ckpt):
        q = (
            streaming_vocab_maintenance(
                spark, str(src), vocab_path, str(tmp_path / ckpt)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write("b1.parquet", rows[: len(rows) // 2])
    run("ckpt")
    write("b2.parquet", rows[len(rows) // 2 :])
    run("ckpt")

    got = {r["tok"]: r["freq"] for r in vocab_counts(spark, vocab_path).collect()}
    want = {r["tok"]: r["freq"] for r in word_types(docs).collect()}
    assert got == want

    # Replay: a fresh checkpoint re-delivers everything as batch 0; the
    # high-watermark must skip it (SUM-merge is not idempotent).
    run("ckpt_replay")
    again = {r["tok"]: r["freq"] for r in vocab_counts(spark, vocab_path).collect()}
    assert again == want

    # Training over the maintained store == training over the corpus.
    m_store = bpe_train(vocab_counts(spark, vocab_path))[0].collect()
    m_batch = bpe_train(word_types(docs))[0].collect()
    key = lambda r: (r["round"], r["x"], r["y"], r["cnt"])  # noqa: E731
    assert sorted(map(key, m_store)) == sorted(map(key, m_batch))


def test_state_df_missing_path_vs_genuine_read_error(spark, tmp_path):
    """The maintenance-store read treats ONLY a missing path as 'no state
    yet' (round-3 ADVICE): a corrupt store must RAISE so the micro-batch
    fails and the checkpoint retries, instead of being mistaken for empty
    state and overwritten with one batch's worth."""
    from mtg_vector_db_spark.streaming.pipelines import _state_df

    assert _state_df(spark, str(tmp_path / "never_written")) is None

    corrupt = tmp_path / "corrupt_store"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_text("this is not parquet")
    # A corrupt footer surfaces as a JVM read error (Py4JJavaError), NOT
    # the AnalysisException missing-path case the guard catches — the
    # point is it must PROPAGATE, never read as "no state yet" (None).
    raised = False
    try:
        df = _state_df(spark, str(corrupt))
        # Schema inference may defer the failure to the read itself.
        if df is not None:
            df.collect()
    except Exception:
        raised = True
    assert raised, "corrupt store was read as empty state instead of raising"


def test_missing_path_keys_on_structured_error_class(spark, tmp_path):
    """Round-4 ADVICE: the missing-store classifier keys on Spark's
    STRUCTURED error condition (PATH_NOT_FOUND via getCondition /
    getErrorClass), so a release that rewords the message cannot turn
    every first-batch bootstrap into a raise — and an unrelated error
    whose MESSAGE merely contains the magic string is not mistaken for
    a missing store."""
    from pyspark.errors import AnalysisException

    from mtg_vector_db_spark.streaming.pipelines import _missing_path

    try:
        spark.read.parquet(str(tmp_path / "never_written"))
        raise AssertionError("read of a missing path did not raise")
    except AnalysisException as e:
        cond = None
        for attr in ("getCondition", "getErrorClass"):
            fn = getattr(e, attr, None)
            if fn is not None and cond is None:
                cond = fn()
        # The structured field exists on this Spark and is what the
        # classifier reads (message text is irrelevant below).
        assert cond == "PATH_NOT_FOUND"
        assert _missing_path(e)

    class RewordedOtherError(Exception):
        """Structured class says NOT missing; message lies."""

        def getCondition(self):
            return "SOMETHING_ELSE"

    assert not _missing_path(RewordedOtherError("... Path does not exist ..."))

    # No structured field at all -> the message fallback still works
    # (older Spark releases).
    assert _missing_path(Exception("PATH_NOT_FOUND: gone"))
    assert not _missing_path(Exception("some other failure"))


def test_streaming_funnel_recovers_from_checkpoint_restart(spark, tmp_path):
    """Checkpoint RECOVERY for the funnel's per-user stage-timestamp
    state (round-4 VERDICT #4 — the intricate applyInPandasWithState
    face): three fully-stopped runs against one checkpoint dir, with a
    conversion whose THREE stages straddle BOTH restarts (view in run 1,
    click in run 2, purchase in run 3 — pure state carry across two
    recoveries). Also pinned: a conversion completed before the restart
    is NOT re-emitted afterwards (append-mode exactly-once across
    recovery), batch ids continue rather than restart, and the end
    state equals the batch join-chain over everything ever written."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.streaming.pipelines import streaming_funnel

    T0 = 1704067200_000000
    MIN = 60_000_000
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )

    def mk(rows, offset):
        return spark.createDataFrame(
            [(offset + i, u, et) for i, (u, et) in enumerate(rows)],
            ["seq", "user_id", "event_type"],
        ).select(
            F.col("seq").alias("event_id"),
            F.timestamp_micros(F.lit(T0) + F.col("seq") * F.lit(MIN)).alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
        )

    src = tmp_path / "ev"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    marks = tmp_path / "batch_marks"
    marks.mkdir()

    def run_once():
        def emit(batch_df, batch_id):
            # Marker per processed batch id: append mode emits nothing for
            # batches without completed conversions, so batch-id
            # continuation across restarts is observed here, not via rows.
            (marks / str(batch_id)).touch()
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink)

        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_funnel(stream)
            .writeStream.foreachBatch(emit)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).collect()
        return rows, max(int(f.name) for f in marks.iterdir())

    # user 1: full conversion inside run 1 (the exactly-once canary);
    # user 2: view only (state must survive two restarts).
    waves = [
        [(1, "view"), (1, "click"), (1, "purchase"), (2, "view")],
        [(2, "click"), (3, "view")],          # user 2 advances post-restart
        [(2, "purchase"), (3, "click"), (3, "purchase")],  # both complete
    ]
    offsets = [0, 4, 6]

    mk(waves[0], offsets[0]).coalesce(1).write.mode("append").parquet(str(src))
    rows1, last1 = run_once()
    assert {r["user_id"] for r in rows1} == {1}

    # Query fully stopped; wave 2 lands, new query recovers state.
    mk(waves[1], offsets[1]).coalesce(1).write.mode("append").parquet(str(src))
    rows2, last2 = run_once()
    assert last2 > last1  # state-store epochs resumed, not restarted
    # No completions yet in run 2 — and user 1 NOT re-emitted.
    assert sorted(r["batch_id"] for r in rows2) == sorted(
        r["batch_id"] for r in rows1
    )

    mk(waves[2], offsets[2]).coalesce(1).write.mode("append").parquet(str(src))
    rows3, last3 = run_once()
    assert last3 > last2
    run3 = [r for r in rows3 if r["batch_id"] > max(r2["batch_id"] for r2 in rows2)]
    # user 2's stages straddled BOTH restarts; user 3's straddled one.
    assert {r["user_id"] for r in run3} == {2, 3}
    # Exactly one emission per converting user across all three runs.
    by_user = {}
    for r in rows3:
        by_user.setdefault(r["user_id"], []).append(r)
    assert {u: len(v) for u, v in by_user.items()} == {1: 1, 2: 1, 3: 1}

    # End state == the batch join-chain over everything ever written.
    all_events = spark.read.schema(schema).parquet(str(src))
    expect = {
        r["user_id"]: (
            int(r["t_view"].timestamp() * 1e6),
            int(r["t_click"].timestamp() * 1e6),
            int(r["t_purchase"].timestamp() * 1e6),
        )
        for r in streaming_funnel(all_events).collect()
    }
    got = {
        r["user_id"]: (r["t_view_us"], r["t_click_us"], r["t_purchase_us"])
        for r in rows3
    }
    assert got == expect


def test_streaming_cc_maintenance_matches_batch_on_cross_batch_merges(
    spark, tmp_path
):
    """The incremental CC face (round-4 VERDICT #8): clusters formed in
    earlier batches MERGE when a later batch's pair bridges them, a
    chain assembled across three batches resolves to one min-label
    component, and after every wave the maintained map equals the batch
    resolver over ALL pairs ever seen. A fresh-checkpoint replay of all
    files folds to the identity (graph-semantics idempotence — no
    watermark needed)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.corpus import dup_clusters_converged
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_cc_maintenance,
    )

    src = tmp_path / "pairs"
    src.mkdir()
    store = str(tmp_path / "clusters")
    schema = "id_a long, id_b long"

    def run(ckpt):
        q = streaming_cc_maintenance(
            spark, str(src), store, str(tmp_path / ckpt), schema
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    def store_map():
        return {
            r["doc_id"]: r["cluster_id"]
            for r in _snap(spark, store).collect()
        }

    def batch_map(pairs):
        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
        return {
            r["doc_id"]: r["cluster_id"]
            for r in dup_clusters_converged(df).collect()
        }

    waves = [
        [(1, 2), (3, 4), (10, 11)],   # three disjoint clusters
        [(2, 3)],                      # bridges {1,2} and {3,4} -> root 1
        [(4, 5), (20, 21)],            # extends the merged cluster; new one
    ]
    seen = []
    for i, w in enumerate(waves):
        spark.createDataFrame(w, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        run("ckpt")
        seen += w
        assert store_map() == batch_map(seen), f"diverged after wave {i + 1}"

    # The planted cross-batch chain 1-2-3-4-5 resolved to min-label 1
    # through TWO prior-cluster contractions.
    final = store_map()
    assert {final[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert final[10] == final[11] == 10
    assert final[20] == final[21] == 20

    # Replay everything via a fresh checkpoint: all endpoints translate
    # into single roots, every edge vanishes, the store is unchanged.
    run("ckpt_replay")
    assert store_map() == final


def test_streaming_trgm_maintenance_matches_batch_probe(spark, tmp_path):
    """The maintained posting store after two waves answers EXACTLY like
    the t40-style scan over all names seen (stream == batch), names
    re-delivered in a later wave are not double-posted (anti-join
    guard), and a fresh-checkpoint full replay leaves the store
    unchanged (high-watermark guard)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.trigram import trigram_similarity
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_trgm_maintenance,
        trgm_probe,
    )

    src = tmp_path / "names"
    src.mkdir()
    store = str(tmp_path / "postings")

    def run(ckpt):
        q = streaming_trgm_maintenance(
            spark, str(src), store, str(tmp_path / ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    w1 = ["blue bolt", "blunt edge", "bolt cutter"]
    w2 = ["blue bolt", "bland tone", "azure volt"]  # first is a re-delivery
    spark.createDataFrame([(n,) for n in w1], "p_name string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run("ckpt")
    spark.createDataFrame([(n,) for n in w2], "p_name string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run("ckpt")

    post = spark.read.parquet(store)
    # no double-posting: one posting set per DISTINCT name
    assert post.select("p_name").distinct().count() == 5
    assert (
        post.groupBy("p_name", "tg").count().filter(F.col("count") > 1).count()
        == 0
    )

    got = {
        r["p_name"]: r["sim"]
        for r in trgm_probe(spark, store, "blu bolt").collect()
    }
    names = spark.createDataFrame(
        [(n,) for n in set(w1 + w2)], "p_name string"
    )
    want = {
        r["p_name"]: r["sim"]
        for r in names.select(
            "p_name",
            F.round(
                trigram_similarity(F.col("p_name"), F.lit("blu bolt")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") > 0.0)
        .collect()
    }
    assert got == want

    before = post.count()
    run("ckpt_replay")  # fresh checkpoint: batch 0 re-delivers everything
    assert spark.read.parquet(store).count() == before


def test_streaming_bm25_maintenance_matches_batch_topk(spark, tmp_path):
    """The maintained BM25 store after two waves answers EXACTLY like
    bm25_topk's full scan over all docs seen (stream == batch — postings
    AND the additively-folded corpus stats), docs re-delivered in a
    later wave are not double-posted, and a fresh-checkpoint full
    replay leaves both stores unchanged (high-watermark guard)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.text_search import bm25_topk
    from mtg_vector_db_spark.streaming.pipelines import (
        bm25_probe,
        streaming_bm25_maintenance,
    )

    src = tmp_path / "docs"
    src.mkdir()
    postings = str(tmp_path / "postings")
    stats = str(tmp_path / "stats")

    def run(ckpt):
        q = streaming_bm25_maintenance(
            spark, str(src), postings, stats, str(tmp_path / ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    w1 = [
        (1, "spark joins vectors with spark"),
        (2, "a join of tables"),
        (3, "vector vector vector"),
    ]
    w2 = [
        (1, "spark joins vectors with spark"),  # re-delivery: must skip
        (4, "spark spark join vector"),
        (5, "nothing relevant here"),
    ]
    schema = "doc_id long, text string"
    spark.createDataFrame(w1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run("ckpt")
    spark.createDataFrame(w2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run("ckpt")

    post = spark.read.parquet(postings)
    # no double-posting: doc 1's rows appear once
    assert (
        post.groupBy("doc_id", "term").count()
        .filter(F.col("count") > 1).count() == 0
    )
    # additive stats fold to the union corpus
    st = spark.read.parquet(stats)
    assert st.agg(F.sum("n_docs")).collect()[0][0] == 5

    terms = ("vector", "join", "spark")
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_probe(spark, postings, stats, terms, k=10).collect()
    )
    full = spark.createDataFrame(
        w1 + w2[1:], schema
    )
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(
            full, terms, k=10, id_col="doc_id", text_col="text"
        ).collect()
    )
    assert got == want

    before = (post.count(), st.count())
    run("ckpt_replay")  # fresh checkpoint: batch 0 re-delivers everything
    assert (
        spark.read.parquet(postings).count(),
        spark.read.parquet(stats).count(),
    ) == before


def test_streaming_bm25_heals_torn_stats_first_crash(spark, tmp_path):
    """Crash consistency across the TWO bm25 stores (round-8
    discipline): simulate a crash BETWEEN the fold's two writes —
    batch 1's stats partition committed, its postings partition never
    written — then let the stream re-deliver the batch. The replay must
    recompute batch 1 from the pre-batch state, REPLACE the stats
    partition with identical rows (no double count), land the missing
    postings, and the healed stores must answer identically to the
    batch twin."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.text import tokens
    from mtg_vector_db_spark.operators.text_search import bm25_topk
    from mtg_vector_db_spark.streaming.pipelines import (
        bm25_probe,
        streaming_bm25_maintenance,
    )
    from mtg_vector_db_spark.streaming.stores import append_batch

    src = tmp_path / "docs"
    src.mkdir()
    postings = str(tmp_path / "postings")
    stats = str(tmp_path / "stats")

    def run(ckpt):
        q = streaming_bm25_maintenance(
            spark, str(src), postings, stats, str(tmp_path / ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    schema = "doc_id long, text string"
    w1 = [(1, "spark joins vectors with spark"), (2, "a join of tables")]
    w2 = [(3, "vector vector vector"), (4, "spark spark join vector")]
    spark.createDataFrame(w1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run("ckpt")

    # The torn state a crash between the two writes leaves behind:
    # batch 1's stats partition committed (the same rows the fold
    # computes), its postings never written.
    append_batch(
        spark.createDataFrame(w2, schema)
        .select(tokens(F.lower(F.col("text"))).alias("toks"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("toks")).alias("total_len"),
        )
        .coalesce(1),
        stats,
        1,
    )
    spark.createDataFrame(w2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run("ckpt")  # same checkpoint: the stream delivers w2 as batch 1

    st = spark.read.parquet(stats)
    assert st.count() == 2  # one delta row per batch — not re-appended
    assert st.agg(F.sum("n_docs")).collect()[0][0] == 4
    post = spark.read.parquet(postings)
    assert (  # healed: w2's postings landed exactly once
        post.groupBy("doc_id", "term").count()
        .filter(F.col("count") > 1).count() == 0
    )
    assert post.select("doc_id").distinct().count() == 4

    terms = ("vector", "join", "spark")
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_probe(spark, postings, stats, terms, k=10).collect()
    )
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(
            spark.createDataFrame(w1 + w2, schema), terms, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    )
    assert got == want


def test_streaming_ivfpq_append_matches_batch_layout(spark, tmp_path, sf0001):
    """The maintained IVF-PQ layout after two appended waves equals a
    one-shot batch assign+encode over all vectors (frozen centroids and
    codebooks — the p47 build), partitions land in the assigned cells,
    and a fresh-checkpoint replay appends nothing (watermark guard)."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.ann import (
        dynamic_seed_cells,
        ivf_assign,
    )
    from mtg_vector_db_spark.operators.quantize import (
        pq_encode,
        seeded_pq_codebooks,
    )
    from mtg_vector_db_spark.streaming.pipelines import streaming_ivfpq_append

    emb = spark.read.parquet(f"{sf0001}/embeddings.parquet")
    cents = dynamic_seed_cells(emb)
    cbs = seeded_pq_codebooks(emb, m=8, n_codes=16)

    src = tmp_path / "vecs"
    src.mkdir()
    store = str(tmp_path / "layout")

    def run(ckpt):
        q = streaming_ivfpq_append(
            spark, str(src), cents, cbs, store, str(tmp_path / ckpt)
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    w1 = emb.filter(F.col("vec_id") < 60)
    w2 = emb.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 120))
    w1.coalesce(1).write.mode("append").parquet(str(src))
    run("ckpt")
    w2.coalesce(1).write.mode("append").parquet(str(src))
    run("ckpt")

    both = emb.filter(F.col("vec_id") < 120)
    want = (
        pq_encode(both, cbs)
        .select("vec_id", "codes")
        .join(
            ivf_assign(both, cents).select(
                "vec_id", F.col("cell").cast("int").alias("cell")
            ),
            "vec_id",
        )
    )
    got = spark.read.parquet(store).select(
        "vec_id", "codes", F.col("cell").cast("int").alias("cell")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # Fresh checkpoint re-delivers everything as batch 0 -> watermarked out.
    n = got.count()
    run("ckpt_replay")
    assert spark.read.parquet(store).count() == n


def test_streaming_cc_maintenance_bucketed_rewrites_only_touched(
    spark, tmp_path
):
    """The 100 TB layout of the incremental CC map: hive-partitioned by
    pmod(doc_id, N) with dynamic partition overwrite. A merge that
    relabels docs in ONE bucket rewrites exactly that bucket — the
    untouched buckets' files keep their mtimes — while the map stays
    equal to the batch resolver, and a fresh-checkpoint replay writes
    nothing anywhere. Bucketing keys on doc_id so a cluster merge can
    never strand stale rows in a partition the overwrite doesn't emit."""
    import os as _os

    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.corpus import dup_clusters_converged
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_cc_maintenance,
    )

    src = tmp_path / "pairs"
    src.mkdir()
    store = tmp_path / "clusters"
    schema = "id_a long, id_b long"

    def run(ckpt):
        q = streaming_cc_maintenance(
            spark, str(src), str(store), str(tmp_path / ckpt), schema,
            bucket_by=4,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    from mtg_vector_db_spark.streaming.stores import (
        bucketed_snapshot_read,
        latest_version,
    )

    def bucket_mtimes():
        # Serving view of each bucket = its newest COMMITTED version
        # dir; untouched buckets must keep the same dir and mtimes.
        out = {}
        for d in store.iterdir():
            if not d.name.startswith("bucket="):
                continue
            v = latest_version(str(d))
            vdir = d / f"v{v:012d}"
            out[d.name] = (
                vdir.name,
                sorted(
                    (f.name, _os.path.getmtime(f))
                    for f in vdir.iterdir()
                    if f.name.endswith(".parquet")
                ),
            )
        return out

    def store_df():
        return bucketed_snapshot_read(spark, str(store), "cluster_bucket")

    def store_map():
        return {
            r["doc_id"]: r["cluster_id"]
            for r in store_df().select("doc_id", "cluster_id").collect()
        }

    # Three clusters whose docs land in distinct buckets (mod 4):
    # {1,2} -> buckets 1,2; {4,8} -> bucket 0; {7,11} -> bucket 3.
    w1 = [(1, 2), (4, 8), (7, 11)]
    spark.createDataFrame(w1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run("ckpt")
    assert store_map() == {1: 1, 2: 1, 4: 4, 8: 4, 7: 7, 11: 7}
    before = bucket_mtimes()
    assert set(before) == {f"bucket={b}" for b in (0, 1, 2, 3)}

    # (2, 7) merges clusters 1 and 7 -> root 1. Only docs 7 and 11
    # change labels; both live in bucket 3. Buckets 0/1/2 stay frozen.
    spark.createDataFrame([(2, 7)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run("ckpt")
    after = bucket_mtimes()
    for b in (0, 1, 2):
        assert after[f"bucket={b}"] == before[f"bucket={b}"], b
    assert after["bucket=3"] != before["bucket=3"]

    allp = spark.createDataFrame(w1 + [(2, 7)], schema)
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters_converged(allp).collect()
    }
    got = store_map()
    assert got == want
    # No duplicate/stale doc rows anywhere in the serving view.
    assert (
        store_df()
        .groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )

    # Full replay via a fresh checkpoint: every edge translates into a
    # single root, nothing is written in ANY bucket.
    run("ckpt_replay")
    assert bucket_mtimes() == after


def test_streaming_neardup_replay_and_redelivery_safe(spark, tmp_path):
    """Round-7 hardening (the streaming_bm25 discipline applied to the
    near-dup maintainer): a fresh-checkpoint full replay leaves both
    stores unchanged (index written LAST carries the high-watermark),
    and a doc_id re-delivered in a later batch is anti-joined out — no
    double-indexing, no duplicate pairs."""
    import json

    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_neardup_ingest,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": base})
    )

    def run(ckpt):
        q = streaming_neardup_ingest(
            spark, str(src), str(tmp_path / "index"),
            str(tmp_path / "pairs"), str(tmp_path / ckpt),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run("ckpt")
    # Batch 2 re-delivers doc 1 alongside a genuine near-dup.
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t})
            for i, t in [(1, base), (3, near)]
        )
    )
    run("ckpt")

    import pyspark.sql.functions as F

    idx = spark.read.parquet(str(tmp_path / "index"))
    # doc 1 indexed ONCE (4 bands), not re-indexed on re-delivery
    assert idx.filter(F.col("doc_id") == 1).count() == 4
    pairs = [
        (r["id_new"], r["id_old"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    ]
    assert pairs.count((3, 1)) == 1  # found once, no duplicates
    assert (1, 1) not in pairs

    before = (
        idx.count(),
        spark.read.parquet(str(tmp_path / "pairs")).count(),
    )
    run("ckpt_replay")  # fresh checkpoint: everything re-delivers
    assert (
        spark.read.parquet(str(tmp_path / "index")).count(),
        spark.read.parquet(str(tmp_path / "pairs")).count(),
    ) == before


def test_streaming_paragraph_dedup_heals_torn_out_first_crash(
    spark, tmp_path
):
    """Round-8 discipline: simulate a crash between the paragraph
    maintainer's two writes — batch 0's kept-docs partition committed,
    its fingerprint partition lost — by running a TWIN pipeline to
    completion and copying only its out partition; the replay must
    REPLACE the out partition (idempotent, not duplicated) and
    re-derive exactly the missing fingerprints, converging to the
    twin's final state."""
    from mtg_vector_db_spark.streaming.pipelines import (
        streaming_paragraph_dedup,
    )
    from mtg_vector_db_spark.streaming.stores import append_batch

    boiler = "subscribe to our newsletter for updates every day"
    rows = [(1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, "iota kappa lambda mu nu xi omicron pi " + boiler)]
    schema = "doc_id long, text string"

    def drain(tag):
        src = tmp_path / f"src_{tag}"
        if not src.exists():
            src.mkdir()
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
        q = (
            streaming_paragraph_dedup(
                spark, str(src), str(tmp_path / f"out_{tag}"),
                str(tmp_path / f"fps_{tag}"),
                str(tmp_path / f"ckpt_{tag}"), schema=schema,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("twin")  # complete run: the ground truth

    # Torn state for the main pipeline: out committed, fps missing.
    append_batch(
        spark.read.parquet(str(tmp_path / "out_twin")).drop("batch_id"),
        str(tmp_path / "out_main"),
        0,
    )
    drain("main_src")  # build main's source
    # replay main against the torn stores
    src = tmp_path / "src_main"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = (
        streaming_paragraph_dedup(
            spark, str(src), str(tmp_path / "out_main"),
            str(tmp_path / "fps_main"), str(tmp_path / "ckpt_main"),
            schema=schema,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out_main = spark.read.parquet(str(tmp_path / "out_main"))
    assert out_main.count() == 2  # healed, not duplicated
    fps_main = spark.read.parquet(str(tmp_path / "fps_main"))
    fps_twin = spark.read.parquet(str(tmp_path / "fps_twin"))
    assert (
        sorted(r["fp"] for r in fps_main.collect())
        == sorted(r["fp"] for r in fps_twin.collect())
    )
