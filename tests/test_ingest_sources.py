"""Sources, sinks, ingestion pipeline, embedding stub, multimodal plumbing."""

from __future__ import annotations

import json
import math

import pytest

CARDS_JSON = {
    "Lightning Bolt": [
        {
            "asciiName": None,
            "faceName": None,
            "manaCost": "{R}",
            "manaValue": 1,
            "power": None,
            "toughness": None,
            "text": "Deal 3 damage to any target.",
            "type": "Instant",
        }
    ],
    "Delver of Secrets // Insectile Aberration": [
        {
            "asciiName": None,
            "faceName": "Delver of Secrets",
            "manaCost": "{U}",
            "manaValue": 1,
            "power": "1",
            "toughness": "1",
            "text": "At the beginning of your upkeep, look at the top card.",
            "type": "Creature — Human Wizard",
        }
    ],
    # duplicate business key on purpose (same faceName twice)
    "Delver of Secrets // Other": [
        {
            "asciiName": None,
            "faceName": "Delver of Secrets",
            "manaCost": "{U}",
            "manaValue": 1,
            "power": "1",
            "toughness": "1",
            "text": "dup",
            "type": "Creature",
        }
    ],
    "Empty Card": [
        {
            "asciiName": None,
            "faceName": None,
            "manaCost": None,
            "manaValue": 0,
            "power": None,
            "toughness": None,
            "text": None,
            "type": "Sorcery",
        }
    ],
}

GLOSSARY_TXT = """Flying
A creature with flying can't be blocked. See rule 702.9.

First Strike
Deals combat damage first. See rule 702.7 and section 5.


Haste
Can attack immediately.
"""


@pytest.fixture()
def cards_path(tmp_path):
    p = tmp_path / "cards.json"
    p.write_text(json.dumps(CARDS_JSON))
    return str(p)


def test_read_name_keyed_json(spark, cards_path):
    from mtg_vector_db_spark.sources.readers import read_name_keyed_json

    df = read_name_keyed_json(spark, cards_path)
    rows = df.collect()
    assert len(rows) == 4
    assert {r["name"] for r in rows} == set(CARDS_JSON)
    assert rows[0]["card"]["type"] is not None


def test_read_blank_line_blocks(spark, tmp_path):
    from mtg_vector_db_spark.sources.readers import read_blank_line_blocks

    p = tmp_path / "glossary.txt"
    p.write_text(GLOSSARY_TXT)
    blocks = read_blank_line_blocks(spark, str(p)).collect()
    assert len(blocks) == 3
    assert blocks[0]["block"].startswith("Flying")


def test_rule_ref_extraction(spark, tmp_path):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.functions.text import extract_rule_refs
    from mtg_vector_db_spark.sources.readers import read_blank_line_blocks

    p = tmp_path / "glossary.txt"
    p.write_text(GLOSSARY_TXT)
    refs = (
        read_blank_line_blocks(spark, str(p))
        .select(extract_rule_refs(F.col("block")).alias("refs"))
        .collect()
    )
    assert refs[0]["refs"] == ["702.9"]
    assert refs[1]["refs"] == ["702.7"]


def test_ingest_cards_pipeline(spark, cards_path, tmp_path):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.ingest import ingest_cards
    from mtg_vector_db_spark.sources.readers import read_name_keyed_json
    from mtg_vector_db_spark.sources.sinks import overwrite, quarantine

    raw = read_name_keyed_json(spark, cards_path)
    docs, embs, rejected = ingest_cards(raw)

    d = {r["card_name"]: r for r in docs.collect()}
    # faceName wins over full name (T8); dup of that key rejected (D1)
    assert "Delver of Secrets" in d
    assert len(d) == 3
    assert rejected.count() == 1
    # embeddings only for docs with text (P10): Empty Card filtered
    e = {r["card_name"]: r for r in embs.collect()}
    assert set(e) == {"Lightning Bolt", "Delver of Secrets"}
    vec = e["Lightning Bolt"]["embedding"]
    assert len(vec) == 64
    assert abs(sum(x * x for x in vec) - 1.0) < 1e-5

    # sinks round-trip: stable ids, overwrite, idempotent write, quarantine,
    # cascade delete, json sink
    from mtg_vector_db_spark.sources.sinks import (
        cascade_delete,
        stable_id,
        write_if_empty,
        write_json,
    )

    docs_id = stable_id(docs, ["card_name"], id_col="doc_id")
    ids = {r["card_name"]: r["doc_id"] for r in docs_id.collect()}
    assert sorted(ids.values()) == [1, 2, 3]  # dense, deterministic by key

    overwrite(docs_id, str(tmp_path / "docs"))
    assert not write_if_empty(spark, docs_id, str(tmp_path / "docs"))  # S9 skip
    assert write_if_empty(spark, docs_id, str(tmp_path / "docs2"))  # fresh target

    quarantine(rejected, str(tmp_path / "rejects"), "duplicate")
    assert spark.read.parquet(str(tmp_path / "rejects")).count() == 1

    emb_id = embs.join(
        docs_id.select("card_name", F.col("doc_id").alias("vec_id")), "card_name"
    )
    delete = spark.createDataFrame([(ids["Lightning Bolt"],)], "id long")
    docs2, embs2 = cascade_delete(docs_id, emb_id, delete)
    assert docs2.count() == 2 and "Lightning Bolt" not in {
        r["card_name"] for r in embs2.collect()
    }

    write_json(docs_id.drop("created_at"), str(tmp_path / "docs_json"))
    assert spark.read.json(str(tmp_path / "docs_json")).count() == 3


def test_embedding_determinism(spark):
    import pandas as pd

    from mtg_vector_db_spark.functions.embedding import hash_embed_np

    a = hash_embed_np(["hello", "world"])
    b = hash_embed_np(["hello", "world"])
    assert (a == b).all()
    assert abs(float((a[0] ** 2).sum()) - 1.0) < 1e-5
    assert not (a[0] == a[1]).all()


def test_multimodal_decode_plumbing(spark):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.multimodal import (
        decode_features,
        frame_sample_plan,
        real_decode,
    )

    media = spark.createDataFrame(
        [
            (1, "image", b"fake-image-bytes", 32, 32, 0),
            (2, "video", b"fake-video-bytes", 64, 48, 3500),
        ],
        "doc_id long, media_type string, payload binary, width int, height int, duration_ms int",
    )
    feats = {r["doc_id"]: r for r in decode_features(media).collect()}
    assert feats[1]["n_bytes"] == len(b"fake-image-bytes")
    assert len(feats[1]["feature_hex"]) == 16
    # deterministic across runs
    again = {r["doc_id"]: r for r in decode_features(media).collect()}
    assert feats[1]["feature_hex"] == again[1]["feature_hex"]

    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]

    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")


def test_streaming_ingest_and_windows(spark, tmp_path):
    """End-to-end streaming: file source → foreachBatch dedup upsert; and
    the watermarked hourly window vs its batch equivalent."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.streaming.pipelines import (
        hourly_event_counts,
        streaming_ingest,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "batch1.json").write_text(
        '\n'.join(
            json.dumps(x)
            for x in [
                {"card_name": "A", "text_content": "a"},
                {"card_name": "B", "text_content": "b"},
                {"card_name": "A", "text_content": "dup-in-batch"},
            ]
        )
    )
    q = streaming_ingest(
        spark,
        str(src),
        str(tmp_path / "docs"),
        str(tmp_path / "rej"),
        "card_name string, text_content string",
        str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    docs = spark.read.parquet(str(tmp_path / "docs"))
    assert docs.count() == 2
    # second batch: one new, one duplicate of existing
    (src / "batch2.json").write_text(
        '\n'.join(
            json.dumps(x)
            for x in [
                {"card_name": "C", "text_content": "c"},
                {"card_name": "B", "text_content": "dup-vs-existing"},
            ]
        )
    )
    q2 = streaming_ingest(
        spark,
        str(src),
        str(tmp_path / "docs"),
        str(tmp_path / "rej"),
        "card_name string, text_content string",
        str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    docs = spark.read.parquet(str(tmp_path / "docs"))
    assert sorted(r["card_name"] for r in docs.collect()) == ["A", "B", "C"]
    assert spark.read.parquet(str(tmp_path / "rej")).count() >= 2

    # windowed agg: streaming plan == batch plan on the same data
    from mtg_vector_db_spark.plans.registry import events_df

    ev = events_df(spark, "/root/testdata/sf0.001")
    batch = {
        (r["hour"], r["event_type"]): r["n"]
        for r in hourly_event_counts(ev).collect()
    }
    assert batch and all(n > 0 for n in batch.values())


def test_multimodal_resize_and_audio_chunks(spark):
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.multimodal import (
        audio_chunk_plan,
        fake_resize,
        resize_images,
    )

    media = spark.createDataFrame(
        [
            (1, "image", b"imagebytes", 0, 0, 0),
            (2, "audio", b"audiobytes", 0, 0, 12_500),
            (3, "video", b"videobytes", 0, 0, 3_000),
        ],
        "doc_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    resized = resize_images(media, 8, 8).collect()
    assert [r["doc_id"] for r in resized] == [1]
    assert len(resized[0]["payload"]) == 8 * 8 * 3
    assert bytes(resized[0]["payload"]) == fake_resize(b"imagebytes", 8, 8)

    chunks = audio_chunk_plan(media, chunk_ms=5000).orderBy("chunk_start_ms").collect()
    assert [(r["chunk_start_ms"], r["chunk_len_ms"]) for r in chunks] == [
        (0, 5000), (5000, 5000), (10000, 2500),
    ]


def test_ingest_cli_end_to_end_and_idempotent(spark, cards_path, tmp_path, capsys):
    """§3.3 entry point: first run writes docs/embeddings/quarantine; a
    re-run against the written documents ingests nothing new."""
    from mtg_vector_db_spark import ingest_cli

    out = str(tmp_path / "out")
    assert ingest_cli.main([str(cards_path), out], spark=spark) == 0
    first = capsys.readouterr().out
    assert "documents=3" in first  # 4 cards, 1 in-batch dup by faceName
    assert "rejected=1" in first

    out2 = str(tmp_path / "out2")
    assert (
        ingest_cli.main(
            [str(cards_path), out2, "--existing", f"{out}/documents.parquet"],
            spark=spark,
        )
        == 0
    )
    second = capsys.readouterr().out
    assert "documents=0" in second
    assert "rejected=4" in second


def test_overwrite_partitions_replaces_only_touched_days(spark, tmp_path):
    """Dynamic partition overwrite: re-running one day's batch replaces
    that day and leaves the others byte-identical."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.sources import sinks

    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [(d, i, float(i)) for d in (1, 2, 3) for i in range(10)],
        ["day", "k", "v"],
    )
    sinks.overwrite_partitions(base, path, "day")
    assert spark.read.parquet(path).count() == 30

    redo = spark.createDataFrame(
        [(2, i, float(i) * 10) for i in range(4)], ["day", "k", "v"]
    )
    sinks.overwrite_partitions(redo, path, "day")

    out = spark.read.parquet(path)
    assert out.filter(F.col("day") == 1).count() == 10  # untouched
    assert out.filter(F.col("day") == 3).count() == 10  # untouched
    assert out.filter(F.col("day") == 2).count() == 4   # replaced
    assert (
        out.filter(F.col("day") == 2).agg(F.sum("v")).head()[0] == 60.0
    )


def test_read_csv_with_quarantine_splits_bad_rows(spark, tmp_path):
    """Malformed CSV rows land in the quarantine side, not in the data
    and not as an exception."""
    p = tmp_path / "in.csv"
    p.write_text(
        "doc_id,score,name\n"
        "1,0.5,alpha\n"
        "2,not_a_number,beta\n"     # bad double
        "3,0.25,gamma\n"
    )
    from mtg_vector_db_spark.sources.readers import read_csv_with_quarantine

    good, bad, cached = read_csv_with_quarantine(
        spark, str(p), "doc_id long, score double, name string"
    )
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not_a_number" in bad.first()["raw_line"]
    cached.unpersist()
    assert not cached.is_cached


def test_orc_round_trip_preserves_rows(spark, tmp_path):
    """Parquet-sourced frame survives an ORC round trip byte-for-byte
    on values (same scan surface, different container)."""
    from mtg_vector_db_spark.sources.readers import read_orc

    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation_orc")
    src.write.orc(path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_write_training_shards_deterministic_layout(spark, sf001, tmp_path):
    """Shard membership and intra-shard order must be pure functions of
    the data: two writes produce byte-identical row sequences per shard;
    shard ids match the md5 formula; every shard directory has one file."""
    import glob

    from pyspark.sql import functions as F

    from mtg_vector_db_spark.sources.sinks import write_training_shards

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, p1, "doc_id", n_shards=8)
    write_training_shards(docs, p2, "doc_id", n_shards=8)

    dirs = sorted(glob.glob(f"{p1}/shard=*"))
    assert len(dirs) == 8
    for d in dirs:
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1

    import pandas as pd

    for k in range(8):
        a = pd.read_parquet(f"{p1}/shard={k}")
        b = pd.read_parquet(f"{p2}/shard={k}")
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))

    # shard assignment formula replayed independently
    expected = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id",
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), F.lit(""))), 1, 15),
                    16,
                    10,
                ).cast("bigint")
                % 8
            ).alias("s"),
        ).collect()
    }
    got = spark.read.parquet(p1).select("doc_id", "shard").collect()
    assert all(expected[r["doc_id"]] == int(r["shard"]) for r in got)

    # different salt reshuffles membership (epoch re-sharding knob)
    p3 = str(tmp_path / "c")
    write_training_shards(docs, p3, "doc_id", n_shards=8, salt="epoch1")
    moved = {
        r["doc_id"]: int(r["shard"])
        for r in spark.read.parquet(p3).select("doc_id", "shard").collect()
    }
    assert any(moved[d] != s for d, s in expected.items())


def test_namekeyed_datasource_matches_reader_helper(spark, tmp_path):
    """The registered Python DataSource yields the same (name, card)
    rows as the melt+explode helper, one partition per file."""
    import json

    import pyspark.sql.functions as F

    from mtg_vector_db_spark.sources.namekeyed_source import (
        NameKeyedJsonDataSource,
    )
    from mtg_vector_db_spark.sources.readers import read_name_keyed_json

    data1 = {
        "Blue Bolt": [{"cost": 1, "text": "zap"}, {"cost": 2, "text": "ZAP"}],
        "Aether Vial": [{"cost": 0, "text": "tick"}],
    }
    data2 = {"Blue Bolt": [{"cost": 3, "text": "zap zap"}]}
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.json").write_text(json.dumps(data1))
    (d / "b.json").write_text(json.dumps(data2))

    spark.dataSource.register(NameKeyedJsonDataSource)
    df = spark.read.format("namekeyed_json").load(str(d))
    assert df.rdd.getNumPartitions() == 2  # one per file
    rows = df.select(
        "name", F.get_json_object("card", "$.cost").alias("cost")
    ).collect()
    got = sorted((r["name"], int(r["cost"])) for r in rows)
    assert got == [
        ("Aether Vial", 0),
        ("Blue Bolt", 1),
        ("Blue Bolt", 2),
        ("Blue Bolt", 3),
    ]

    # Same multiset of (name, cost) pairs as the helper on one file.
    helper = read_name_keyed_json(spark, str(d / "a.json"))
    hrows = sorted(
        (r["name"], r["card"]["cost"]) for r in helper.collect()
    )
    assert hrows == [("Aether Vial", 0), ("Blue Bolt", 1), ("Blue Bolt", 2)]


def test_observed_quality_metrics_ride_the_action(spark):
    """Observation counters accumulate during the consuming action — no
    second scan — and report the planted defects exactly."""
    import pyspark.sql.functions as F

    from mtg_vector_db_spark.operators.ingest import observed_quality

    rows = [
        ("Bolt", "x", 1.0, "t", None, "bolt text", None),
        (None, "y", 2.0, "t", None, "  ", None),
        ("Vial", "z", 0.0, "t", None, "vial text", None),
    ]
    df = spark.createDataFrame(
        rows,
        "card_name string, card_type string, mana_value double, "
        "text_content string, related_faces string, embedding_text string, "
        "created_at timestamp",
    )
    observed, obs = observed_quality(df)
    n = observed.count()  # the one and only action
    assert n == 3
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_name"] == 1
    assert got["n_empty_embed_text"] == 1


def test_tar_shard_source_reads_webdataset_layout(spark, tmp_path):
    """WebDataset tar shards: members sharing a basename group into one
    sample; payload bytes round-trip exactly; shard parallelism = one
    input row per archive (bytes never transit the driver)."""
    import io
    import tarfile

    from mtg_vector_db_spark.sources.readers import (
        assemble_tar_samples,
        read_tar_shards,
    )

    d = tmp_path / "shards"
    d.mkdir()

    def make_shard(name, samples):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for key, files in samples.items():
                for ext, payload in files.items():
                    ti = tarfile.TarInfo(name=f"{key}.{ext}")
                    ti.size = len(payload)
                    tf.addfile(ti, io.BytesIO(payload))
        (d / name).write_bytes(buf.getvalue())

    make_shard(
        "shard-000.tar",
        {
            "00001": {"jpg": b"\xff\xd8fakejpeg", "txt": b"a red bird",
                      "json": b'{"lang": "en"}'},
            "00002": {"jpg": b"\xff\xd8other", "txt": b"a blue fish"},
        },
    )
    make_shard("shard-001.tar", {"00003": {"txt": b"third sample"}})

    members = read_tar_shards(spark, str(d))
    rows = members.collect()
    assert len(rows) == 6  # 3 + 2 + 1 member files
    by_member = {(r["shard"], r["member"]): r for r in rows}
    jpg = by_member[("shard-000.tar", "00001.jpg")]
    assert bytes(jpg["payload"]) == b"\xff\xd8fakejpeg"
    assert jpg["sample_key"] == "00001" and jpg["ext"] == "jpg"

    samples = {
        (r["shard"], r["sample_key"]): r
        for r in assemble_tar_samples(members).collect()
    }
    assert len(samples) == 3
    s1 = samples[("shard-000.tar", "00001")]
    assert s1["exts"] == ["jpg", "json", "txt"]
    assert bytes(s1["payloads"]["txt"]) == b"a red bird"
    s3 = samples[("shard-001.tar", "00003")]
    assert s3["exts"] == ["txt"]
