"""Input readers (SURVEY.md §2.1 S1-S5).

Spark-native forms of the reference's ingestion readers:

* S1/S3 — MTGJSON "AtomicCards": a JSON object mapping card name → array of
  card objects (/root/reference/db/ingest_cards.py:147-159). As a dict its
  keys are *columns* to spark.read.json, so we explode the map form.
* S2 — JSON array of rule objects (db/ingest_rules.py:71-79).
* S4 — blank-line-delimited glossary text (glossary_parser.py:17-39).
* S5 — line reader skipping blanks and index-header lines
  (parse_rules_both_versions.py:24-49) — the header skip is a broadcast
  anti-join, not a Python set lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_json_array(spark: SparkSession, path: str) -> DataFrame:
    """S2: JSON array file → one row per element."""
    return spark.read.option("multiLine", True).json(path)


def read_name_keyed_json(
    spark: SparkSession, path: str, name_col: str = "name"
) -> DataFrame:
    """S1+S3: ``{name: [obj, …], …}`` → rows (name, obj-struct).

    Read as a single-row wide record, melt columns to a map, explode both
    the map and each name's array. Schema of the obj structs is unified by
    Spark's JSON inference across all cards.
    """
    raw = spark.read.option("multiLine", True).json(path)
    cols = raw.columns
    pairs = F.create_map(
        *[p for c in cols for p in (F.lit(c), F.col(f"`{c}`"))]
    )
    melted = raw.select(F.explode(pairs).alias(name_col, "cards"))
    return melted.select(name_col, F.explode("cards").alias("card"))


def read_blank_line_blocks(
    spark: SparkSession, path: str, block_col: str = "block"
) -> DataFrame:
    """S4: whole-file read split on blank lines → one row per block
    (glossary_parser.py:17-22's ``content.split('\\n\\n')``)."""
    whole = spark.read.text(path, wholetext=True)
    return (
        whole.select(
            F.explode(F.split(F.col("value"), r"\n\s*\n")).alias(block_col)
        )
        .select(F.trim(F.col(block_col)).alias(block_col))
        .filter(F.length(block_col) > 0)
    )


def read_lines_excluding(
    spark: SparkSession, path: str, header_lines: DataFrame | None = None
) -> DataFrame:
    """S5: line source, blanks dropped, minus a header-line set via
    broadcast anti-join (parse_rules_both_versions.py:46-48)."""
    lines = (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("line"))
        .filter(F.length("line") > 0)
    )
    if header_lines is not None:
        lines = lines.join(
            F.broadcast(header_lines.select(F.col(header_lines.columns[0]).alias("line"))),
            "line",
            "left_anti",
        )
    return lines


def read_csv_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """CSV source with malformed-row quarantine: PERMISSIVE parse into a
    declared schema plus a corrupt-record column, split into (good,
    corrupt-raw-lines). The D3 discipline (never throw per-row, route
    rejects to a side channel) applied at the source boundary — at
    scale a FAILFAST csv read dies on the first bad byte of 100 TB.

    Returns ``(good, bad, cached)``; ``cached`` is the shared cached
    relation backing both splits — callers must ``cached.unpersist()``
    after materializing good/bad, or repeated ingests accumulate cached
    blocks in executor storage for the session lifetime.
    """
    raw = (
        spark.read.schema(schema + ", _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", "true")
        .csv(path)
    )
    # Caching before the split is REQUIRED: Spark forbids filtering only
    # the corrupt column off a lazy csv relation (SPARK-38523 guard).
    raw = raw.cache()
    good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, bad, raw


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar scan surface as parquet (pushdown,
    pruning); exists so corpora delivered as ORC need no conversion."""
    return spark.read.orc(path)


def read_tar_shards(
    spark: SparkSession,
    path: str,
    key_from_name: bool = True,
) -> DataFrame:
    """WebDataset-style tar-shard source: each ``*.tar`` under ``path``
    is a shard of training samples, each sample a group of member files
    sharing a basename (``00042.jpg``, ``00042.txt``, ``00042.json`` →
    sample key ``00042`` with three typed payloads) — the de-facto
    sharded layout for multimodal pre-training sets (Webdataset; public
    format). The reference has no binary corpus at all; this is the
    extension that lets the multimodal operators (operators/multimodal.py)
    read real shard archives.

    Returns ``(shard, sample_key, member, ext, payload binary)`` — one
    row per member file; group by ``(shard, sample_key)`` to assemble
    samples.

    Scale shape: ``binaryFile`` gives one row per shard (Spark assigns
    whole archives to tasks — tar has no internal split points, which is
    WHY the format shards at the file level); the stdlib ``tarfile``
    parse runs inside ``mapInPandas`` per shard, so bytes never transit
    the driver and shard count = parallelism. Keep shards ~100 MB-1 GB
    (the WebDataset convention) so tasks stay balanced.
    """
    import pandas as pd

    shards = spark.read.format("binaryFile").load(f"{path}/*.tar")

    def parse(batches):
        import io
        import os as _os
        import tarfile

        for pdf in batches:
            out = {
                "shard": [],
                "sample_key": [],
                "member": [],
                "ext": [],
                "payload": [],
            }
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                shard = _os.path.basename(shard_path)
                with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        base, dot, ext = m.name.partition(".")
                        out["shard"].append(shard)
                        out["sample_key"].append(
                            base if key_from_name else m.name
                        )
                        out["member"].append(m.name)
                        out["ext"].append(ext if dot else "")
                        f = tf.extractfile(m)
                        out["payload"].append(f.read() if f else b"")
            yield pd.DataFrame(out)

    return shards.select("path", "content").mapInPandas(
        parse,
        schema=(
            "shard string, sample_key string, member string, "
            "ext string, payload binary"
        ),
    )


def assemble_tar_samples(members: DataFrame) -> DataFrame:
    """Group tar-shard member rows (:func:`read_tar_shards`) into one row
    per sample: ``(shard, sample_key, exts array<string>,
    payloads map<string, binary>)``. One (shard, key)-keyed shuffle;
    members of a sample are adjacent in the archive, so with
    shard-aligned partitioning this coalesces map-side."""
    return (
        members.groupBy("shard", "sample_key")
        .agg(
            F.sort_array(F.collect_list("ext")).alias("exts"),
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("ext", "payload"))
                )
            ).alias("payloads"),
        )
    )
