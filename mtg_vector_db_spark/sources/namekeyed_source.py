"""Custom Python DataSource for the reference's name-keyed JSON corpus.

The reference ingests ``{card_name: [printing, …], …}`` dictionaries by
iterating the dict client-side (``/root/reference/db/ingest_cards.py``);
``readers.read_name_keyed_json`` re-expresses that as a melt + double
explode over Spark's JSON reader. This module is the third, most
Spark-native form: a first-class **Python DataSource** (Spark 4
``pyspark.sql.datasource`` API) registered as ``namekeyed_json``, so the
format composes with the normal reader surface::

    spark.dataSource.register(NameKeyedJsonDataSource)
    df = spark.read.format("namekeyed_json").load("/data/cards-*.json")
    #  → (name string, card string)   one row per printing, card = raw
    #    JSON text, parsed downstream with from_json + declared schema

Why a DataSource and not a helper: partition planning. The helper reads
each file as ONE multiLine JSON record (a single task per file no
matter how many names it holds); the DataSource plans one input
partition per file and streams rows out of the executor-side parser, so
a directory of corpus dumps parallelizes file-wise with no driver-side
JSON handling, and the (name, card) rows enter Spark already exploded.

Scale posture: partition-per-file is the right grain for corpus dumps
(many ~100 MB files); a single monolithic file is still one task — the
format's own limit (a dict must be parsed whole), documented here
rather than hidden. Rows carry raw JSON strings, so schema inference
cost is deferred to an explicit from_json with a DECLARED schema (the
SURVEY §1.2 discipline).
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class NameKeyedJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(
                "namekeyed_json requires a path: "
                "spark.read.format('namekeyed_json').load(path)"
            )
        self.path = path

    def partitions(self) -> list[InputPartition]:
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".json")
            )
        else:
            files = sorted(_glob.glob(self.path)) or [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.file_path, encoding="utf-8") as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            raise ValueError(
                f"{partition.file_path}: expected a top-level JSON object "
                "mapping name -> array of records"
            )
        for name in sorted(data):
            cards = data[name]
            if not isinstance(cards, list):
                cards = [cards]
            for card in cards:
                yield (name, json.dumps(card, sort_keys=True))


class NameKeyedJsonDataSource(DataSource):
    """``spark.read.format("namekeyed_json")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "namekeyed_json"

    def schema(self) -> str:
        return "name string, card string"

    def reader(self, schema) -> NameKeyedJsonReader:
        return NameKeyedJsonReader(self.options)
