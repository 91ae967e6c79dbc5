"""Python UDTFs — the Spark analog of the reference's plpgsql table
functions (SURVEY.md §2.11; /root/reference/db/init.sql:159-237 returns
TABLE, and /root/reference/db/ingest_cards.py:85-94 splits double-faced
card names on '//', T7).

UDTFs are the LAST-resort surface here: everything hot-path stays in
column expressions. A UDTF earns its place only for genuinely tabular
per-row expansion logic that callers want composable in SQL (LATERAL).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="face: string, face_index: int, is_back: boolean")
class ExpandFaces:
    """One row per face of a '//'-separated multi-face name.

    Mirrors the reference's back-face extraction
    (``name.split('//')[1].strip()``, db/ingest_cards.py:85-94) but yields
    EVERY face with its position, so both faces index into search.
    """

    def eval(self, name: str):  # noqa: D102
        if name is None:
            return
        for i, part in enumerate(name.split("//")):
            yield part.strip(), i, i > 0


def register_udtfs(spark: SparkSession) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("expand_faces", ExpandFaces)
