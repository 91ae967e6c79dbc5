"""String/text scalar helpers (SURVEY.md §2.8 T-group).

Each helper is the Spark-native form of a string transformation the
reference performs in Python during ingestion or display; citations point
at /root/reference. All are pure column expressions (codegen-friendly,
UDF-free).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def strip_braces(c: Column) -> Column:
    """T5: mana-cost brace strip, ``{1}{B}{B}`` → ``1BB``
    (db/ingest_cards.py:25-28)."""
    return F.regexp_replace(c, r"[{}]", "")


def normalize_dashes(c: Column) -> Column:
    """T6: em-dash normalization (db/ingest_cards.py:36-39)."""
    return F.regexp_replace(c, r" — |—", " ")


def back_face_name(c: Column) -> Column:
    """T7: second face of an ``A // B`` double-faced name
    (db/ingest_cards.py:85-94); null when single-faced."""
    return F.when(c.contains("//"), F.trim(F.split(c, "//")[1]))


def coalesce_name(*cols: Column) -> Column:
    """T8: asciiName → faceName → name fallback (db/ingest_cards.py:31,84-91)."""
    return F.coalesce(*cols)


def power_toughness(p: Column, t: Column) -> Column:
    """T9: ``{power}/{toughness}`` when both present (db/ingest_cards.py:45-47)."""
    return F.when(p.isNotNull() & t.isNotNull(), F.concat_ws("/", p, t))


def extract_rule_refs(c: Column) -> Column:
    """T10: all ``rule NNN.NN[a]`` references, case-insensitive
    (rulesCleaning/glossary_parser.py:55-67)."""
    return F.regexp_extract_all(c, F.lit(r"(?i)rule\s+(\d+(?:\.\d+[a-z]*)?)"), 1)


def truncate_ellipsis(c: Column, n: int = 150) -> Column:
    """T14: display truncation ``text[:150] + '...'``
    (db/query_example.py:42,77,110)."""
    return F.when(
        F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))
    ).otherwise(c)


def rule_sort_key(rule_number: Column) -> list[Column]:
    """K5: natural sort key for rule numbers like ``100.2a`` — (major int,
    minor int, letter) (rulesCleaning/parse_rules_both_versions.py:200-208)."""
    return [
        F.regexp_extract(rule_number, r"^(\d+)", 1).cast("int"),
        F.regexp_extract(rule_number, r"^\d+\.(\d+)", 1).cast("int"),
        F.regexp_extract(rule_number, r"^\d+\.\d+([a-z]*)", 1),
    ]


def tokens(c: Column) -> Column:
    """Whitespace tokenization (the reference's ``' '.join``/split world,
    plus the token-counting surface a data pipeline needs)."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: F.length(t) > 0)


def hash_fraction(c: Column) -> Column:
    """Deterministic uniform [0,1) value from a key column: first 8 hex
    chars of md5 over 2^32. Engine-portable (md5 everywhere) — the basis
    for reproducible train/eval splits and down-sampling that never
    reshuffles when the corpus grows (unlike rand() or sample())."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


def clean_text(c: Column) -> Column:
    """Corpus-cleaning normalization: strip HTML tags, URLs, and control
    characters, collapse whitespace runs, trim. Order matters (tags before
    whitespace collapse)."""
    out = F.regexp_replace(c, r"<[^>]{0,500}>", " ")
    out = F.regexp_replace(out, r"https?://\S+|www\.\S+", " ")
    out = F.regexp_replace(out, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def mask_pii(c: Column) -> Column:
    """PII scrubbing pass: emails and international-ish phone numbers
    replaced with typed placeholder tokens (the form dedup/fingerprints
    can still hash stably)."""
    out = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    return F.regexp_replace(
        out, r"\+?\d[\d ()-]{7,}\d", "<PHONE>"
    )
