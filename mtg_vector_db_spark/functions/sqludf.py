"""SQL scalar UDF registrations (Spark 4 ``CREATE FUNCTION … RETURN``).

The engine's text metrics exist as Column-expression builders
(``functions/textstats.py``); pure-SQL users (the ``spark.sql`` surface
r19/r74 exercise) get the same functions as catalog-registered SQL
scalar functions. Bodies are plain Spark SQL expressions — they inline
into the caller's plan exactly like the Column forms (no Python
boundary, whole-stage codegen eligible), and the parity test pins them
row-for-row equal to the Column implementations.

Known engine limitation (Spark 4.1): TWO OR MORE lambda-bearing SQL
UDFs (the ``filter(…, t -> …)`` tokenizers) projected over a Union
child trip ``RemoveRedundantAliases`` plan validation
(PLAN_VALIDATION_FAILED_RULE_IN_BATCH). Workaround until fixed
upstream: exclude that one rule for the statement —
``spark.conf.set("spark.sql.optimizer.excludedRules",
"org.apache.spark.sql.catalyst.optimizer.RemoveRedundantAliases")`` —
or materialize the union first. The parity test exercises both paths.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mtg_vector_db_spark.functions.textstats import EN_STOPWORDS

_TOKS = r"filter(split(trim(text), '\\s+'), t -> length(t) > 0)"
_TOKS_L = r"filter(split(trim(lower(text)), '\\s+'), t -> length(t) > 0)"
_SW = "array(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"

_DEFS = {
    "mvdb_hash_frac": (
        "(key STRING) RETURNS DOUBLE RETURN "
        "conv(substring(md5(key), 1, 8), 16, 10) / 4294967296.0D"
    ),
    "mvdb_token_count": (
        f"(text STRING) RETURNS INT RETURN size({_TOKS})"
    ),
    "mvdb_stopword_ratio": (
        "(text STRING) RETURNS DOUBLE RETURN "
        f"CASE WHEN size({_TOKS_L}) > 0 THEN "
        f"size(filter({_TOKS_L}, t -> array_contains({_SW}, t))) "
        f"/ CAST(size({_TOKS_L}) AS DOUBLE) ELSE 0.0D END"
    ),
    "mvdb_noise_ratio": (
        "(text STRING) RETURNS DOUBLE RETURN "
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) "
        "/ CAST(length(text) AS DOUBLE) ELSE 0.0D END"
    ),
    # NB: fully inlined rather than composed from the functions above —
    # nested SQL-UDF calls trip RemoveRedundantAliases plan validation
    # in Spark 4.1 (the optimizer re-resolves the inlined sub-UDFs).
    "mvdb_quality": (
        "(text STRING) RETURNS DOUBLE RETURN "
        "round(least(1.0D, 0.3D + 0.4D * least(1.0D, "
        f"(CASE WHEN size({_TOKS_L}) > 0 THEN "
        f"size(filter({_TOKS_L}, t -> array_contains({_SW}, t))) "
        f"/ CAST(size({_TOKS_L}) AS DOUBLE) ELSE 0.0D END) * 4)"
        f" + 0.3D * least(1.0D, size({_TOKS}) / 100.0D)"
        " - 0.5D * (CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) "
        "/ CAST(length(text) AS DOUBLE) ELSE 0.0D END)), 6)"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine's SQL scalar functions (temporary, session
    scope); returns the registered names. Idempotent (OR REPLACE)."""
    for name, body in _DEFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(_DEFS)
