"""Query registry: every operator exposed through ``__spark_entry__``."""

from mtg_vector_db_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    oracle,
    query,
    tables,
)
