"""Column-expression function library (Catalyst-native wherever possible)."""

from mtg_vector_db_spark.functions.vector import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    vec_lit,
)
from mtg_vector_db_spark.functions.trigram import (  # noqa: F401
    trigram_set,
    trigram_similarity,
)
