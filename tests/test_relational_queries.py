"""Relational-core correctness: Spark ≡ DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

REL_QUERIES = [n for n in registry.QUERIES if n.startswith("r")]


@pytest.mark.parametrize("name", REL_QUERIES)
def test_oracle_parity(spark, sf001, name):
    if name not in registry.ORACLES:
        pytest.skip("rows-only query")
    df = registry.QUERIES[name](spark, sf001)
    assert_matches_oracle(df, registry.ORACLES[name], sf001)


def test_pricing_summary_shape(spark, sf001):
    rows = registry.QUERIES["r01_pricing_summary"](spark, sf001).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["count_order"] > 0
        assert abs(r["avg_qty"] * r["count_order"] - r["sum_qty"]) < 1.0


def test_anti_semi_partition_customers(spark, sf001):
    """anti(no orders) + semi-complement partition the customer set."""
    import pyspark.sql.functions as F

    cust = spark.read.parquet(f"{sf001}/customer.parquet")
    orders = spark.read.parquet(f"{sf001}/orders.parquet")
    n_anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").count()
    n_semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").count()
    assert n_anti + n_semi == cust.count()
