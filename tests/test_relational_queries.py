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


def test_funnel_stages_monotone(spark, sf001):
    """Each funnel stage is a subset of the previous: counts must not
    increase down the funnel."""
    rows = {
        r["stage"]: r["n_users"]
        for r in registry.QUERIES["r45_event_funnel"](spark, sf001).collect()
    }
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["3_purchase"] >= 0


def test_scd2_intervals_partition_history(spark, sf001):
    """Per user: intervals are disjoint, ordered, cover every event
    (n_events sums to the user's event count), and only the last
    interval is open-ended."""
    import pyspark.sql.functions as F

    hist = registry.QUERIES["r48_scd2_history"](spark, sf001)
    from mtg_vector_db_spark.plans.registry import events_df

    ev_counts = {
        r["user_id"]: r["n"]
        for r in events_df(spark, sf001)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_user: dict[int, list] = {}
    for r in hist.collect():
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, runs in by_user.items():
        assert sum(r["n_events"] for r in runs) == ev_counts[uid]
        opens = [r for r in runs if r["valid_to"] is None]
        assert len(opens) == 1  # exactly one current state
        for a, b in zip(runs, runs[1:]):  # ordered by valid_from
            assert a["valid_from"] <= b["valid_from"]
            if a["valid_to"] is not None:
                assert a["valid_to"] == b["valid_from"]  # contiguous


def test_hourly_ffill_dense_grid_no_gaps(spark, sf001):
    """The resampled series is hourly-dense per user and forward-fill
    leaves no nulls (the first grid hour always has an observation)."""
    rows = registry.QUERIES["r49_hourly_ffill"](spark, sf001).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, series in by_user.items():
        for a, b in zip(series, series[1:]):
            assert (b["hour_ts"] - a["hour_ts"]).total_seconds() == 3600
        assert all(r["value_ffill"] is not None for r in series)


def test_compaction_one_row_per_active_user(spark, sf001):
    """CDC compaction emits exactly one current row per distinct user."""
    from mtg_vector_db_spark.plans.registry import events_df

    out = registry.QUERIES["r47_latest_state_compaction"](spark, sf001)
    n_users = events_df(spark, sf001).select("user_id").distinct().count()
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users


def test_sketch_rollup_estimates_within_bound(spark, sf001):
    """Every region's HLL estimate is flagged within the 5% bound."""
    rows = registry.QUERIES["r50_sketch_rollup"](spark, sf001).collect()
    assert rows and all(r["est_ok"] for r in rows)


def test_regression_outputs_well_formed(spark, sf001):
    """Pearson r in [-1, 1]; n matches the per-nation order counts."""
    rows = registry.QUERIES["r57_price_trend_regression"](spark, sf001).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0
        assert r["n_orders"] > 0


def test_retrieval_metrics_in_unit_range(spark, sf001):
    """MRR and NDCG@10 are probabilities-like: within [0, 1]."""
    rows = registry.QUERIES["p18_retrieval_metrics"](spark, sf001).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0.0 <= r["mrr"] <= 1.0
        assert 0.0 <= r["ndcg10"] <= 1.0 + 1e-9
        assert 0 <= r["n_rel_topk"] <= 10


def test_weighted_median_matches_python_model(spark, sf001):
    """The window-crossing closed form equals a direct Python weighted
    median (lower median convention) per group."""
    from mtg_vector_db_spark.plans import registry

    registry.load_all()
    got = {
        r["flag"]: r["weighted_median_price"]
        for r in registry.QUERIES["r79_weighted_median_price"](
            spark, sf001
        ).collect()
    }
    li = spark.read.parquet(f"{sf001}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        rows = sorted(
            (round(p * 100), int(q))
            for p, q in zip(grp["l_extendedprice"], grp["l_quantity"])
        )
        tot = sum(q for _, q in rows)
        cum = 0
        for cents, q in rows:
            cum += q
            if 2 * cum >= tot:
                assert got[flag] == round(cents / 100.0, 2), flag
                break
