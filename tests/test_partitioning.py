"""Skew/co-location strategies: semantic equivalence + plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mtg_vector_db_spark.operators import partitioning as P


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_equals_plain_join(spark, sf001):
    orders = spark.read.parquet(f"{sf001}/orders.parquet")
    cust = spark.read.parquet(f"{sf001}/customer.parquet")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = P.salted_join(
        orders.withColumnRenamed("o_custkey", "custkey"),
        cust.withColumnRenamed("c_custkey", "custkey"),
        "custkey",
        salt=4,
    ).select("o_orderkey", "c_name")
    assert rows(salted, "o_orderkey", "c_name") == rows(plain, "o_orderkey", "c_name")


def test_two_phase_agg_equals_direct(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("l_orderkey").alias("n"),
        F.max("l_extendedprice").alias("mx"),
    )
    salted = P.two_phase_agg(
        li,
        "l_returnflag",
        [("sum", "l_quantity", "qty"), ("count", "l_orderkey", "n"),
         ("max", "l_extendedprice", "mx")],
        salt=8,
    )
    assert rows(salted, "l_returnflag", "qty", "n", "mx") == rows(
        direct, "l_returnflag", "qty", "n", "mx"
    )


def test_two_phase_agg_rejects_non_algebraic(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    with pytest.raises(ValueError):
        P.two_phase_agg(li, "l_returnflag", [("avg", "l_quantity", "a")])


def test_hot_keys_shares_sum_to_at_most_one(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    hk = P.hot_keys(li, "l_returnflag", top=5).collect()
    assert 0 < sum(r["share"] for r in hk) <= 1.0 + 1e-9
    assert hk == sorted(hk, key=lambda r: -r["n"])


def test_bucketed_join_has_no_exchange(spark, sf001, tmp_path):
    """The co-location payoff: both sides bucketed by the key ⇒ the join
    plans without any shuffle Exchange."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path}/buckdb'")
    orders = spark.read.parquet(f"{sf001}/orders.parquet")
    cust = spark.read.parquet(f"{sf001}/customer.parquet")
    P.write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "buckdb.orders_b", "custkey", buckets=4, sort_by="custkey",
    )
    P.write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"),
        "buckdb.customer_b", "custkey", buckets=4, sort_by="custkey",
    )
    a = spark.table("buckdb.orders_b")
    b = spark.table("buckdb.customer_b")
    # Force the SMJ path so the assertion is about bucketing, not broadcast.
    joined = a.hint("merge").join(b, "custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    n_plain = (
        spark.read.parquet(f"{sf001}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf001}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert joined.count() == n_plain
    spark.sql("DROP DATABASE buckdb CASCADE")


def test_zorder_tightens_rowgroup_stats(spark, sf001, tmp_path):
    """Z-ordered layout: per-row-group (partkey, suppkey) bounding boxes
    are far tighter than natural order ⇒ two-dimensional scan pruning."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{sf001}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    natural = str(tmp_path / "natural")
    li.repartition(8).write.parquet(natural)
    zpath = str(tmp_path / "zorder")
    P.write_zordered(li, zpath, ("l_partkey", "l_suppkey"))

    def avg_box_area(path):
        import os

        areas, total = [], 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema:
                    md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                a = cols["l_partkey"]
                b = cols["l_suppkey"]
                areas.append(
                    (a.max - a.min + 1) * (b.max - b.min + 1)
                )
                total += 1
        return sum(areas) / total

    ratio = avg_box_area(zpath) / avg_box_area(natural)
    assert ratio < 0.5, f"z-order box-area ratio {ratio:.2f}"

    # data unchanged
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(natural).count()
    )


def test_compact_reduces_file_count(spark, sf001, tmp_path):
    import os

    path = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{sf001}/orders.parquet")
    orders.repartition(40).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    total = orders.count()

    n_after = P.compact(spark, path, target_files=2)
    assert n_before == 40 and n_after == 2
    assert spark.read.parquet(path).count() == total
