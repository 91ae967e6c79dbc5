"""Sketch operators: HLL cardinality + count-min frequency.

Oracle parity for the registered queries (t29/t30/c22) rides the
registry-wide sweeps; these tests pin the sketch-specific contracts the
oracle comparison can't see: accuracy bounds, merge algebra (the 100 TB
shard-reduce path), and the md5 hash derivation itself.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mtg_vector_db_spark.operators import sketches as SK


def _corpus(spark, n=5000, groups=1):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.concat(F.lit("value-"), F.col("id").cast("string")).alias("v"),
    )


def test_hll_hash_matches_reference_md5(spark):
    """bucket/rho derive from md5 exactly as documented: first 3 hex
    chars → bucket, next 15 hex chars → 60-bit suffix, rho = leading
    zeros + 1."""
    rows = (
        spark.range(50)
        .select(F.col("id").cast("string").alias("v"))
        .select("v", SK.hll_bucket(F.col("v")).alias("b"),
                SK.hll_rho(F.col("v")).alias("r"))
        .collect()
    )
    for row in rows:
        h = hashlib.md5(row["v"].encode()).hexdigest()
        assert row["b"] == int(h[:3], 16)
        v = int(h[3:18], 16)
        want = 61 if v == 0 else 61 - v.bit_length()
        assert row["r"] == want, (row["v"], h)


def test_hll_estimate_within_standard_error(spark):
    """m = 4096 registers → theoretical relative standard error
    1.04/√m ≈ 1.6%; require within 3σ on a 5k-distinct corpus."""
    df = _corpus(spark, 5000)
    est = SK.hll_estimate(
        SK.hll_registers(df, F.col("v"), ["g"]), ["g"]
    ).collect()[0]["n_hll"]
    assert abs(est - 5000) / 5000 < 0.05, est


def test_hll_registers_merge_equals_rebuild(spark):
    """Shard-wise register MAX == whole-corpus registers — the property
    that lets 1000 executors sketch independently and reduce once."""
    df = _corpus(spark, 2000)
    whole = {
        (r["g"], r["bucket"]): r["m_j"]
        for r in SK.hll_registers(df, F.col("v"), ["g"]).collect()
    }
    s1 = SK.hll_registers(
        df.filter(F.length("v") % 2 == 0), F.col("v"), ["g"]
    )
    s2 = SK.hll_registers(
        df.filter(F.length("v") % 2 != 0), F.col("v"), ["g"]
    )
    merged = (
        s1.unionByName(s2)
        .groupBy("g", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .collect()
    )
    assert {(r["g"], r["bucket"]): r["m_j"] for r in merged} == whole


def test_cms_never_underestimates_and_merges(spark):
    df = _corpus(spark, 3000)
    tc = (
        df.select(F.col("v").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sketch = SK.cms_build(tc)
    est = (
        SK.cms_estimate(tc, sketch)
        .join(tc, "token")
        .select(
            F.min(F.col("cms_est") - F.col("cnt")).alias("min_over"),
        )
        .collect()[0]
    )
    assert est["min_over"] >= 0
    # merge: cell-wise SUM of shard sketches == whole-corpus sketch
    t1 = tc.filter(F.length("token") % 2 == 0)
    t2 = tc.filter(F.length("token") % 2 != 0)
    merged = {
        (r["row"], r["cell"]): r["total"]
        for r in SK.cms_build(t1)
        .unionByName(SK.cms_build(t2))
        .groupBy("row", "cell")
        .agg(F.sum("total").alias("total"))
        .collect()
    }
    whole = {
        (r["row"], r["cell"]): r["total"] for r in sketch.collect()
    }
    assert merged == whole


def test_cms_sketch_size_is_bounded(spark):
    """The sketch never exceeds depth × width cells regardless of input
    size — the broadcastability invariant."""
    df = _corpus(spark, 20000)
    tc = (
        df.select(F.col("v").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert SK.cms_build(tc).count() <= SK.CMS_DEPTH * SK.CMS_WIDTH
