"""Relational-core queries (SURVEY.md §2.1-2.6): scans, filters, joins,
aggregations, sorts/top-k, set ops, window/event-time operators.

These are the Spark-native forms of every relational shape the reference
ships to Postgres (projections/filters db/search_strategies.py:51-106, FK
joins db/init.sql:175-176, group-by counts db/ingest_rules.py:184-204,
ordered top-k db/search_strategies.py:156-158, existence probes
db/ingest_cards.py:240-258), exercised on the driver's TPC-H-ish tables.

Float-parity rule for aggregates: floating sums are order-dependent
(Spark partial aggregation vs DuckDB sequential), so every SUM over a
double column goes through an exact DECIMAL cast on BOTH sides — decimal
addition is associative, making the result bit-stable regardless of
partitioning — then back to double for the output schema. This is also the
right call at 100 TB: money in binary float drifts; money in decimal doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mtg_vector_db_spark.plans.registry import oracle, query, tables

DEC = "decimal(18,2)"
DEC4 = "decimal(22,4)"


def _dsum2(col: F.Column) -> F.Column:
    """Exact sum of a money-ish double: decimal(18,2) in, double out."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), 2)


# ---------------------------------------------------------------------------
# A2/A6-style pricing summary (TPC-H Q1 shape): multi-aggregate group-by
# with partial/final hash aggregation — the scale-critical aggregate path.
# ---------------------------------------------------------------------------
@query("r01_pricing_summary")
def r01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    # Scales chosen to be EXACT for the data: price/discount/tax are 2-dp, so
    # price*(1-d) has 4 true decimals and price*(1-d)*(1+t) has 6 — casting at
    # those scales never rounds, which is what makes the sum engine-invariant.
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(22,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum2(F.col("l_quantity")).alias("sum_qty"),
            _dsum2(F.col("l_extendedprice")).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 6).alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


oracle(
    "r01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE), 4) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE), 6) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# J1 chain: orders ⋈ customer ⋈ nation ⋈ region with dimension broadcast —
# the FK-join pattern of init.sql:175-176 at star-schema shape. Filters on
# the region side prune before the join (Catalyst pushes them down).
# ---------------------------------------------------------------------------
@query("r02_revenue_by_nation")
def r02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation, region = tables(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum2(F.col("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


oracle(
    "r02_revenue_by_nation",
    """
    SELECT r_name, n_name,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)


# ---------------------------------------------------------------------------
# A3: group-by count + top-N (db/ingest_rules.py:195-204 "top sections").
# ---------------------------------------------------------------------------
@query("r03_event_type_counts")
def r03_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), _dsum2(F.col("value")).alias("total_value"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(10)
    )


oracle(
    "r03_event_type_counts",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# J2 as anti-join: rows NOT present in another table (the reference's
# per-row existence probe for dedup, db/ingest_cards.py:240-258, done as a
# single distributed anti-join instead of 30k round-trips).
# ---------------------------------------------------------------------------
@query("r04_customers_without_orders")
def r04_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


oracle(
    "r04_customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)


# ---------------------------------------------------------------------------
# J2 as semi-join: the positive existence probe.
# ---------------------------------------------------------------------------
@query("r05_customers_with_open_orders")
def r05_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    # Integer-cents average: round(avg(double), n) can land on a true
    # decimal tie (x...5 exactly), where Spark rounds the shortest-repr
    # decimal and DuckDB the binary value — one cent of divergence (the
    # r72 fuzz finding). Summing exact cents and rounding the integer
    # ratio keeps every tie on an exactly-representable .5, which both
    # engines round away from zero identically.
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.round(
                    F.sum(cents).cast("double") * 100 / F.count(F.lit(1))
                )
                / 10000,
                4,
            ).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


oracle(
    "r05_customers_with_open_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers,
           round(round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                            AS DOUBLE) * 100 / count(*)) / 10000, 4)
             AS avg_acctbal
    FROM customer WHERE EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)


# ---------------------------------------------------------------------------
# K1 relational form: ORDER BY … LIMIT k → TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@query("r06_top_orders")
def r06_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


oracle(
    "r06_top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
    """,
)


# ---------------------------------------------------------------------------
# Window function: per-group top-k (rank-within-partition) — the positional
# re-association pattern (J5, db/search_strategies.py:203-215) generalized.
# ---------------------------------------------------------------------------
@query("r07_top_orders_per_customer")
def r07_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 2)
        .orderBy("o_custkey", "rank")
    )


oracle(
    "r07_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders WHERE o_custkey < 100
    ) WHERE rank <= 2 ORDER BY o_custkey, rank
    """,
)


# ---------------------------------------------------------------------------
# Event-time tumbling window (extension per SURVEY §2.10; batch form of the
# Structured Streaming hourly rollup in streaming/windows.py).
# ---------------------------------------------------------------------------
@query("r08_events_hourly")
def r08_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") < F.lit("2024-01-03"))
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), _dsum2(F.col("value")).alias("total_value"))
        .orderBy("hour", "event_type")
    )


oracle(
    "r08_events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
           event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY 1, 2 ORDER BY hour, event_type
    """,
)


# ---------------------------------------------------------------------------
# Sliding event-time window (2h window, 1h slide): each event lands in two
# buckets. Spark's window() generator vs an explicit 2-bucket UNION in SQL.
# ---------------------------------------------------------------------------
@query("r09_events_sliding")
def r09_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") < F.lit("2024-01-02"))
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), _dsum2(F.col("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "n",
            "total_value",
        )
        .orderBy("window_start")
    )


oracle(
    "r09_events_sliding",
    """
    WITH buckets AS (
      SELECT date_trunc('hour', ts) AS ws, value FROM events
      WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
      WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM buckets GROUP BY ws ORDER BY window_start
    """,
)


# ---------------------------------------------------------------------------
# A7/J3: group-and-nest — subrules collected under their parent rule
# (rulesCleaning/parse_rules_both_versions.py:149-198), as order⋈lineitem
# nesting. Nested list rendered as a CSV string for hash stability.
# ---------------------------------------------------------------------------
@query("r10_order_line_nesting")
def r10_order_line_nesting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    nested = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("l_linenumber"))), ","
            ).alias("line_numbers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return (
        orders.filter(F.col("o_orderkey") < 200)
        .join(nested, orders.o_orderkey == nested.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("line_numbers", F.lit("")).alias("line_numbers"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
        .orderBy("o_orderkey")
    )


oracle(
    "r10_order_line_nesting",
    """
    SELECT o_orderkey,
           coalesce(string_agg(l_linenumber, ',' ORDER BY l_linenumber), '') AS line_numbers,
           count(l_orderkey) AS n_lines
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey < 200
    GROUP BY o_orderkey ORDER BY o_orderkey
    """,
)


# ---------------------------------------------------------------------------
# U1/U3: union + distinct across sources (multi-source fan-out shape,
# db/search_with_reranker.py:249-290).
# ---------------------------------------------------------------------------
@query("r11_union_distinct")
def r11_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, region, nation = tables(spark, sf_dir, "customer", "region", "nation")
    a = cust.select(F.col("c_mktsegment").alias("name")).distinct()
    b = region.select(F.col("r_name").alias("name"))
    c = nation.select(F.col("n_name").alias("name"))
    return a.unionByName(b).unionByName(c).distinct().orderBy("name")


oracle(
    "r11_union_distinct",
    """
    SELECT DISTINCT name FROM (
      SELECT DISTINCT c_mktsegment AS name FROM customer
      UNION ALL SELECT r_name FROM region
      UNION ALL SELECT n_name FROM nation
    ) ORDER BY name
    """,
)


# ---------------------------------------------------------------------------
# P8: dynamic JSON field access (card_data['type'] analog,
# db/search_strategies.py:190-196) over events.props.
# ---------------------------------------------------------------------------
@query("r12_json_field_stats")
def r12_json_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


oracle(
    "r12_json_field_stats",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS min_k,
           max(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS max_k
    FROM events
    WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
    GROUP BY event_type ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# A1: global counts across all tables (db/query_example.py:148-171's
# corpus-stats report) — one row, scalar subquery per table.
# ---------------------------------------------------------------------------
@query("r13_corpus_stats")
def r13_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb, li = tables(spark, sf_dir, "documents", "embeddings", "lineitem")
    a = docs.agg(F.count(F.lit(1)).alias("n_documents"))
    b = emb.agg(F.count(F.lit(1)).alias("n_embeddings"))
    c = li.agg(F.count(F.lit(1)).alias("n_lineitems"))
    return a.crossJoin(b).crossJoin(c)


oracle(
    "r13_corpus_stats",
    """
    SELECT (SELECT count(*) FROM documents) AS n_documents,
           (SELECT count(*) FROM embeddings) AS n_embeddings,
           (SELECT count(*) FROM lineitem) AS n_lineitems
    """,
)


# ---------------------------------------------------------------------------
# Extensions beyond the reference's surface (SURVEY.md §2.4 note): rollup /
# cube / grouping sets and distinct-count aggregates — the OLAP shapes a
# 100 TB analytics engine is expected to serve. Spark plans one Expand +
# one hash aggregation for all grouping sets (no per-set rescan).
# ---------------------------------------------------------------------------
@query("r14_rollup_revenue")
def r14_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum2(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


oracle(
    "r14_rollup_revenue",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
)


@query("r15_cube_lineitem")
def r15_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum2(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


oracle(
    "r15_cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
)


@query("r16_distinct_counts")
def r16_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


oracle(
    "r16_distinct_counts",
    """
    SELECT count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
)


# ---------------------------------------------------------------------------
# Session windows (gap-based, per user) — streaming/pipelines.sessionize
# run in batch mode; the oracle replays it as a gaps-and-islands SQL
# (lag + cumulative sum). Extension beyond the reference (SURVEY.md §2.10).
# ---------------------------------------------------------------------------
@query("r17_user_sessions")
def r17_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.streaming.pipelines import sessionize

    (events,) = tables(spark, sf_dir, "events")
    return sessionize(events, gap="30 minutes").orderBy(
        "user_id", "session_start_us"
    )


oracle(
    "r17_user_sessions",
    """
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)


# ---------------------------------------------------------------------------
# As-of join: each click picks up the latest preceding error of the same
# user (operators/asof.py — union + last(ignorenulls), ONE shuffle). The
# oracle is DuckDB's native ASOF LEFT JOIN. Extension beyond the reference.
# ---------------------------------------------------------------------------
@query("r18_click_asof_error")
def r18_click_asof_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.asof import asof_join

    (events,) = tables(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, errors, keys=["user_id"], ts_col="ts",
        payload_cols=("value", "ts"), tie_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.col("asof_value").alias("last_error_value"),
        F.unix_micros("asof_ts").alias("error_ts_us"),
    ).orderBy("event_id")


oracle(
    "r18_click_asof_error",
    """
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_ts_us,
           e.value AS last_error_value, epoch_us(e.ts) AS error_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    ORDER BY c.event_id
    """,
)


# ---------------------------------------------------------------------------
# The SQL API surface: the engine's plans are equally expressible as ANSI
# SQL over registered views (spark.sql ⇒ same Catalyst plan as the
# DataFrame API). TPC-H Q3 shape: segment-filtered 3-way join, revenue
# top-10. Demonstrates that a reference user who writes SQL (everything in
# /root/reference/db is SQL strings) can keep writing SQL here.
# ---------------------------------------------------------------------------
@query("r19_sql_shipping_priority")
def r19_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust.createOrReplaceTempView("v_customer")
    orders.createOrReplaceTempView("v_orders")
    li.createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l.l_orderkey,
               ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
               CAST(o.o_orderdate AS STRING) AS o_orderdate,
               o.o_orderpriority
        FROM v_customer c
        JOIN v_orders o ON c.c_custkey = o.o_custkey
        JOIN v_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND l.l_shipdate > o.o_orderdate
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
        """
    )


oracle(
    "r19_sql_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Range join (operators/range_join.py): events counted into synthetic
# 90-minute maintenance windows every 6 hours, via the bucketed equi-join
# rewrite (a BETWEEN join would plan nested-loop). Extension operator.
# ---------------------------------------------------------------------------
@query("r20_range_join_windows")
def r20_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.range_join import range_join

    (events,) = tables(spark, sf_dir, "events")
    win = spark.range(16).select(
        F.col("id").alias("window_id"),
        F.timestamp_micros(
            F.lit(1704067200_000000) + F.col("id") * F.lit(21600_000000)
        ).alias("start_ts"),
        F.timestamp_micros(
            F.lit(1704067200_000000)
            + F.col("id") * F.lit(21600_000000)
            + F.lit(5400_000000)
        ).alias("end_ts"),
    )
    return (
        range_join(events, win, bucket_seconds=3600)
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum2(F.col("value")).alias("total_value"),
        )
        .orderBy("window_id")
    )


oracle(
    "r20_range_join_windows",
    """
    WITH win AS (
      SELECT i AS window_id,
             to_timestamp(1704067200 + i * 21600) AS start_ts,
             to_timestamp(1704067200 + i * 21600 + 5400) AS end_ts
      FROM range(0, 16) t(i)
    )
    SELECT w.window_id, count(*) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events e JOIN win w
      ON e.ts >= w.start_ts AND e.ts < w.end_ts
    GROUP BY w.window_id ORDER BY w.window_id
    """,
)


# ---------------------------------------------------------------------------
# Exact percentiles (quality-threshold shape: "what score cuts the worst
# 5% of documents"): Spark percentile() vs DuckDB quantile_cont — both
# exact linear-interpolation definitions.
# ---------------------------------------------------------------------------
@query("r21_price_percentiles")
def r21_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    pct = F.percentile(F.col("l_extendedprice"), F.array(*[F.lit(x) for x in (0.05, 0.5, 0.95, 0.99)]))
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.get(pct, i), 4).alias(name)
            for i, name in enumerate(["p05", "p50", "p95", "p99"])
        ]
    ).orderBy("l_returnflag")


oracle(
    "r21_price_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.05), 4) AS p05,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# ---------------------------------------------------------------------------
# Supplier-side star join (completes scan coverage of all 10 driver
# tables): revenue per supplier nation restricted to one part brand —
# two broadcast dims (supplier, part) against the lineitem fact.
# ---------------------------------------------------------------------------
@query("r22_brand_revenue_by_supp_nation")
def r22_brand_revenue_by_supp_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, part, nation, li = tables(
        spark, sf_dir, "supplier", "part", "nation", "lineitem"
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(DEC4)
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


oracle(
    "r22_brand_revenue_by_supp_nation",
    """
    SELECT n.n_name, count(*) AS n_lines,
           round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
           count(DISTINCT s.s_suppkey) AS n_suppliers
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_brand = 'Brand#1'
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)


# ---------------------------------------------------------------------------
# Deterministic train/eval split (functions/text.py:hash_fraction): an
# md5-keyed uniform draw, stable under corpus growth — rand()/sample()
# reshuffle rows between splits every run and on every append; a key hash
# never does. Oracle replays the identical arithmetic.
# ---------------------------------------------------------------------------
@query("r23_train_eval_split")
def r23_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.functions.text import hash_fraction

    (docs,) = tables(spark, sf_dir, "documents")
    frac = hash_fraction(F.col("doc_id"))
    split = F.when(frac < 0.8, "train").when(frac < 0.9, "eval").otherwise("test")
    return (
        docs.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


oracle(
    "r23_train_eval_split",
    """
    WITH f AS (
      SELECT list_sum(list_transform(range(1, 9),
               i -> (strpos('0123456789abcdef',
                            substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                    * power(16, 8 - i)))
             / 4294967296.0 AS frac
      FROM documents
    )
    SELECT CASE WHEN frac < 0.8 THEN 'train'
                WHEN frac < 0.9 THEN 'eval' ELSE 'test' END AS split,
           count(*) AS n_docs
    FROM f GROUP BY 1 ORDER BY split
    """,
)


# ---------------------------------------------------------------------------
# Skew diagnosis surfaced as a query (operators/partitioning.py:hot_keys):
# the measurement run before choosing between AQE skew-split, salting, or
# broadcast for a hot join key. One hash aggregation + TakeOrdered.
# ---------------------------------------------------------------------------
@query("r24_hot_keys")
def r24_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.partitioning import hot_keys

    (orders,) = tables(spark, sf_dir, "orders")
    out = hot_keys(orders, "o_custkey", top=10)
    return out.select(
        "o_custkey", "n", F.round("share", 9).alias("share")
    ).orderBy(F.desc("n"), F.asc("o_custkey"))


oracle(
    "r24_hot_keys",
    """
    WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey),
    t AS (SELECT count(*) AS total FROM orders)
    SELECT o_custkey, n, round(n * 1.0 / total, 9) AS share
    FROM c CROSS JOIN t
    ORDER BY n DESC, o_custkey ASC LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of orders-per-customer INCLUDING the zero
# bucket — a left outer join into a double aggregation. The outer join is
# what makes it different from a plain groupBy: inner would silently drop
# order-less customers. count(o_orderkey) counts non-null only, so the
# no-order group lands in c_count = 0. Scale note: both aggregations key on
# high-cardinality then low-cardinality columns — the second is nearly free;
# the join itself shuffles on c_custkey/o_custkey unless AQE broadcasts.
# ---------------------------------------------------------------------------
@query("r25_order_count_distribution")
def r25_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


oracle(
    "r25_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders — aggregate lineitem per order,
# HAVING-filter on the sum, then join back to orders and customer. The
# having-filter runs BEFORE the joins, so only the tiny qualifying set is
# joined (semi-join pushback the reference gets from Postgres for free).
# ---------------------------------------------------------------------------
@query("r26_large_volume_orders")
def r26_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum2(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round(F.col("o_totalprice").cast(DEC).cast("double"), 2).alias(
                "o_totalprice"
            ),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


oracle(
    "r26_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) > 150
    )
    SELECT c.c_name, c.c_custkey, b.l_orderkey AS o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           round(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2)
             AS o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority count over orders that HAVE at least one
# late-shipped line (l_shipdate > o_orderdate + 30 days) — an EXISTS that
# must be a LEFT SEMI join, not inner: inner would double-count orders with
# several late lines. The semi join needs only l_orderkey + l_shipdate from
# lineitem (column pruning keeps the probe narrow).
# ---------------------------------------------------------------------------
@query("r27_priority_late_orders")
def r27_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    joined = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > F.date_add(orders.o_orderdate, 30)),
        "left_semi",
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


oracle(
    "r27_priority_late_orders",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: cheapest-supplier-per-part — the correlated MIN subquery
# re-expressed as a window min over the (part, supplier) unit-cost relation
# (lineitem stands in for partsupp). min() OVER (PARTITION BY part) + filter
# computes the correlated threshold in ONE shuffle on l_partkey instead of a
# per-row subquery; ties broken by supplier key for determinism.
# ---------------------------------------------------------------------------
@query("r28_min_cost_supplier")
def r28_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, supp, li = tables(spark, sf_dir, "part", "supplier", "lineitem")
    # Unit cost in integer micro-units: cents × 10⁴ DIV quantity. Decimal
    # division at a fixed scale can land EXACTLY on a .5 tie (price/2^k
    # quantities), and Spark (half-up) vs DuckDB disagree on ties — found
    # by the sf0.1 oracle sweep. Integer floor-division has no rounding
    # mode at all, so min/compare are engine-invariant by construction.
    cost = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "(CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)"
                " DIV CAST(l_quantity AS BIGINT)"
            ).alias("unit_cost"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_cost").alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("supply_cost").over(w)).filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .filter(F.col("p_brand") == "Brand#13")
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            (F.col("supply_cost") / F.lit(1000000.0)).alias("supply_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


oracle(
    "r28_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)
                 // CAST(l_quantity AS BIGINT)) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name,
           c.supply_cost / 1000000.0 AS supply_cost
    FROM cost c
    JOIN part p ON c.l_partkey = p.p_partkey
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    WHERE p.p_brand = 'Brand#13'
      AND c.supply_cost = (
        SELECT min(c2.supply_cost) FROM cost c2
        WHERE c2.l_partkey = c.l_partkey
      )
    ORDER BY p.p_partkey, s.s_name
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: rich-but-idle customers — acctbal above the global mean
# of positive balances AND no orders. The scalar aggregate is computed once
# and folded into the filter (Spark: crossJoin of a 1-row aggregate, which
# BroadcastNestedLoopJoin turns into a broadcast scalar); the NOT EXISTS is
# a left anti join. Sum in decimal so the threshold is bit-identical across
# engines — a float-boundary customer must fall on the same side in both.
# ---------------------------------------------------------------------------
@query("r29_idle_rich_customers")
def r29_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, nation = tables(spark, sf_dir, "customer", "orders", "nation")
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)) / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("avg_bal")
    )
    idle = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast("decimal(18,6)") > F.col("avg_bal"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum2(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


oracle(
    "r29_idle_rich_customers",
    """
    WITH t AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) / count(*)
                  AS DECIMAL(18,6)) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, count(*) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c CROSS JOIN t
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)


# ---------------------------------------------------------------------------
# Stream-stream interval join, batch-equivalent form (streaming/pipelines.py
# :attribute_purchases — one plan, two runners): every purchase attributed
# to the same user's clicks in the trailing hour. Inner pairs from the
# operator, re-joined LEFT to purchases so zero-click purchases keep a row
# (the streaming runner emits the same inner pairs incrementally; the test
# pins stream ≡ batch). Gap arithmetic in integer microseconds — exact in
# both engines.
# ---------------------------------------------------------------------------
@query("r30_purchase_click_attribution")
def r30_purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.streaming.pipelines import attribute_purchases

    (events,) = tables(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    pairs = attribute_purchases(clicks, purchases, within="1 hour")
    agg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h"),
        F.max(F.unix_micros(F.col("click_ts"))).alias("last_click_us"),
    )
    return (
        purchases.select("event_id", "user_id", "ts")
        .join(agg, "event_id", "left_outer")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n_clicks_1h"), F.lit(0)).alias("n_clicks_1h"),
            (F.unix_micros(F.col("ts")) - F.col("last_click_us")).alias(
                "last_gap_us"
            ),
        )
        .orderBy("event_id")
    )


oracle(
    "r30_purchase_click_attribution",
    """
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           count(c.ts) AS n_clicks_1h,
           CASE WHEN count(c.ts) > 0
                THEN epoch_us(p.ts) - max(epoch_us(c.ts)) END AS last_gap_us
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY p.event_id
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-class service levels — conditional aggregation
# over the orders⋈lineitem join. The CASE sums ride the join's shuffle (no
# extra pass); lineitem is filtered to one year BEFORE the join so the
# probe side ships only matching rows, and each side is pruned to the 2-3
# columns used (ReadSchema stays narrow at 100 TB).
# ---------------------------------------------------------------------------
@query("r31_shipclass_priority_counts")
def r31_shipclass_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    year = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        year.join(orders.select("o_orderkey", "o_orderpriority"),
                  year.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


oracle(
    "r31_shipclass_priority_counts",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo-revenue share — a conditional-sum ratio over the
# part⋈lineitem join, lineitem pre-filtered to one month. Both the promo
# numerator and the total denominator accumulate in ONE aggregate over the
# same join (not two queries); sums are exact decimal so the ratio is
# engine-invariant. part scales with the corpus, so the join shuffles on
# partkey rather than forcing a broadcast that would OOM at 100 TB (AQE
# may still pick broadcast when the filtered side is small).
# ---------------------------------------------------------------------------
@query("r32_promo_revenue_share")
def r32_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li = tables(spark, sf_dir, "part", "lineitem")
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    joined = month.join(part.select("p_partkey", "p_type"),
                        month.l_partkey == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(
                F.lit(0).cast(DEC4))).cast("double")
            / F.sum(disc).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.round(F.sum(disc).cast("double"), 4).alias("total_revenue"),
    )


oracle(
    "r32_promo_revenue_share",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))
                 ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 6) AS promo_revenue_pct,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top-revenue supplier — a "view" of per-supplier quarterly
# revenue whose MAX is folded back as a broadcast scalar (1-row aggregate
# crossJoin), not a re-scan: the revenue relation is computed once, the max
# costs one extra tiny stage, and the equality filter is exact because
# revenue is a decimal sum. At 100 TB the revenue view is the only big
# shuffle (keyed on suppkey); everything after runs on ~one row per tie.
# ---------------------------------------------------------------------------
@query("r33_top_revenue_supplier")
def r33_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, li = tables(spark, sf_dir, "supplier", "lineitem")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(disc).alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 4).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


oracle(
    "r33_top_revenue_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_revenue AS DOUBLE), 4) AS total_revenue
    FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity-order revenue — the correlated per-part
# AVG subquery re-expressed as one groupBy on l_partkey joined back to the
# fact (same single-shuffle trick as r28's window min; here the aggregate
# relation is far smaller than the fact, so join-back beats a window over
# every lineitem row). The 0.2·avg threshold is computed in exact decimal
# so bracket membership is engine-invariant.
# ---------------------------------------------------------------------------
@query("r34_small_qty_order_revenue")
def r34_small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li = tables(spark, sf_dir, "part", "lineitem")
    brand = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    avg_qty = (
        li.groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_quantity").cast(DEC)) / F.count(F.lit(1)))
            .cast("decimal(18,6)")
            .alias("avg_qty")
        )
    )
    thresh = (F.lit(2).cast("decimal(2,1)") * F.col("avg_qty") / F.lit(10)).cast(
        "decimal(18,7)"
    )
    return (
        li.join(brand, li.l_partkey == brand.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity").cast(DEC) < thresh)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 4
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


oracle(
    "r34_small_qty_order_revenue",
    """
    WITH avg_qty AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*)
                  AS DECIMAL(18,6)) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 4) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#13'
    JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,2))
          < CAST(CAST(2 AS DECIMAL(2,1)) * a.avg_qty / 10 AS DECIMAL(18,7))
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier diversity per part attribute — COUNT(DISTINCT
# suppkey) grouped by (brand, type, size), with an excluded-supplier set
# (NOT IN → broadcast LEFT ANTI join: the exclusion list is tiny and
# corpus-independent, so anti-joining it before the distinct agg removes
# rows at scan parallelism). The distinct-count shuffles once on the group
# key with the suppkey carried for exact distinct (not approx).
# ---------------------------------------------------------------------------
@query("r35_supplier_diversity")
def r35_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, supp, li = tables(spark, sf_dir, "part", "supplier", "lineitem")
    excluded = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    eligible = li.select("l_partkey", "l_suppkey").join(
        F.broadcast(excluded),
        li.l_suppkey == excluded.s_suppkey,
        "left_anti",
    )
    sel = part.filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        eligible.join(sel, eligible.l_partkey == sel.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


oracle(
    "r35_supplier_diversity",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive bracket predicate (OR of AND-groups mixing
# part and lineitem attributes) — the classic "can't push the whole WHERE
# to either side" case. Spark extracts the per-side IN/range conjuncts it
# CAN push (partial predicate pushdown via CNF), joins on partkey, and
# evaluates the residual disjunction in whole-stage codegen — one pass, no
# per-branch union of three scans.
# ---------------------------------------------------------------------------
@query("r36_bracket_revenue")
def r36_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li = tables(spark, sf_dir, "part", "lineitem")
    j = li.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        part.select("p_partkey", "p_type", "p_size"),
        li.l_partkey == part.p_partkey,
    )
    brackets = (
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(11, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "SMALL") & F.col("p_size").between(26, 50)
           & (F.col("l_quantity") >= 20))
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    return j.filter(brackets).agg(
        F.round(F.sum(disc).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


oracle(
    "r36_bracket_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p_type = 'PROMO'   AND p_size BETWEEN 1  AND 10
           AND l_quantity BETWEEN 1  AND 20)
       OR (p_type = 'ECONOMY' AND p_size BETWEEN 11 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'SMALL'   AND p_size BETWEEN 26 AND 50
           AND l_quantity >= 20)
    """,
)



# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item top customers — the "find the problem
# accounts" report. lineitem is filtered to returns BEFORE its join (the
# only big shuffle is orders⋈lineitem on orderkey); customer attributes and
# nation ride broadcast joins; final top-20 is TakeOrderedAndProject on the
# aggregated (small) per-customer relation.
# ---------------------------------------------------------------------------
@query("r37_returned_item_customers")
def r37_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    returns = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    window_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    return (
        returns.join(window_orders, returns.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(disc).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


oracle(
    "r37_returned_item_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: cross-nation trade volume — supplier nation × customer
# nation pairs by ship year. Two independent dimension chains hang off the
# fact (supplier→nation broadcast on one side, orders→customer→nation on
# the other); the nation-pair predicate is evaluated AFTER both joins
# (either direction of the pair), and the only corpus-sized shuffles are
# the two fact equi-joins. Group-by is on tiny (pair, year) keys.
# ---------------------------------------------------------------------------
@query("r38_nation_pair_volume")
def r38_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    return (
        li.select(
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        )
        # supplier scales with the corpus — no forced broadcast; AQE
        # converts to broadcast when the actual size allows (nation, 25
        # rows, IS forced).
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(disc).cast("double"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


oracle(
    "r38_nation_pair_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: the pure scan-predicate revenue forecast — no join at
# all. Exists as the pushdown litmus: every predicate (date range,
# discount band, quantity cap) reaches the parquet scan as PushedFilters,
# the scan reads 4 columns, and the aggregate is a single map-side
# partial + 1-row final. If this plan ever grows a shuffle or a wide
# ReadSchema, filter/column pushdown regressed.
# ---------------------------------------------------------------------------
@query("r39_forecast_revenue")
def r39_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(DEC4)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


oracle(
    "r39_forecast_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: local supplier volume — the cyclic-join query. The
# customer→nation and supplier→nation arms must agree (c_nationkey =
# s_nationkey), which no star-join plan gives for free: we ride the fact
# table's existing join keys and apply the nation-equality as a residual
# predicate on the supplier join, so the cycle costs zero extra shuffles.
# Orders are date-filtered BEFORE the join (pushdown to its scan), and
# nation⋈region folds to a 25-row broadcast.
# ---------------------------------------------------------------------------
@query("r40_local_supplier_volume")
def r40_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation, region = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    asia = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        # supplier scales with the corpus — keyed join, with the Q5 cycle
        # (customer nation == supplier nation) as a residual predicate.
        .join(
            supp.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(disc).cast("double"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


oracle(
    "r40_local_supplier_volume",
    """
    SELECT n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share — a conditional-sum RATIO over a
# six-table join. Both the numerator (target nation's volume) and the
# denominator (all volume) come out of ONE aggregate over ONE joined
# relation; a naive translation computes two joined subqueries and merges.
# Part is filtered to its type before joining (AQE broadcasts the
# survivor side when small); order dates prune at the orders scan.
# ---------------------------------------------------------------------------
@query("r41_market_share")
def r41_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation, region, part = tables(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "nation", "region", "part",
    )
    cust_region = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), nation.n_regionkey == region.r_regionkey
                ).filter(F.col("r_name") == "ASIA")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    target_vol = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0).cast(DEC4)
    )
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount")
        .join(
            part.filter(F.col("p_type") == "ECONOMY").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


oracle(
    "r41_market_share",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))
                      ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(22,4))) AS DOUBLE), 6) AS mkt_share,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year. The driver's
# tables have no partsupp, so supply cost is modeled as 10% of the part's
# retail price per unit — the JOIN TOPOLOGY (fact ⋈ filtered part ⋈
# supplier ⋈ nation ⋈ orders, profit expression mixing columns from three
# tables) is the point, not the cost constant. The p_name LIKE filter
# cannot push below the join, so part is pre-filtered and the fact joins
# only survivors.
# ---------------------------------------------------------------------------
@query("r42_product_type_profit")
def r42_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, nation, part = tables(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC4)
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey",
                  "l_quantity", "l_extendedprice", "l_discount")
        .join(
            part.filter(F.col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supp.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit).cast("double"), 4).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


oracle(
    "r42_product_type_profit",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity
                 AS DECIMAL(22,4))) AS DOUBLE), 4) AS sum_profit,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: important-stock value share. partsupp doesn't exist in
# the driver's schema, so "value" is shipped lineitem value from the
# target nations' suppliers. The correlated scalar (total value × frac)
# is computed ONCE from the same aggregated relation and folded back as a
# broadcast — the per-part relation is aggregated exactly once, never
# re-scanned (same fold-back discipline as r33/Q15).
# ---------------------------------------------------------------------------
@query("r43_important_parts")
def r43_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation = tables(spark, sf_dir, "lineitem", "supplier", "nation")
    target_supp = supp.join(
        F.broadcast(
            nation.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        ),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(target_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("value_dec"))
    )
    # The 1-row total folds back as a broadcast nested-loop join: the
    # aggregation runs twice, but nothing is cached (a registry query
    # can't hand its cache handle to the caller — leak) and nothing is
    # collected driver-side; both passes are map-side-partial aggs.
    totals = per_part.agg((F.sum("value_dec") * F.lit(0.001)).alias("t"))
    return (
        per_part.join(F.broadcast(totals))
        .filter(F.col("value_dec") > F.col("t"))
        .select(
            "l_partkey",
            F.round(F.col("value_dec").cast("double"), 2).alias("value"),
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


oracle(
    "r43_important_parts",
    """
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY 1)
    SELECT l_partkey, round(CAST(value_dec AS DOUBLE), 2) AS value
    FROM val
    WHERE value_dec > (SELECT sum(value_dec) * 0.001 FROM val)
    ORDER BY value DESC, l_partkey
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept orders waiting — the textbook
# EXISTS + NOT EXISTS double self-join. Re-planned as TWO-LEVEL
# aggregation over the order's lineitems: per (order, supplier) fold the
# late flag, then per order count suppliers and late suppliers; the Q21
# condition (multi-supplier order, exactly one late supplier) becomes a
# post-aggregate filter. One explicit repartition on l_orderkey serves
# BOTH levels (hash(l_orderkey) clusters (l_orderkey, l_suppkey) too),
# so three correlated lineitem scans collapse to one shuffle — and no
# countDistinct, so no Expand tripling the shuffle either. "Late" =
# shipped >60 days after order date (no commit/receipt dates in schema).
# ---------------------------------------------------------------------------
@query("r44_waiting_suppliers")
def r44_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("is_late", late)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("supp_late"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).alias("n_late"),
            F.max(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        # post-aggregate relation is ≤ |supplier| rows — broadcast it into
        # the name lookup rather than shuffling supplier.
        .join(supp.select("s_suppkey", "s_name"),
              F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


oracle(
    "r44_waiting_suppliers",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
             max(CASE WHEN late THEN l_suppkey END) AS late_supp
      FROM flagged GROUP BY 1)
    SELECT s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)


# ---------------------------------------------------------------------------
# Sequential funnel over the events stream (extension): first view →
# first click within 24 h of it → first purchase within 24 h of that.
# Each stage is a per-user MIN over a progressively-filtered event set;
# every stage aggregates and joins on user_id, so after the first
# exchange the remaining stages reuse the same hash partitioning (no new
# shuffle key ever appears). Stage relations shrink monotonically —
# at scale the later joins are broadcastable and AQE converts them.
# ---------------------------------------------------------------------------
@query("r45_event_funnel")
def r45_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    ev = events.select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
        .orderBy("stage")
    )


oracle(
    "r45_event_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click'
        AND ts > t_view AND ts <= t_view + INTERVAL 24 HOUR
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase'
        AND ts > t_click AND ts <= t_click + INTERVAL 24 HOUR
      GROUP BY 1
    )
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL
    SELECT '2_click', count(*) FROM c
    UNION ALL
    SELECT '3_purchase', count(*) FROM p
    ORDER BY stage
    """,
)


# ---------------------------------------------------------------------------
# Cohort retention matrix (extension): users cohorted by the ISO week of
# their first event; cell (cohort, k) counts distinct users active k
# weeks later. One aggregation keys user_id, the join back to events
# reuses that partitioning, and the distinct collapses (user, cohort, k)
# before the final small aggregate — the standard two-level shrink that
# keeps the wide side to exactly two shuffles at any scale.
# ---------------------------------------------------------------------------
@query("r46_retention_cohorts")
def r46_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    ev = events.select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_ts")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_ts"))
                / 7
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


oracle(
    "r46_retention_cohorts",
    """
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_ts
      FROM events GROUP BY 1
    ), act AS (
      SELECT DISTINCT e.user_id,
             strftime(cohort_ts, '%Y-%m-%d') AS cohort_week,
             CAST(date_diff('day', cohort_ts, date_trunc('week', ts)) // 7
                  AS BIGINT) AS week_offset
      FROM events e JOIN first USING (user_id)
    )
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM act GROUP BY 1, 2 ORDER BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# CDC latest-state compaction (extension): collapse an append-only event
# log to one current row per key — the batch half of merge/upsert (the
# streaming half is foreachBatch upsert in streaming/pipelines.py). One
# hash aggregate folding max(struct(ts, id, payload…)): a single shuffle
# with map-side partial folding, vs the window row_number=1 formulation
# which sorts every partition. (ts, event_id) is a unique key, so the
# struct max is deterministic.
# ---------------------------------------------------------------------------
@query("r47_latest_state_compaction")
def r47_latest_state_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.history import latest_state

    (events,) = tables(spark, sf_dir, "events")
    out = latest_state(
        events, "user_id", ["ts", "event_id"], ["event_type", "value"]
    )
    return out.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.round("value", 6).alias("last_value"),
    ).orderBy("user_id")


oracle(
    "r47_latest_state_compaction",
    """
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           round(value, 6) AS last_value
    FROM (SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    ORDER BY user_id
    """,
)


# ---------------------------------------------------------------------------
# SCD2 state history via gaps-and-islands (extension): collapse each
# user's consecutive same-type event runs into [valid_from, valid_to)
# intervals, open-ended for the current state — the slowly-changing-
# dimension build. Change detection (lag), island numbering (running
# sum), and the valid_to lookup (lead over islands) all window on
# user_id, and the island aggregation clusters on a superset key — so
# the whole history builds on ONE exchange of the log.
# ---------------------------------------------------------------------------
@query("r48_scd2_history")
def r48_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mtg_vector_db_spark.operators.history import scd2_history

    (events,) = tables(spark, sf_dir, "events")
    return scd2_history(
        events, "user_id", ["ts", "event_id"], "event_type"
    ).orderBy("user_id", "valid_from")


oracle(
    "r48_scd2_history",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS changed
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *, sum(changed) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), runs AS (
      SELECT user_id, island, event_type,
             min(ts) AS valid_from, count(*) AS n_events
      FROM islands GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
             AS valid_to,
           n_events
    FROM runs
    ORDER BY user_id, valid_from
    """,
)


# ---------------------------------------------------------------------------
# Time-series resample + forward-fill (extension): regularize each user's
# irregular event stream onto an hourly grid, carrying the last observed
# value across gaps. The grid is GENERATED (sequence+explode from per-user
# bounds), never materialized as a dimension table; per-hour observation
# pick is a max(struct) fold; the fill is one last(ignorenulls) window.
# Everything keys user_id (the grid join adds the hour only as a
# secondary key), so data volume per stage is bounded by grid size, and
# skew follows user activity — AQE's skew-join handles a hot user.
# ---------------------------------------------------------------------------
@query("r49_hourly_ffill")
def r49_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    obs = (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id", hour.alias("hour_ts"))
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("s"))
        .select("user_id", "hour_ts", F.col("s.value").alias("v"))
    )
    bounds = events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_ts"
        ),
    )
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "hour_ts"], "left")
        .withColumn(
            "value_ffill", F.round(F.last("v", ignorenulls=True).over(wfill), 6)
        )
        .select("user_id", "hour_ts", "value_ffill")
        .orderBy("user_id", "hour_ts")
    )


oracle(
    "r49_hourly_ffill",
    """
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY 1
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds
    ), obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_ts, value AS v
      FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id, date_trunc('hour', ts)
              ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
    )
    SELECT g.user_id, g.hour_ts,
           round(last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour_ts
             ROWS UNBOUNDED PRECEDING), 6) AS value_ffill
    FROM grid g LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.hour_ts = o.hour_ts
    ORDER BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Mergeable-sketch hierarchical rollup (extension): per-nation HLL
# sketches of distinct customers, UNIONED up to region level without
# rescanning the base table — the only distinct-count pattern that
# re-aggregates at 100 TB (exact countDistinct can't merge across
# levels; sketches are the associative carrier). The exact count rides
# along for the oracle, and ``est_ok`` pins the sketch estimate to ≤5%
# relative error (Datasketches HLL is deterministic, and exact in
# sparse mode at oracle scale).
# ---------------------------------------------------------------------------
@query("r50_sketch_rollup")
def r50_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    per_nation = joined.groupBy("r_name", "n_name").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_n"),
    )
    return (
        per_nation.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
            # customers belong to exactly one nation, so the region-exact
            # count is the sum of nation-exact counts.
            F.sum("exact_n").alias("exact_customers"),
        )
        .select(
            "r_name",
            "n_nations",
            "exact_customers",
            (
                F.abs(F.col("est") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            ).alias("est_ok"),
        )
        .orderBy("r_name")
    )


oracle(
    "r50_sketch_rollup",
    """
    SELECT r_name,
           count(DISTINCT n_name) AS n_nations,
           count(DISTINCT c_custkey) AS exact_customers,
           true AS est_ok
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)


# ---------------------------------------------------------------------------
# Equi-width histogram (extension): 20 buckets over order value via
# width_bucket — a single map-side bucket assignment + one small
# aggregate, the O(n) histogram a dashboard runs over any fact table.
# ---------------------------------------------------------------------------
@query("r51_price_histogram")
def r51_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(20)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("bucket")
    )


oracle(
    "r51_price_histogram",
    """
    -- width_bucket(x, 0, 500000, 20) (DuckDB lacks the fn). Mirrors the
    -- full semantics incl. the overflow buckets: x < 0 -> 0, x >= 500000
    -- -> 21, so the comparison holds even if a driver snapshot ships
    -- totalprice outside [0, 500000).
    SELECT CAST(least(greatest(floor(o_totalprice / 25000.0) + 1, 0), 21) AS BIGINT)
             AS bucket,
           count(*) AS n_orders
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Trailing time-RANGE window (extension): per-nation daily revenue with a
# trailing-7-day rolling sum — the RANGE-frame (value-based, not
# row-based) window family. The fact aggregates to (nation, day) FIRST,
# so the window runs over the compacted series; frames stay DECIMAL end
# to end, making the rolling sums partitioning-invariant.
# ---------------------------------------------------------------------------
@query("r52_rolling_revenue")
def r52_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation = tables(spark, sf_dir, "orders", "customer", "nation")
    daily = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        # One explicit exchange on the nation serves BOTH the (nation, day)
        # aggregate (subset clustering) and the rolling window below.
        .repartition(F.col("n_name"))
        .groupBy("n_name", F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    )
    # RANGE frame over epoch-days: value-based, so gaps in the calendar
    # contribute nothing (a ROWS frame would silently span gaps).
    wr = (
        Window.partitionBy("n_name")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return (
        daily.select(
            "n_name",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            F.round(F.sum("rev_dec").over(wr).cast("double"), 2).alias("rev_7d"),
        )
        .orderBy("n_name", "day")
    )


oracle(
    "r52_rolling_revenue",
    """
    WITH daily AS (
      SELECT n_name, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2')
      GROUP BY 1, 2
    )
    SELECT n_name, strftime(day, '%Y-%m-%d') AS day,
           round(CAST(rev_dec AS DOUBLE), 2) AS revenue,
           round(CAST(sum(rev_dec) OVER (
             PARTITION BY n_name ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE), 2) AS rev_7d
    FROM daily ORDER BY n_name, day
    """,
)


# ---------------------------------------------------------------------------
# Pivot / crosstab (extension): order counts per year × priority as a
# wide table. The pivot values are DECLARED, not discovered — an
# unlisted-values pivot runs a full distinct scan before the real job,
# which is a silent second pass over the fact at scale.
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query("r53_priority_pivot")
def r53_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renamed = wide.select(
        "o_year",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
            for i, p in enumerate(_PRIORITIES)
        ],
    )
    return renamed.orderBy("o_year")


oracle(
    "r53_priority_pivot",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
           CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
           CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
           CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT)
             AS p4,
           CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Rank-family windows (extension): decile, percent_rank, and cume_dist
# of customer balances within each nation — the remaining window
# functions the engine hadn't exercised (row_number/lag/lead/rank appear
# elsewhere). One exchange on the partition key serves all three.
# ---------------------------------------------------------------------------
@query("r54_customer_balance_ranks")
def r54_customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation = tables(spark, sf_dir, "customer", "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(
            "n_name",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.ntile(10).over(w).alias("decile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("n_name", F.desc("acctbal"), "c_custkey")
    )


oracle(
    "r54_customer_balance_ranks",
    """
    SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal,
           CAST(ntile(10) OVER w AS INT) AS decile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2')
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC)
    ORDER BY n_name, acctbal DESC, c_custkey
    """,
)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (extension): merge a historical
# per-key aggregate with a new delta's aggregate WITHOUT rescanning
# history — union the two partial-aggregate relations and fold once.
# Works because (count, decimal-sum) are associative partials; this is
# the materialized-view refresh pattern that turns an O(history) daily
# job into O(delta). The oracle recomputes from scratch, pinning
# merge ≡ recompute.
# ---------------------------------------------------------------------------
@query("r55_incremental_agg_merge")
def r55_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    split = F.lit("2024-01-15")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("v_dec"),
        )

    hist = partial(events.filter(F.col("ts") < split))
    delta = partial(events.filter(F.col("ts") >= split))
    return (
        hist.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("v_dec").cast("double"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


oracle(
    "r55_incremental_agg_merge",
    """
    SELECT event_type, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT (U-family completion): customers active in BOTH
# 1996 and 1997, minus those who ever placed an 'F'-status order. Spark
# plans both set ops as aggregates + joins over the SAME o_custkey
# shuffle; the year filters push to the orders scan so each leg reads
# only its slice.
# ---------------------------------------------------------------------------
@query("r56_customer_set_ops")
def r56_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    failed = (
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    return (
        active(1996)
        .intersect(active(1997))
        .exceptAll(failed)
        .withColumnRenamed("o_custkey", "c_custkey")
        .orderBy("c_custkey")
    )


oracle(
    "r56_customer_set_ops",
    """
    SELECT o_custkey AS c_custkey FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Arbitrary GROUPING SETS (extension — completes the rollup/cube family,
# r14/r15): per-region, per-nation, and grand-total customer balance in
# ONE pass. Catalyst plans a single Expand + hash aggregate — one scan,
# not three union'd aggregations. SQL surface, like r19.
# ---------------------------------------------------------------------------
@query("r58_grouping_sets")
def r58_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    cust.createOrReplaceTempView("customer_v")
    nation.createOrReplaceTempView("nation_v")
    region.createOrReplaceTempView("region_v")
    return spark.sql(
        """
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               count(*) AS n_customers,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS total_balance
        FROM customer_v
        JOIN nation_v ON c_nationkey = n_nationkey
        JOIN region_v ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY region, nation
        """
    )


oracle(
    "r58_grouping_sets",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           count(*) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    ORDER BY region, nation
    """,
)


# ---------------------------------------------------------------------------
# Sessionized conversion rate (extension): session_window aggregation
# carrying a bool_or(purchase) flag, then conversion share by
# session-length bucket — the product-analytics composition of gap
# sessions (r17) and boolean aggregates (r68). Session assignment and
# the flag fold in ONE aggregate over the user-keyed exchange; the
# bucket rollup sees only session rows.
# ---------------------------------------------------------------------------
@query("r69_session_conversion")
def r69_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    sessions = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.bool_or(F.col("event_type") == "purchase").alias("converted"),
    )
    bucket = (
        F.when(F.col("n_events") <= 2, "1-2")
        .when(F.col("n_events") <= 5, "3-5")
        .otherwise("6+")
    )
    return (
        sessions.groupBy(bucket.alias("session_size"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.col("converted").cast("long")).alias("n_converted"),
        )
        .select(
            "session_size",
            "n_sessions",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_sessions"), 6).alias(
                "conversion_rate"
            ),
        )
        .orderBy("session_size")
    )


oracle(
    "r69_session_conversion",
    """
    WITH g AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), sess AS (
      SELECT user_id, sid, count(*) AS n_events,
             bool_or(event_type = 'purchase') AS converted
      FROM s GROUP BY 1, 2
    )
    SELECT CASE WHEN n_events <= 2 THEN '1-2'
                WHEN n_events <= 5 THEN '3-5' ELSE '6+' END AS session_size,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           round(sum(CASE WHEN converted THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS conversion_rate
    FROM sess GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Boolean aggregates (extension): bool_or / bool_and / count_if — the
# EXISTS-per-group duality. "Has any failed order" as bool_or folds
# map-side to one bit per group; the naive EXISTS formulation is a
# correlated semi-join per flag. One aggregate, four flags.
# ---------------------------------------------------------------------------
@query("r68_customer_order_flags")
def r68_customer_order_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_failed"),
            F.bool_and(F.col("o_totalprice") > 5000).alias("all_above_5k"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


oracle(
    "r68_customer_order_flags",
    """
    SELECT o_custkey,
           bool_or(o_orderstatus = 'F') AS any_failed,
           bool_and(o_totalprice > 5000) AS all_above_5k,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
             AS n_urgent,
           count(*) AS n_orders
    FROM orders WHERE o_custkey < 200
    GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Top-k per group via AGGREGATION (extension — the physical twin of
# r07's window formulation): fold each group to a k-slice of its sorted
# struct array inside the hash aggregate. The window path sorts every
# group's full partition; this path's map-side partial keeps only what
# it has seen, and for small k over huge groups the shuffled state is
# the partial arrays, not the rows. Same rows and ranks as r07 — the
# oracle is the window formulation, pinning the strategies equal.
# ---------------------------------------------------------------------------
@query("r67_topk_per_group_agg")
def r67_topk_per_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    # Sort key: price DESC then orderkey ASC ≡ ascending (-price, orderkey).
    item = F.struct(
        (-F.col("o_totalprice")).alias("neg_price"),
        F.col("o_orderkey").alias("o_orderkey"),
    )
    topk = F.slice(F.array_sort(F.collect_list(item)), 1, 2)
    return (
        orders.filter(F.col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(topk.alias("tk"))
        .select("o_custkey", F.posexplode("tk").alias("pos", "t"))
        .select(
            "o_custkey",
            F.col("t.o_orderkey").alias("o_orderkey"),
            (-F.col("t.neg_price")).alias("o_totalprice"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
        .orderBy("o_custkey", "rank")
    )


oracle(
    "r67_topk_per_group_agg",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders WHERE o_custkey < 100
    ) WHERE rank <= 2 ORDER BY o_custkey, rank
    """,
)


# ---------------------------------------------------------------------------
# Null-safe equality join (extension): SQL's `=` drops NULL keys
# silently — matching "unknown" groups requires IS NOT DISTINCT FROM
# (Spark `eqNullSafe`, planned as an ordinary hash join on a
# null-tolerant key). Nullable keys are derived deterministically
# (props.k % 5 == 0 → NULL), and the self-join counts per-key pair
# volume INCLUDING the NULL group a plain join would lose.
# ---------------------------------------------------------------------------
@query("r66_nullsafe_join")
def r66_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    keyed = events.select(
        "event_id",
        F.when(k % 5 == 0, F.lit(None)).otherwise(k % 5).alias("grp"),
    ).filter(F.col("event_id") < 2000)
    a = keyed.select(F.col("grp").alias("g_a"), F.col("event_id").alias("id_a"))
    b = keyed.select(F.col("grp").alias("g_b"), F.col("event_id").alias("id_b"))
    return (
        a.join(b, a.g_a.eqNullSafe(b.g_b))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(F.coalesce(F.col("g_a").cast("string"), F.lit("NULL")).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("grp")
    )


oracle(
    "r66_nullsafe_join",
    """
    WITH keyed AS (
      SELECT event_id,
             CASE WHEN CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                       AS BIGINT) % 5 = 0 THEN NULL
                  ELSE CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                       AS BIGINT) % 5 END AS grp
      FROM events WHERE event_id < 2000
    )
    SELECT coalesce(CAST(a.grp AS VARCHAR), 'NULL') AS grp,
           count(*) AS n_pairs
    FROM keyed a JOIN keyed b
      ON a.grp IS NOT DISTINCT FROM b.grp AND a.event_id < b.event_id
    GROUP BY 1 ORDER BY 1
    """,
)


# ---------------------------------------------------------------------------
# Referential-integrity audit (extension): orphan counts per FK
# relationship — the nightly constraint check a schema with unenforced
# FKs needs (SURVEY §1.2: Spark has no FK enforcement; this query IS
# the enforcement). Each relationship is a left-anti join; the child
# side ships only its FK column, and counts union into one report.
# ---------------------------------------------------------------------------
@query("r65_fk_integrity_audit")
def r65_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, emb, docs = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "embeddings", "documents"
    )

    def orphans(child: DataFrame, fk: str, parent: DataFrame, pk: str, rel: str):
        n = (
            child.select(fk)
            .join(parent.select(pk), child[fk] == parent[pk], "left_anti")
            .count()
        )
        total = child.count()
        return spark.range(1).select(
            F.lit(rel).alias("relationship"),
            F.lit(n).cast("long").alias("n_orphans"),
            F.lit(total).cast("long").alias("n_children"),
        )

    return (
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(orders, "o_custkey", cust, "c_custkey",
                             "orders->customer"))
        .unionByName(orphans(emb, "vec_id", docs, "doc_id",
                             "embeddings->documents"))
        .orderBy("relationship")
    )


oracle(
    "r65_fk_integrity_audit",
    """
    SELECT 'embeddings->documents' AS relationship,
           (SELECT count(*) FROM embeddings e
            WHERE NOT EXISTS (SELECT 1 FROM documents d
                              WHERE d.doc_id = e.vec_id)) AS n_orphans,
           (SELECT count(*) FROM embeddings) AS n_children
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    ORDER BY relationship
    """,
)


# ---------------------------------------------------------------------------
# Ratio-to-report window (extension): each customer's share of their
# nation's revenue — aggregate once, then a partition-total window over
# the compacted per-customer relation (window input is one row per
# customer, never the fact). Top-5 per nation by share.
# ---------------------------------------------------------------------------
@query("r63_revenue_share")
def r63_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation = tables(spark, sf_dir, "orders", "customer", "nation")
    per_cust = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    )
    wt = Window.partitionBy("n_name")
    wr = Window.partitionBy("n_name").orderBy(
        F.desc("rev_dec"), F.asc("c_custkey")
    )
    return (
        per_cust.withColumn(
            "share",
            F.round(
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(wt).cast("double"),
                6,
            ),
        )
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 5)
        .select(
            "n_name",
            "c_custkey",
            F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            "share",
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("n_name", "rk")
    )


oracle(
    "r63_revenue_share",
    """
    WITH per_cust AS (
      SELECT n_name, c_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2')
      GROUP BY 1, 2
    ), ranked AS (
      SELECT n_name, c_custkey,
             round(CAST(rev_dec AS DOUBLE), 2) AS revenue,
             round(CAST(rev_dec AS DOUBLE)
                   / CAST(sum(rev_dec) OVER (PARTITION BY n_name) AS DOUBLE),
                   6) AS share,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY rev_dec DESC, c_custkey ASC) AS rk
      FROM per_cust
    )
    SELECT n_name, c_custkey, revenue, share, rk
    FROM ranked WHERE rk <= 5 ORDER BY n_name, rk
    """,
)


# ---------------------------------------------------------------------------
# Year-over-year growth (extension): yearly revenue with lag-based YoY
# delta — the reporting staple. The lag runs over the tiny aggregated
# series (one row per year), revenue stays DECIMAL into the ratio.
# ---------------------------------------------------------------------------
@query("r64_yoy_growth")
def r64_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    yearly = orders.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec")
    )
    w = Window.orderBy("o_year")
    prev = F.lag("rev_dec").over(w)
    return (
        yearly.select(
            "o_year",
            F.round(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            F.round(
                (F.col("rev_dec").cast("double") - prev.cast("double"))
                / prev.cast("double"),
                6,
            ).alias("yoy_growth"),
        )
        .orderBy("o_year")
    )


oracle(
    "r64_yoy_growth",
    """
    WITH yearly AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY 1
    )
    SELECT o_year, round(CAST(rev_dec AS DOUBLE), 2) AS revenue,
           round((CAST(rev_dec AS DOUBLE)
                  - CAST(lag(rev_dec) OVER (ORDER BY o_year) AS DOUBLE))
                 / CAST(lag(rev_dec) OVER (ORDER BY o_year) AS DOUBLE), 6)
             AS yoy_growth
    FROM yearly ORDER BY o_year
    """,
)


# ---------------------------------------------------------------------------
# Sequence-pattern matching / CEP-lite (extension): Spark has no
# MATCH_RECOGNIZE, but per-key ordered journeys compress to a STRING of
# state initials (one aggregate), and sequence patterns become regexes
# over that string — pattern evaluation went from a stateful scan to a
# codegen'd rlike over one short row per user. Patterns: strict
# view→click→purchase (no purchase before the click), any-order
# converted, and bounce (error with no later purchase).
# ---------------------------------------------------------------------------
@query("r62_sequence_pattern")
def r62_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    initial = F.substring("event_type", 1, 1)
    journeys = (
        events.select("user_id", "ts", "event_id", initial.alias("i"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "i"))
                    ),
                    lambda x: x["i"],
                ),
                "",
            ).alias("journey")
        )
    )
    pats = {
        "strict_funnel": "v[^p]*c[^v]*p",
        "converted": "^.*p",
        "error_bounce": "e[^p]*$",
    }
    return journeys.select(
        *[
            F.sum(F.col("journey").rlike(p).cast("long")).alias(name)
            for name, p in pats.items()
        ],
        F.count(F.lit(1)).alias("n_users"),
    )


oracle(
    "r62_sequence_pattern",
    """
    WITH j AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS journey
      FROM events GROUP BY 1
    )
    SELECT CAST(sum(CASE WHEN regexp_matches(journey, 'v[^p]*c[^v]*p')
                    THEN 1 ELSE 0 END) AS BIGINT) AS strict_funnel,
           CAST(sum(CASE WHEN regexp_matches(journey, '^.*p')
                    THEN 1 ELSE 0 END) AS BIGINT) AS converted,
           CAST(sum(CASE WHEN regexp_matches(journey, 'e[^p]*$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS error_bounce,
           count(*) AS n_users
    FROM j
    """,
)


# ---------------------------------------------------------------------------
# Watermark-lateness audit (extension): per-user out-of-orderness of the
# event stream — lateness of each event vs the running event-time
# high-water mark in ARRIVAL order (event_id), bucketed by minute. This
# is the measurement that sizes `withWatermark`: pick the bucket whose
# cumulative share meets your completeness SLO. One user-keyed window,
# one small histogram aggregate.
# ---------------------------------------------------------------------------
@query("r61_lateness_audit")
def r61_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late_sec = F.greatest(
        F.lit(0.0),
        F.unix_micros(F.max("ts").over(w)) / 1e6 - F.unix_micros(F.col("ts")) / 1e6,
    )
    return (
        events.select("user_id", "event_id", "ts")
        .withColumn("late_min", F.floor(late_sec / 60).cast("long"))
        .groupBy("late_min")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("late_min")
        .limit(30)
    )


oracle(
    "r61_lateness_audit",
    """
    WITH lat AS (
      SELECT CAST(floor(greatest(0.0,
               epoch(max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS UNBOUNDED PRECEDING))
               - epoch(ts)) / 60) AS BIGINT) AS late_min
      FROM events
    )
    SELECT late_min, count(*) AS n_events
    FROM lat GROUP BY 1 ORDER BY 1 LIMIT 30
    """,
)


# ---------------------------------------------------------------------------
# Schema-declared JSON parse (SURVEY §1.2's preferred JSONB mapping):
# ``from_json`` with a DECLARED struct schema parses each props blob
# ONCE and yields typed fields — vs r12's per-field get_json_object,
# which re-parses the string for every field extracted. Same data, the
# scalable physical path for wide semi-structured payloads.
# ---------------------------------------------------------------------------
@query("r60_json_struct_parse")
def r60_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("p.k").cast("decimal(18,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


oracle(
    "r60_json_struct_parse",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                 AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / count(*), 6)
             AS avg_k
    FROM events
    WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
    GROUP BY event_type ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# Table-stats collection (extension): the ANALYZE job — per-column null
# count, min/max, and exact distinct count in ONE scan of the fact
# (count-distinct via one Expand aggregate; min/max/nulls fold
# map-side). These are the statistics a cost-based optimizer or data
# catalog refreshes nightly; at 100 TB you run it as a query, not a
# metadata command.
# ---------------------------------------------------------------------------
@query("r59_table_stats")
def r59_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.round(F.min(c), 2).alias(f"{c}_min"),
            F.round(F.max(c), 2).alias(f"{c}_max"),
            F.countDistinct(c).alias(f"{c}_ndv"),
        ]
    long_rows = li.agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )
    return long_rows


oracle(
    "r59_table_stats",
    """
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS l_quantity_nulls,
           round(min(l_quantity), 2) AS l_quantity_min,
           round(max(l_quantity), 2) AS l_quantity_max,
           count(DISTINCT l_quantity) AS l_quantity_ndv,
           CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS l_extendedprice_nulls,
           round(min(l_extendedprice), 2) AS l_extendedprice_min,
           round(max(l_extendedprice), 2) AS l_extendedprice_max,
           count(DISTINCT l_extendedprice) AS l_extendedprice_ndv,
           CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS l_discount_nulls,
           round(min(l_discount), 2) AS l_discount_min,
           round(max(l_discount), 2) AS l_discount_max,
           count(DISTINCT l_discount) AS l_discount_ndv
    FROM lineitem
    """,
)


# ---------------------------------------------------------------------------
# Per-group closed-form linear regression (extension): order-value trend
# per nation as slope/intercept/Pearson-r over (epoch-day, price). The
# sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are DECIMAL-exact —
# day is an integer, price is 2 dp, so every product is exact at fixed
# scale — which makes the whole regression partitioning-invariant: one
# map-side-combined aggregate per group, closed-form division at the
# end. This is how you fit millions of per-key models at 100 TB without
# MLlib: the model IS an algebraic aggregate.
# ---------------------------------------------------------------------------
@query("r57_price_trend_regression")
def r57_price_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation = tables(spark, sf_dir, "orders", "customer", "nation")
    x = F.unix_date(F.to_date("o_orderdate")).cast("decimal(28,2)")
    y = F.col("o_totalprice").cast("decimal(28,2)")
    stats = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("decimal(28,2)").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
            F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
            F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
        )
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return stats.select(
        "n_name",
        F.col("n").cast("long").alias("n_orders"),
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round((sy - (cov_n / var_x) * sx) / n, 4).alias("intercept"),
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("pearson_r"),
    ).orderBy("n_name")


oracle(
    "r57_price_trend_regression",
    """
    WITH s AS (
      SELECT n_name,
             CAST(count(*) AS DECIMAL(28,2)) AS n,
             sum(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS DECIMAL(28,2)))
               AS sx,
             sum(CAST(o_totalprice AS DECIMAL(28,2))) AS sy,
             sum(CAST(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS DECIMAL(28,2))
                      * CAST(o_totalprice AS DECIMAL(28,2))
                      AS DECIMAL(38,4))) AS sxy,
             sum(CAST(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS DECIMAL(28,2))
                      * CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS DECIMAL(28,2))
                      AS DECIMAL(38,4))) AS sxx,
             sum(CAST(CAST(o_totalprice AS DECIMAL(28,2))
                      * CAST(o_totalprice AS DECIMAL(28,2))
                      AS DECIMAL(38,4))) AS syy
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    )
    SELECT n_name, CAST(n AS BIGINT) AS n_orders,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS pearson_r
    FROM s ORDER BY n_name
    """,
)


# ---------------------------------------------------------------------------
# TPC-H Q20 adapted (no partsupp table in this corpus): suppliers whose
# 1995 share of all-time shipped quantity of red-named parts exceeds 1.5×
# the average supplier's 1995 share — the "excess stock movement" probe,
# completing the 22-query TPC-H decision-support surface. The absolute
# Q20 threshold (0.5·qty) can't bind when shipments spread over 7 years,
# so the cutoff is data-adaptive, Q11/Q15-style.
#
# Plan shape: part is filtered FIRST (LIKE on the 2k-row dim) and
# broadcast into the lineitem scan, so the fact table shuffles once, on
# l_suppkey, already reduced to the matching parts; the year split rides
# that single aggregate as conditional sums. The global average share is
# a one-row aggregate of the per-supplier aggregate, folded back as a
# broadcast scalar (r33's shape) — no driver collect. supplier⋈nation
# broadcast after the filter. At 100 TB: one fact shuffle keyed on
# suppkey (bounded cardinality), everything else broadcast.
# ---------------------------------------------------------------------------
@query("r70_excess_shipment_suppliers")
def r70_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supplier, nation = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    per_supp = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1995, F.col("l_quantity")).otherwise(
                    F.lit(0.0)
                )
            ).alias("qty_1995"),
            F.sum("l_quantity").alias("qty_total"),
        )
        .withColumn("share_raw", F.col("qty_1995") / F.col("qty_total"))
    )
    avg_share = per_supp.agg(F.avg("share_raw").alias("avg_share"))
    excess = per_supp.crossJoin(F.broadcast(avg_share)).filter(
        F.col("share_raw") > F.col("avg_share") * 1.5
    )
    return (
        excess.join(
            F.broadcast(supplier), excess.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "s_name",
            "n_name",
            F.round("qty_1995", 6).alias("qty_1995"),
            F.round("qty_total", 6).alias("qty_total"),
            F.round(F.col("qty_1995") / F.col("qty_total"), 6).alias("share_1995"),
        )
        .orderBy("s_name")
    )


oracle(
    "r70_excess_shipment_suppliers",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    per_supp AS (
      SELECT l_suppkey,
             sum(CASE WHEN year(l_shipdate) = 1995 THEN l_quantity ELSE 0 END)
               AS qty_1995,
             sum(l_quantity) AS qty_total
      FROM lineitem JOIN red ON l_partkey = p_partkey
      GROUP BY l_suppkey
    ),
    thresh AS (SELECT avg(qty_1995 / qty_total) * 1.5 AS t FROM per_supp)
    SELECT s_name, n_name,
           round(qty_1995, 6) AS qty_1995,
           round(qty_total, 6) AS qty_total,
           round(qty_1995 / qty_total, 6) AS share_1995
    FROM per_supp, thresh
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE qty_1995 / qty_total > thresh.t
    ORDER BY s_name
    """,
)


# ---------------------------------------------------------------------------
# Robust outlier detection (extension): per-nation median/MAD of customer
# balances and the count of |robust z| > 3 customers — the
# quantile-based anomaly screen that survives heavy tails where
# mean/stddev z-scores don't. Two nation-keyed exact-percentile
# aggregates (tiny outputs, broadcast back); deviations use the ROUNDED
# median so both engines derive identical doubles (r21's parity
# convention). At scale: two shuffles keyed on the bounded nation key.
# ---------------------------------------------------------------------------
@query("r71_balance_outliers")
def r71_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation = tables(spark, sf_dir, "customer", "nation")
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("n_name", "c_acctbal")
    med = cust.groupBy("n_name").agg(
        F.round(F.percentile(F.col("c_acctbal"), F.lit(0.5)), 4).alias("med")
    )
    dev = cust.join(F.broadcast(med), "n_name").withColumn(
        "d", F.abs(F.col("c_acctbal") - F.col("med"))
    )
    mad = dev.groupBy("n_name").agg(
        F.round(F.percentile(F.col("d"), F.lit(0.5)), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "n_name")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.max("med").alias("median_bal"),
            F.max("mad").alias("mad"),
            F.sum(
                (F.col("d") > 3 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("n_name")
    )


oracle(
    "r71_balance_outliers",
    """
    WITH cust AS (
      SELECT n_name, c_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    med AS (SELECT n_name, round(quantile_cont(c_acctbal, 0.5), 4) AS med
            FROM cust GROUP BY n_name),
    dev AS (SELECT cust.n_name, c_acctbal, med,
                   abs(c_acctbal - med) AS d
            FROM cust JOIN med USING (n_name)),
    mad AS (SELECT n_name, round(quantile_cont(d, 0.5), 4) AS mad
            FROM dev GROUP BY n_name)
    SELECT dev.n_name, count(*) AS n_customers,
           max(med) AS median_bal, max(mad.mad) AS mad,
           CAST(sum(CASE WHEN d > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (n_name)
    GROUP BY dev.n_name ORDER BY dev.n_name
    """,
)


# ---------------------------------------------------------------------------
# R72: wide→long reshape (UNPIVOT/melt — the inverse of r53's pivot).
# A reporting layer flips per-nation metric columns into (metric, value)
# rows for generic downstream charting; Spark's native ``unpivot`` keeps
# it a zero-shuffle projection over the aggregated input.
# ---------------------------------------------------------------------------
@query("r72_unpivot_metrics")
def r72_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation = tables(spark, sf_dir, "customer", "nation")
    # Integer-cents money math (see r05): exact sums, and average ties
    # land on representable .5 halves that both engines round the same.
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    wide = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            F.round(F.sum(cents).cast("double") / 100, 2).alias(
                "total_balance"
            ),
            F.round(
                F.round(F.sum(cents).cast("double") / F.count(F.lit(1)))
                / 100,
                2,
            ).alias("avg_balance"),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["n_customers", "total_balance", "avg_balance"],
        "metric",
        "value",
    ).orderBy("n_name", "metric")


oracle(
    "r72_unpivot_metrics",
    """
    WITH wide AS (
      SELECT n_name,
             CAST(count(*) AS DOUBLE) AS n_customers,
             round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS DOUBLE) / 100, 2) AS total_balance,
             round(round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                              AS DOUBLE) / count(*)) / 100, 2) AS avg_balance
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (n_customers, total_balance, avg_balance))
    ORDER BY n_name, metric
    """,
)


# ---------------------------------------------------------------------------
# R73: market-basket affinity — support / confidence / lift for part
# pairs co-purchased in one order. The pair generator is a self-join on
# l_orderkey, whose blow-up is bounded by lines-per-order² (≤ 7² in
# TPC-H) — a per-key constant, so the join scales linearly in orders;
# the per-part counts join is a plain shuffled equi-join on partkey.
# ---------------------------------------------------------------------------
@query("r73_part_affinity")
def r73_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    part_cnt = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b")
    )
    no = F.col("n_orders").cast("double")
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.round(F.col("pair_cnt") / no, 6).alias("support"),
            F.round(F.col("pair_cnt") / F.col("cnt_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("pair_cnt") * no / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


oracle(
    "r73_part_affinity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    pc AS (SELECT l_partkey, count(*) AS cnt FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS pair_cnt
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT part_a, part_b, pair_cnt,
           round(pair_cnt * 1.0 / n_orders, 6) AS support,
           round(pair_cnt * 1.0 / ca.cnt, 6) AS confidence,
           round(pair_cnt * CAST(n_orders AS DOUBLE) / (ca.cnt * cb.cnt), 6)
             AS lift
    FROM pairs
    JOIN pc ca ON pairs.part_a = ca.l_partkey
    JOIN pc cb ON pairs.part_b = cb.l_partkey
    CROSS JOIN n
    ORDER BY lift DESC, part_a ASC, part_b ASC LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# R74: correlated LATERAL subquery — top-2 orders for each of the top-5
# customers by balance, written as SQL LATERAL (the remaining ANSI join
# surface after r07's window formulation of the same idea). Catalyst
# decorrelates it into a broadcast join over the 5-row driver side +
# per-key limit — no nested-loop re-execution per outer row.
# ---------------------------------------------------------------------------
@query("r74_lateral_topn")
def r74_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    customer.createOrReplaceTempView("r74_customer")
    orders.createOrReplaceTempView("r74_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM (SELECT c_custkey, c_name FROM r74_customer
              ORDER BY c_acctbal DESC, c_custkey LIMIT 5) c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM r74_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


oracle(
    "r74_lateral_topn",
    """
    SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
    FROM (SELECT c_custkey, c_name FROM customer
          ORDER BY c_acctbal DESC, c_custkey LIMIT 5) c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
)


# ---------------------------------------------------------------------------
# R75: event debounce — drop repeat (user, event_type) events arriving
# within one hour of the previous raw event of that key (lag-based
# debounce, the standard instrumentation-noise cleanup before
# sessionization/funnels; the threshold is sized to this fixture's
# inter-arrival scale — production uses seconds). One window shuffle
# keyed (user_id, event_type); emits the per-type kept/dropped tally.
# ---------------------------------------------------------------------------
@query("r75_event_debounce")
def r75_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    prev = F.lag("ts").over(w)
    # Microsecond-exact integers in BOTH engines (cast-to-seconds would
    # truncate in Spark while DuckDB's epoch() keeps the fraction — a
    # tie-boundary divergence waiting for the right gap to surface).
    kept = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev)
            > 3600 * 1_000_000
        ),
        1,
    ).otherwise(0)
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("k", kept)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("k")).alias("n_debounced"),
            F.round(
                (F.count(F.lit(1)) - F.sum("k")) / F.count(F.lit(1)), 6
            ).alias("debounce_rate"),
        )
        .orderBy("event_type")
    )


oracle(
    "r75_event_debounce",
    """
    WITH lagged AS (
      SELECT event_type,
             CASE WHEN lag(ts) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) > CAST(3600 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS k
      FROM events
    )
    SELECT event_type, count(*) AS n_events,
           CAST(sum(k) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(k) AS BIGINT) AS n_debounced,
           round((count(*) - sum(k)) * 1.0 / count(*), 6) AS debounce_rate
    FROM lagged GROUP BY event_type ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# R76: VARIANT semi-structured access — the Spark 4 native form of the
# r60 JSON path: ``parse_json`` once into a VARIANT column, typed
# ``variant_get`` extraction after (open-schema ingestion where
# from_json's declared struct would force migrations). Same one-scan
# aggregate shape; the oracle reads the identical paths with DuckDB's
# JSON extraction.
# ---------------------------------------------------------------------------
@query("r76_variant_props")
def r76_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("k").isNotNull()).cast("long")).alias("n_with_k"),
            F.round(
                F.sum("k").cast("double") / F.sum(
                    (F.col("k").isNotNull()).cast("long")
                ),
                6,
            ).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


oracle(
    "r76_variant_props",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
           round(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                      AS DOUBLE)
                 / sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                        THEN 1 ELSE 0 END), 6) AS avg_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# R77: event-transition profile — per-user Markov bigrams (previous
# event type → next) with transition probabilities, the path-analysis
# view between r45's fixed funnel and r62's exact pattern match. One
# lag window per user, then a count reduce; probabilities are exact
# integer ratios.
# ---------------------------------------------------------------------------
@query("r77_event_transitions")
def r77_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    trans = (
        events.select(
            prev.alias("from_type"), F.col("event_type").alias("to_type")
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return (
        trans.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(tot), 6)
        )
        .orderBy("from_type", "to_type")
    )


oracle(
    "r77_event_transitions",
    """
    WITH t AS (
      SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
      FROM events
    ),
    c AS (SELECT from_type, to_type, count(*) AS n
          FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c ORDER BY from_type, to_type
    """,
)


# ---------------------------------------------------------------------------
# Per-group log-linear quantile sketch (extension) — the DDSketch idea
# (relative-error quantiles from log-spaced bins, mergeable by bin-count
# ADD) built from PURE INTEGER BIT ARITHMETIC so both engines bin
# identically: price in exact cents, bin key = (bit_length e, top-4
# bits), i.e. gamma = 2^(1/8) ≈ 9% relative error. No ln() near a bin
# boundary, no float binning at all — the engine-tie discipline applied
# to a sketch. At 100 TB this replaces the exact-quantile full sort
# (r21) with one map-side-combinable bin count (≤ ~500 bins/group) and
# a driver-free rank walk; shard sketches merge by summing bin counts.
# The exact rank-based quantiles ride along as the accuracy report,
# with estimates within the gamma bound asserted per row.
# ---------------------------------------------------------------------------
@query("r78_logbin_quantiles")
def r78_logbin_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (li,) = tables(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    binned = (
        li.select(
            F.col("l_returnflag").alias("flag"), cents.alias("cents")
        )
        .select(
            "flag",
            "cents",
            (F.length(F.bin(F.col("cents"))) - 1).alias("e"),
        )
        .select(
            "flag",
            "cents",
            "e",
            F.expr(
                "CAST(floor(cents / power(2, greatest(e - 3, 0)))"
                " AS BIGINT)"
            ).alias("top4"),
        )
    )
    # bucket bounds in cents: [top4 << (e-3), (top4+1) << (e-3))
    lo = F.expr("top4 * power(2, greatest(e - 3, 0))")
    hi = F.expr("(top4 + 1) * power(2, greatest(e - 3, 0))")
    sketch = (
        binned.groupBy("flag", "e", "top4")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "flag", "e", "top4", "cnt", lo.alias("lo"), hi.alias("hi")
        )
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("e", "top4")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(
        "flag", "e", "top4", "lo", "hi",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("flag")).alias("n"),
    )
    # estimate = bucket midpoint of the bucket containing rank ceil(q·n).
    # Round 8 (§2.4): all three quantiles come from ONE conditional
    # aggregation over cum — the previous per-q filter+groupBy branches
    # re-evaluated the sketch chain 3× and joined the results back;
    # min(CASE WHEN cum >= rank THEN lo END) over the full group is the
    # identical value (lo/hi strictly monotone in the (e, top4) order,
    # rank ≤ n so the qualifying set is never empty).
    est_cols = []
    for q, qname in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        qual = F.col("cum") >= rank
        est_cols.append(
            F.round(
                (
                    F.min(F.when(qual, F.col("lo")))
                    + F.min(F.when(qual, F.col("hi")))
                )
                / 200.0,
                4,
            ).alias(f"{qname}_est")
        )
    est = cum.groupBy("flag").agg(F.max("n").alias("n"), *est_cols)
    # exact rank-based quantiles (the comparison report)
    wrn = Window.partitionBy("flag").orderBy("cents")
    ranked = binned.select(
        "flag", "cents", F.row_number().over(wrn).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("flag")).alias("n"),
    )
    # Same one-pass conditional-aggregation rewrite for the exact arm:
    # the 600k-row rank window used to be re-evaluated by each of the
    # three filter+groupBy branches (window results are not exchange-
    # reusable subtrees); min(CASE WHEN rn >= rank THEN cents END) is
    # the identical first-qualifying value per flag.
    exact_cols = []
    for q, qname in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        exact_cols.append(
            F.round(
                F.min(F.when(F.col("rn") >= rank, F.col("cents"))) / 100.0,
                2,
            ).alias(f"{qname}_exact")
        )
    exacts = ranked.groupBy("flag").agg(*exact_cols)
    return (
        est.join(exacts, "flag")
        .select(
            "flag", "n",
            "p50_est", "p50_exact",
            "p95_est", "p95_exact",
            "p99_est", "p99_exact",
        )
        .orderBy("flag")
    )


oracle(
    "r78_logbin_quantiles",
    """
    WITH b AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             length(bin(CAST(round(l_extendedprice * 100) AS BIGINT))) - 1
               AS e
      FROM lineitem
    ),
    binned AS (
      SELECT flag, cents, e,
             CAST(floor(cents / power(2, greatest(e - 3, 0))) AS BIGINT)
               AS top4
      FROM b
    ),
    sketch AS (
      SELECT flag, e, top4, count(*) AS cnt,
             top4 * power(2, greatest(e - 3, 0)) AS lo,
             (top4 + 1) * power(2, greatest(e - 3, 0)) AS hi
      FROM binned GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT flag, e, top4, lo, hi,
             sum(cnt) OVER (PARTITION BY flag ORDER BY e, top4
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY flag) AS n
      FROM sketch
    ),
    est AS (
      SELECT flag, CAST(max(n) AS BIGINT) AS n,
             round((min(CASE WHEN cum >= ceil(0.5 * n) THEN lo END)
                    + min(CASE WHEN cum >= ceil(0.5 * n) THEN hi END))
                   / 200.0, 4) AS p50_est,
             round((min(CASE WHEN cum >= ceil(0.95 * n) THEN lo END)
                    + min(CASE WHEN cum >= ceil(0.95 * n) THEN hi END))
                   / 200.0, 4) AS p95_est,
             round((min(CASE WHEN cum >= ceil(0.99 * n) THEN lo END)
                    + min(CASE WHEN cum >= ceil(0.99 * n) THEN hi END))
                   / 200.0, 4) AS p99_est
      FROM cum GROUP BY flag
    ),
    ranked AS (
      SELECT flag, cents,
             row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY flag) AS n
      FROM binned
    ),
    ex AS (
      SELECT flag,
             round(min(CASE WHEN rn >= ceil(0.5 * n) THEN cents END)
                   / 100.0, 2) AS p50_exact,
             round(min(CASE WHEN rn >= ceil(0.95 * n) THEN cents END)
                   / 100.0, 2) AS p95_exact,
             round(min(CASE WHEN rn >= ceil(0.99 * n) THEN cents END)
                   / 100.0, 2) AS p99_exact
      FROM ranked GROUP BY flag
    )
    SELECT flag, n, p50_est, p50_exact, p95_est, p95_exact,
           p99_est, p99_exact
    FROM est JOIN ex USING (flag) ORDER BY flag
    """,
)


# ---------------------------------------------------------------------------
# R79 (extension): weighted median — the quantity-weighted median unit
# price per return flag (revenue analytics weight rows by volume; the
# plain median over-counts one-unit lines). Closed form: order by
# integer cents, running weight sum, report the first value whose
# doubled cumulative weight reaches the total. All integer comparisons
# (cents, long weights), and the crossing VALUE is invariant to
# intra-tie partition order even though per-row cumsums are not — the
# crossing stays inside a tied run for any order, so min(cents) over
# crossing rows is deterministic in both engines.
# ---------------------------------------------------------------------------
@query("r79_weighted_median_price")
def r79_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (li,) = tables(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("flag")
    cumd = base.select(
        "flag",
        "cents",
        F.sum("qty").over(wcum).alias("cum"),
        F.sum("qty").over(wall).alias("tot"),
    )
    crossing = (
        cumd.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("flag")
        .agg(F.min("cents").alias("med_cents"))
    )
    stats = base.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").alias("total_qty"),
    )
    return (
        stats.join(crossing, "flag")
        .select(
            "flag",
            "n_rows",
            "total_qty",
            F.round(F.col("med_cents") / 100.0, 2).alias(
                "weighted_median_price"
            ),
        )
        .orderBy("flag")
    )


oracle(
    "r79_weighted_median_price",
    """
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    c AS (
      SELECT flag, cents,
             sum(qty) OVER (PARTITION BY flag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(qty) OVER (PARTITION BY flag) AS tot
      FROM base
    ),
    crossing AS (
      SELECT flag, CAST(min(cents) AS BIGINT) AS med_cents FROM c
      WHERE cum * 2 >= tot GROUP BY flag
    ),
    stats AS (
      SELECT flag, count(*) AS n_rows,
             CAST(sum(qty) AS BIGINT) AS total_qty
      FROM base GROUP BY flag
    )
    SELECT stats.flag, stats.n_rows, stats.total_qty,
           round(crossing.med_cents / 100.0, 2) AS weighted_median_price
    FROM stats JOIN crossing USING (flag) ORDER BY stats.flag
    """,
)


# ---------------------------------------------------------------------------
# R80 (round-8 VERDICT #8): SKEWED-JOIN DIAGNOSTIC — the round-7 AQE
# skew-split experiment (SCALE.md "AQE skew-split, demonstrated
# end-to-end") surfaced as a registered query so its evidence stays
# machine-checked round over round instead of living in prose. The
# planted workload: every 5th lineitem collapses onto hot key 0 (a 20%
# hot key), the rest spread uniformly over 997 keys; the fact joins a
# 997-row keyed dim derived from supplier (forced shuffle join in the
# plan test). The ANSWER is the per-reduce-bucket distribution the
# skew remedy has to survive: rows, distinct keys, and the largest
# single key's share per pmod(k, 8) bucket (pmod, not Murmur3 — the
# bucket proxy must be SQL-replayable). Bucket 0's hot_share ≈ 0.62
# IS the skew; AQE's runtime split of exactly that reducer is
# plan-asserted (SortMergeJoin(skew=true), AQEShuffleRead skewed) in
# tests/test_partitioning.py::test_r80_skew_diagnostic_plan_splits,
# with the veto/remedy taxonomy documented at
# test_aqe_splits_planted_hot_key.
# ---------------------------------------------------------------------------
def _r80_fact_dim(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The planted 20%-hot-key fact and its keyed dim — shared between
    the registered diagnostic (answer) and the plan test (the join-ONLY
    shape, where OptimizeSkewedJoin is free to split; the registered
    query's own downstream groupBy(k) is the documented veto case,
    which is exactly why its remedy is data-level diagnosis, not AQE)."""
    (li, sup) = tables(spark, sf_dir, "lineitem", "supplier")
    # The payload carries real per-row entropy (price, orderkey): skew
    # DETECTION is byte-based, and a hot partition whose rows are
    # mostly the constant key would LZ4 below the factor-over-median
    # bar even at 3x the rows (measured while building the r80 plan
    # test — compression can hide row skew from AQE).
    fact = li.select(
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey") % 997)
        .cast("long")
        .alias("k"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_orderkey").alias("okey"),
    )
    # s_suppkey starts at 0 in this testdata, so the plain modulus
    # covers the planted hot key 0 (and pmod ≡ % on the non-negative
    # domain — no engine divergence on negatives to dodge).
    dim = (
        sup.select(F.pmod(F.col("s_suppkey"), F.lit(997)).alias("k"))
        .distinct()
    )
    return fact, dim


@query("r80_skew_join_diagnostic")
def r80_skew_join_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, dim = _r80_fact_dim(spark, sf_dir)
    joined = fact.join(dim, "k")
    per_key = joined.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("qty").cast("long")).alias("sum_qty"),
    )
    return (
        per_key.groupBy(F.pmod(F.col("k"), F.lit(8)).alias("bucket"))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("sum_qty").alias("sum_qty"),
            F.round(
                F.max("n_rows") / F.sum("n_rows"), 6
            ).alias("hot_share"),
        )
        .orderBy("bucket")
    )


oracle(
    "r80_skew_join_diagnostic",
    """
    WITH fact AS (
      SELECT CAST(CASE WHEN l_orderkey % 5 = 0 THEN 0
                       ELSE l_orderkey % 997 END AS BIGINT) AS k,
             l_quantity AS qty
      FROM lineitem
    ),
    dim AS (SELECT DISTINCT s_suppkey % 997 AS k FROM supplier),
    per_key AS (
      SELECT f.k, count(*) AS n_rows,
             CAST(sum(CAST(qty AS BIGINT)) AS BIGINT) AS sum_qty
      FROM fact f JOIN dim USING (k)
      GROUP BY f.k
    )
    SELECT CAST(k % 8 AS BIGINT) AS bucket,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           count(*) AS n_keys,
           CAST(sum(sum_qty) AS BIGINT) AS sum_qty,
           round(CAST(max(n_rows) AS DOUBLE) / sum(n_rows), 6)
             AS hot_share
    FROM per_key
    GROUP BY 1 ORDER BY bucket
    """,
)
