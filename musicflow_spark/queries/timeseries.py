"""Temporal-join queries (ext): as-of join and bucketed range join
over the events + orders tables — the two joins every event-stream /
market-data pipeline needs and Spark has no built-in for.

Both oracles are genuinely independent implementations: DuckDB's
native ``ASOF LEFT JOIN`` checks the union-merge window shape, and a
plain theta-join checks the bucketed range join — so the hash-match
proves the *decomposition* (union+window, explode+equi-join) computes
the textbook semantics, not that two copies of the same plan agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from musicflow_spark.operators.timejoin import (
    US_PER_DAY,
    asof_join,
    days_between,
    range_join_bucketed,
)
from musicflow_spark.queries.registry import Query
from musicflow_spark.sources.catalog import read_table

WINDOW_DAYS = 7


def _orders_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One order per (custkey, orderdate) — max orderkey wins.  The
    as-of tie rule ("latest right row in scan order") is not
    deterministic under duplicate (key, ts), so the dedup is part of
    the query contract on BOTH engines."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )


def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ext): every event matched to the customer's latest
    order at-or-before the event timestamp — union-merge window shape
    (operators/timejoin.py::asof_join), one hash shuffle on user_id,
    left-outer semantics for users with no prior order."""
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    matched = asof_join(
        events,
        _orders_deduped(spark, sf_dir),
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
    )
    return matched.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("order_price"),
        F.when(
            F.col("o_orderkey").isNotNull(),
            days_between(matched, "ts", "o_orderdate"),
        ).alias("days_since_order"),
    )


EVENTS_ASOF_ORDER_SQL = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1)
SELECT e.event_id, e.user_id,
       o.o_orderkey  AS order_key,
       o.o_totalprice AS order_price,
       CASE WHEN o.o_orderkey IS NULL THEN NULL
            ELSE (epoch_us(e.ts) - epoch_us(o.o_orderdate)) // 86400000000
       END AS days_since_order
FROM events e ASOF LEFT JOIN o1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def order_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (ext): events falling in each order's
    [orderdate, orderdate + 7d) window, aggregated per order —
    explode-over-day-buckets equi-join
    (operators/timejoin.py::range_join_bucketed), then the usual
    integer-cents order-invariant sum.  Orders with no events keep a
    zero row (left semantics via the post-agg join, so the hot path
    stays inner)."""
    orders = read_table(spark, sf_dir, "orders")
    events = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    iv = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr(f"INTERVAL {WINDOW_DAYS} DAYS")).alias("__hi__"),
    )
    joined = range_join_bucketed(
        events,
        iv,
        point_key="user_id",
        interval_key="o_custkey",
        point_ts="ts",
        interval_lo="o_orderdate",
        interval_hi="__hi__",
        bucket_us=US_PER_DAY,
    )
    per_order = joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
    )
    return (
        orders.select("o_orderkey")
        .join(per_order, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
        )
    )


ORDER_EVENT_WINDOW_SQL = f"""
SELECT o.o_orderkey,
       count(e.user_id) AS n_events,
       coalesce(sum(cast(round(e.value * 100) AS bigint)), 0) AS value_cents
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL {WINDOW_DAYS} DAY
GROUP BY o.o_orderkey
"""


QUERIES = [
    Query(
        "events_asof_order",
        "ext: as-of join (union-merge window)",
        events_asof_order,
        EVENTS_ASOF_ORDER_SQL,
        bench=True,
    ),
    Query(
        "order_event_window",
        "ext: bucketed range join (point-in-interval)",
        order_event_window,
        ORDER_EVENT_WINDOW_SQL,
        bench=True,
    ),
]
