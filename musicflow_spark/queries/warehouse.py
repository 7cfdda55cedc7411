"""Warehouse-scale operator queries (ext): the maintenance and
hygiene operations a 100 TB deployment runs that the reference's
full-refresh dbt project sidesteps at its data size — each registered
with a full DuckDB oracle.

- skew-salted aggregation / join (`operators/skew.py`) proven
  value-equal to the direct plan — the oracle IS the direct SQL, so a
  green row certifies the rewrite, not a reimplementation;
- CUBE / grouping-sets OLAP summary (reference analogue: the Tableau
  rollup marts, `dbt/models/marts/log_for_tableau.sql` slicing by
  status × kind);
- frame-bounded window stats (moving / cumulative) over the daily
  spine;
- SCD Type-2 snapshot merge (`operators/scd.py`) — dbt-snapshot
  semantics for dimension history;
- incremental rollup maintenance (`operators/scd.py::
  merge_partial_rollups`) — partial-aggregate merge proven equal to
  full recompute.

All measures ride as integer cents (`round(x*100)::long`) so every
hash compare is order-insensitive-exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from musicflow_spark.operators.dedup import portable_hash60
from musicflow_spark.operators.scd import (
    merge_partial_rollups,
    scd2_init,
    scd2_merge,
    snapshot_diff,
)
from musicflow_spark.operators.skew import salted_join, salted_sum_count
from musicflow_spark.queries.registry import Query
from musicflow_spark.sources.catalog import read_table


def _cents(col: str) -> Column:
    return F.round(F.col(col) * 100, 0).cast("long")


# ------------------------------------------------- skew-salted aggregation
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py:29) registered
    against the DIRECT group-by as its oracle: the hash-match proves
    sum/count re-aggregation over (key, salt) partials loses nothing.
    The extra exchange carries one row per key per salt."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", _cents("l_quantity").alias("qty_cents")
    )
    return salted_sum_count(
        li, ["l_returnflag", "l_linestatus"], "qty_cents", n_salts=16
    )


SKEW_SALTED_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(cast(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       count(*) AS cnt
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- skew-salted join
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted hot-key join (operators/skew.py:66) vs the plain join as
    oracle.  min_share is set low enough that real keys cross the
    hot threshold at every test SF, so BOTH branches (salted hot path,
    bare-key tail) carry rows and the union is exercised end to end."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        _cents("l_extendedprice").alias("price_cents"),
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "okey", n_salts=8, hot=None, how="inner")
    return joined.groupBy("o_orderpriority").agg(
        F.sum("price_cents").alias("sum_price_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SKEW_SALTED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ------------------------------------------------- skew-safe top-k
def skew_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted top-k (operators/skew.py::salted_topk) vs the
    direct window as oracle: per-key top-10 lineitems by price over
    (l_returnflag, l_linestatus) — 4 hot keys each holding ~1/4 of the
    fact table, exactly the shape where a direct
    row_number window sorts millions of rows in one task at 100 TB.
    The salted form bounds any task's sort to ~1/16 of a key; the
    hash-green row proves the two-phase rewrite emits the identical
    ranking.  Integer-cents ordering + the full line tiebreak chain
    ((l_orderkey, l_linenumber) alone is NOT unique in this fixture)
    make the order total, so the ranking is engine-portable."""
    from musicflow_spark.operators.skew import salted_topk

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus",
        _cents("l_extendedprice").alias("price_cents"),
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    )
    out = salted_topk(
        li,
        keys=["l_returnflag", "l_linestatus"],
        order_cols=[
            F.desc("price_cents"), F.asc("l_orderkey"), F.asc("l_linenumber"),
            F.asc("l_partkey"), F.asc("l_suppkey"),
        ],
        k=10,
        n_salts=16,
    )
    return out.select(
        "l_returnflag", "l_linestatus", "price_cents",
        "l_orderkey", "l_linenumber", "rank",
    )


SKEW_SALTED_TOPK_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
       l_orderkey, l_linenumber, rank
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY l_returnflag, l_linestatus
           ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
                    l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rank
  FROM lineitem)
WHERE rank <= 10
"""


# ------------------------------------------------- CUBE / grouping sets
def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over priority × status with grouping_id — all four
    slice levels in ONE pass (Spark expands grouping sets map-side;
    a 100 TB scan serves every rollup level at once instead of four
    scans)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", _cents("o_totalprice").alias("price_cents")
    )
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_cents").alias("sum_price_cents"),
    )


ORDER_STATUS_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       cast(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ------------------------------------------------- frame-bounded windows
def daily_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-frame window stats over the daily series: 7-day moving
    sum (ROWS BETWEEN 6 PRECEDING) and running cumulative count.  The
    global-ordered window runs on the DAY-grain aggregate (one row per
    day — dozens of rows where the raw table has billions), which is
    why the single-partition sort is by construction safe; the raw
    scan aggregates with an ordinary keyed shuffle first."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("value_cents"),
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_events",
        "value_cents",
        F.sum("value_cents").over(w7).alias("mov7_value_cents"),
        F.sum("n_events").over(wcum).alias("cum_events"),
    )


DAILY_MOVING_STATS_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         count(*) AS n_events,
         CAST(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1)
SELECT day, n_events, value_cents,
       CAST(sum(value_cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS mov7_value_cents,
       CAST(sum(n_events) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_events
FROM daily
"""


# ------------------------------------------------- SCD Type-2 merge
def _customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _cents("c_acctbal").alias("bal_cents"),
        "c_mktsegment",
    )


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history after one update batch
    (operators/scd.py::scd2_merge).  The batch is derived
    deterministically from the table itself via the portable 60-bit
    hash: bucket<3 → balance +500 cents (real change ⇒ close+reopen),
    bucket 3–4 → identical values (no-op ⇒ must NOT version), others
    absent from the batch (untouched).  The oracle replays the same
    merge in SQL, so the hash-match certifies the set algebra."""
    dim = _customer_dim(spark, sf_dir)
    history = scd2_init(dim, batch_id=0)
    bucket = portable_hash60(F.col("c_custkey").cast("string")) % 10
    updates = (
        dim.withColumn("__b__", bucket)
        .filter(F.col("__b__") < 5)
        .select(
            "c_custkey",
            F.when(F.col("__b__") < 3, F.col("bal_cents") + 500)
            .otherwise(F.col("bal_cents"))
            .alias("bal_cents"),
            "c_mktsegment",
        )
    )
    return scd2_merge(
        history, updates, "c_custkey", ["bal_cents", "c_mktsegment"], batch_id=1
    )


SCD2_CUSTOMER_HISTORY_SQL = """
WITH dim AS (
  SELECT c_custkey,
         cast(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
         c_mktsegment
  FROM customer),
bucketed AS (
  SELECT *, ('0x' || substr(md5(cast(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 10 AS b
  FROM dim),
changed AS (SELECT c_custkey, bal_cents + 500 AS bal_cents, c_mktsegment
            FROM bucketed WHERE b < 3)
SELECT c_custkey, bal_cents, c_mktsegment,
       cast(0 AS BIGINT) AS valid_from, cast(1 AS BIGINT) AS valid_to
FROM dim WHERE c_custkey IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, bal_cents, c_mktsegment,
       cast(1 AS BIGINT) AS valid_from, cast(NULL AS BIGINT) AS valid_to
FROM changed
UNION ALL
SELECT c_custkey, bal_cents, c_mktsegment,
       cast(0 AS BIGINT) AS valid_from, cast(NULL AS BIGINT) AS valid_to
FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
"""


# ------------------------------------------------- incremental rollup
def incremental_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialization parity: the per-user rollup is
    computed as merge(aggregate(history), aggregate(last day)) —
    operators/scd.py::merge_partial_rollups — and the oracle is the
    FULL recompute, so the green row proves the delta-maintenance
    path reproduces the from-scratch table bit-for-bit.  At 100 TB
    only the delta partition is scanned per refresh."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        _cents("value").alias("value_cents"),
    )
    cutoff = ev.agg(F.max("day").alias("d1"))
    ev = ev.join(F.broadcast(cutoff), F.lit(True), "inner")

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )

    hist = _agg(ev.filter(F.col("day") < F.col("d1")))
    delta = _agg(ev.filter(F.col("day") == F.col("d1")))
    return merge_partial_rollups([hist, delta], ["user_id"])


INCREMENTAL_USER_ROLLUP_SQL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY user_id
"""


# ---------------------------------------------- mergeable exact moments
def incremental_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable second-moment statistics (ext): per-event-type
    variance maintained incrementally as EXACT integer sums — (n,
    Σcents, Σcents²) are algebraic, so they ride the same
    merge_partial_rollups path as the user rollup, and the variance
    is DERIVED from exact integers at read time:
    var_pop = (Σx² − (Σx)²/n) / n in cents².  No Welford-style
    floating accumulation anywhere, so merge order cannot drift the
    result and the DuckDB full-recompute oracle matches bit-for-bit
    (the only doubles are the final, identical-on-both-engines
    divisions).  Demonstrates that a 100 TB metrics store keeps
    stddev/variance incrementally for free once measures are stored
    as integer sums."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        _cents("value").alias("c"),
    )
    cutoff = ev.agg(F.max("day").alias("d1"))
    ev = ev.join(F.broadcast(cutoff), F.lit(True), "inner")

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("c").alias("sum_cents"),
            F.sum(F.col("c") * F.col("c")).alias("sumsq_cents"),
        )

    hist = _agg(ev.filter(F.col("day") < F.col("d1")))
    delta = _agg(ev.filter(F.col("day") == F.col("d1")))
    merged = merge_partial_rollups([hist, delta], ["event_type"])
    n = F.col("n_events").cast("double")
    s = F.col("sum_cents").cast("double")
    s2 = F.col("sumsq_cents").cast("double")
    return merged.select(
        "event_type",
        "n_events",
        "sum_cents",
        "sumsq_cents",
        ((s2 - s * s / n) / n).alias("var_pop_cents2"),
    )


INCREMENTAL_VALUE_MOMENTS_SQL = """
WITH m AS (
  SELECT event_type,
         count(*) AS n_events,
         CAST(sum(c) AS BIGINT)     AS sum_cents,
         CAST(sum(c * c) AS BIGINT) AS sumsq_cents
  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events)
  GROUP BY event_type)
SELECT event_type, n_events, sum_cents, sumsq_cents,
       (CAST(sumsq_cents AS DOUBLE)
        - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE) / CAST(n_events AS DOUBLE))
       / CAST(n_events AS DOUBLE) AS var_pop_cents2
FROM m
"""


# ------------------------------------------------------- z-order preview
ZORDER_BITS = 10
ZORDER_COLS = ["user_id", "value_cents"]


def zorder_key_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key preview (ext: multi-column data-skipping layout):
    the exact Z-order key operators/layout.py::zorder_write range
    partitions on, emitted per event so the oracle can recompute the
    interleave bit-for-bit (integer-only scaling, IEEE-exact floor
    division — see layout.py docstring).  The write path itself is
    pytest-verified on real parquet stats; this registers the key
    math under the driver's hash gate."""
    from musicflow_spark.operators.layout import column_bounds, morton_key

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", _cents("value").alias("value_cents")
    )
    bounds = column_bounds(ev, ZORDER_COLS)
    return ev.select(
        "event_id",
        morton_key(ZORDER_COLS, bounds, ZORDER_BITS).alias("zkey"),
    )


def _zorder_oracle_sql() -> str:
    n = len(ZORDER_COLS)
    tops = (1 << ZORDER_BITS) - 1
    # divide-FIRST, multiply second — the exact operation order of
    # operators/layout.py::_scaled, so the IEEE doubles agree
    scaled = {
        c: (
            f"CAST(floor(((t.{c} - b.lo_{c}) /"
            f" (CASE WHEN b.hi_{c} > b.lo_{c} THEN b.hi_{c} - b.lo_{c} ELSE 1 END))"
            f" * {tops}) AS BIGINT)"
        )
        for c in ZORDER_COLS
    }
    terms = [
        f"((({scaled[c]} >> {j}) & 1) << {j * n + i})"
        for j in range(ZORDER_BITS)
        for i, c in enumerate(ZORDER_COLS)
    ]
    bounds = ", ".join(
        f"min({c}) AS lo_{c}, max({c}) AS hi_{c}" for c in ZORDER_COLS
    )
    return f"""
WITH t AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events),
b AS (SELECT {bounds} FROM t)
SELECT t.event_id, ({' | '.join(terms)}) AS zkey
FROM t CROSS JOIN b
"""


def nation_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (no sketch): median and p75 of order
    value per customer nation, via ``F.percentile`` over integer
    cents.

    Portability note: both engines define the continuous quantile at
    rank p·(n-1) with linear interpolation.  The probed points are
    DYADIC (0.5, 0.75), so the interpolation arithmetic on exact
    integer cents is exact in IEEE-754 regardless of whether the
    engine computes a+f·(b-a) or (1-f)·a+f·b — non-dyadic fractions
    (e.g. 0.9) would differ in the last ulp between those forms.

    Scale shape: customer is a broadcast dimension; the percentile
    aggregates shuffle once on nationkey.  Exact percentile holds the
    per-group values — the documented scale swap is
    ``approx_median_prices``' percentile_approx (sketch, mergeable);
    this query is its exact anchor at the same API surface."""
    orders, cust = (
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
    )
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("c_nationkey", _cents("o_totalprice").alias("cents"))
    return j.groupBy("c_nationkey").agg(
        F.percentile("cents", 0.5).alias("p50_cents"),
        F.percentile("cents", 0.75).alias("p75_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


NATION_VALUE_PERCENTILES_SQL = """
SELECT c.c_nationkey,
       quantile_cont(CAST(round(o.o_totalprice * 100) AS BIGINT), 0.5)  AS p50_cents,
       quantile_cont(CAST(round(o.o_totalprice * 100) AS BIGINT), 0.75) AS p75_cents,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
"""


def segment_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator surface: INTERSECT / EXCEPT (distinct semantics)
    between two customer populations — the BUILDING market segment vs
    customers who placed an order over $400k — labelled and counted.

    Scale shape: set ops hash-shuffle on the full row (here a single
    key column), identical to a distinct groupBy; the three branches
    share the two scans via lazy reuse and AQE coalesces the tiny
    post-set-op partitions."""
    orders, cust = (
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
    )
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    both = seg.intersect(big).withColumn("membership", F.lit("both"))
    seg_only = seg.subtract(big).withColumn("membership", F.lit("seg_only"))
    big_only = big.subtract(seg).withColumn("membership", F.lit("big_only"))
    return (
        both.unionByName(seg_only)
        .unionByName(big_only)
        .groupBy("membership")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SEGMENT_CUSTOMER_OVERLAP_SQL = """
WITH seg AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
big AS (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000),
labelled AS (
  SELECT c_custkey, 'both' AS membership FROM (SELECT * FROM seg INTERSECT SELECT * FROM big)
  UNION ALL
  SELECT c_custkey, 'seg_only' FROM (SELECT * FROM seg EXCEPT SELECT * FROM big)
  UNION ALL
  SELECT c_custkey, 'big_only' FROM (SELECT * FROM big EXCEPT SELECT * FROM seg))
SELECT membership, count(*) AS n_customers
FROM labelled
GROUP BY membership
"""


def nation_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape: per-nation order metrics unpivoted into
    (nation, metric, value) rows via ``DataFrame.unpivot`` — the
    melt surface (tidy-format export, the transpose of
    ``user_event_pivot``).

    Scale shape: unpivot is a narrow projection (no shuffle — each
    wide row emits k long rows in place); the only shuffle is the
    upstream groupBy.  All measures are exact longs."""
    orders, cust = (
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "customer"),
    )
    wide = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("total_cents"),
            F.max(_cents("o_totalprice")).alias("max_cents"),
        )
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=["n_orders", "total_cents", "max_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )


NATION_METRICS_UNPIVOT_SQL = """
WITH wide AS (
  SELECT c.c_nationkey,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
         max(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS max_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey)
SELECT c_nationkey, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, total_cents, max_cents))
"""


def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/scd.py::snapshot_diff): the
    FULL OUTER join surface — the one join type no other registered
    query plans — classifying every customer as added / removed /
    changed / unchanged between two deterministic snapshot versions.

    The 'new' snapshot derives from the portable 60-bit hash so both
    engines build the identical delta: bucket<2 → balance +100 cents
    (changed), bucket=2 → dropped (removed), bucket=3 → re-keyed copy
    appended (added), the rest untouched (unchanged) — all four
    classes populated at every SF."""
    dim = _customer_dim(spark, sf_dir).select("c_custkey", "bal_cents")
    b = portable_hash60(F.col("c_custkey").cast("string")) % 10
    bucketed = dim.withColumn("_b", b)
    new = (
        bucketed.filter(F.col("_b") != 2)
        .select(
            "c_custkey",
            F.when(F.col("_b") < 2, F.col("bal_cents") + 100)
            .otherwise(F.col("bal_cents"))
            .alias("bal_cents"),
        )
        .unionByName(
            bucketed.filter(F.col("_b") == 3).select(
                # negated key: disjoint from real custkeys at ANY scale
                # factor (a fixed +10M offset collides once customer
                # cardinality reaches ~10M rows)
                (-F.col("c_custkey")).alias("c_custkey"),
                "bal_cents",
            )
        )
    )
    return snapshot_diff(dim, new, ["c_custkey"], ["bal_cents"])


CUSTOMER_SNAPSHOT_DIFF_SQL = """
WITH dim AS (
  SELECT c_custkey, cast(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer),
bucketed AS (
  SELECT *, ('0x' || substr(md5(cast(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 10 AS b
  FROM dim),
new AS (
  SELECT c_custkey,
         CASE WHEN b < 2 THEN bal_cents + 100 ELSE bal_cents END AS bal_cents
  FROM bucketed WHERE b <> 2
  UNION ALL
  SELECT -c_custkey AS c_custkey, bal_cents
  FROM bucketed WHERE b = 3)
SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'added'
            WHEN n.c_custkey IS NULL THEN 'removed'
            WHEN o.bal_cents IS NOT DISTINCT FROM n.bal_cents THEN 'unchanged'
            ELSE 'changed' END AS diff_status,
       o.bal_cents AS old_bal_cents,
       n.bal_cents AS new_bal_cents
FROM dim o
FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
"""


def order_revenue_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (vs daily_moving_stats' ROWS frame): the
    trailing-7-CALENDAR-day revenue per order day.  RANGE frames
    differ from ROWS exactly when the series has gaps — a missing day
    still ages out of a RANGE frame but a ROWS frame would reach
    further back; registering both locks both semantics.

    Scale: same argument as daily_moving_stats — the global ordered
    window runs on the day-grain aggregate (one row per day), which
    is dimension-sized by construction; the raw scan aggregates with
    an ordinary keyed shuffle first."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(_cents("o_totalprice")).alias("day_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    ).withColumn(
        "day_num", F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "day_cents",
        "n_orders",
        F.sum("day_cents").over(w).alias("trail7_cents"),
        F.sum("n_orders").over(w).alias("trail7_orders"),
    )


ORDER_REVENUE_RANGE_WINDOW_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents,
         count(*) AS n_orders,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num
  FROM orders GROUP BY 1, 4)
SELECT day, day_cents, n_orders,
       CAST(sum(day_cents) OVER (ORDER BY day_num
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail7_cents,
       CAST(sum(n_orders) OVER (ORDER BY day_num
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail7_orders
FROM daily
"""


# ------------------------------------- fact -> SCD2 version lookup
def orders_with_customer_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-version lookup (ext): every order joined to the SCD2
    customer version valid at its transaction time — THE consumption
    pattern a Type-2 dimension exists for.  Transaction time is a
    deterministic batch id (hash of the order key, 0 or 1) against
    the two-batch history of ``scd2_customer_history``.

    Scale shape: a plain custkey equi-join with the validity
    predicate as a post-filter — versions per key are bounded (one
    row per change batch), so the fan-out before the filter is the
    version count, never fact x fact; no window, no as-of machinery
    needed when validity is already materialized as [from, to)."""
    hist = scd2_customer_history(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders")
    t = (portable_hash60(F.col("o_orderkey").cast("string")) % 2).alias("txn_batch")
    o = orders.select("o_orderkey", "o_custkey", t)
    j = o.join(hist, o["o_custkey"] == hist["c_custkey"]).filter(
        (F.col("valid_from") <= F.col("txn_batch"))
        & (F.col("valid_to").isNull() | (F.col("txn_batch") < F.col("valid_to")))
    )
    return j.select(
        "o_orderkey", "txn_batch", "bal_cents", "c_mktsegment"
    )


def _orders_with_customer_version_oracle_sql() -> str:
    return f"""
SELECT o.o_orderkey,
       ('0x' || substr(md5(cast(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 2
         AS txn_batch,
       h.bal_cents, h.c_mktsegment
FROM orders o
JOIN ({SCD2_CUSTOMER_HISTORY_SQL}) h
  ON o.o_custkey = h.c_custkey
WHERE h.valid_from <= ('0x' || substr(md5(cast(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 2
  AND (h.valid_to IS NULL
       OR ('0x' || substr(md5(cast(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 2 < h.valid_to)
"""


# ------------------------------------------------------- table profile
PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (ext: deequ/dbt-profiler shape): per
    column of the customer table, row count, non-null count, exact
    distinct count (operators/profile.py::profile_exact — the k-way
    EXPAND certification tier; the approx tier is pinned to this one
    in tests and runs with no expand at scale)."""
    from musicflow_spark.operators.profile import profile_exact

    return profile_exact(read_table(spark, sf_dir, "customer"), PROFILE_COLS)


CUSTOMER_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count({c}) AS n_nonnull, count(DISTINCT {c}) AS n_distinct
FROM customer"""
    for c in PROFILE_COLS
)


def customer_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-tier profile (ext): the SAME per-column profile through
    ``profile_approx`` — single no-expand pass of HLL cardinality
    sketches, the tier a wide 100 TB table runs.  Soundness-oracle
    pattern: exact columns recomputed by DuckDB, the sketch estimate
    gated on Spark at 5% relative (+10 absolute for tiny columns)
    against the exact distinct count."""
    from musicflow_spark.operators.profile import profile_approx, profile_exact

    cust = read_table(spark, sf_dir, "customer")
    approx = profile_approx(cust, PROFILE_COLS).select(
        "column", F.col("n_distinct").alias("_nd_approx")
    )
    exact = profile_exact(cust, PROFILE_COLS)
    return exact.join(approx, "column").select(
        "column",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        (
            F.abs(F.col("_nd_approx") - F.col("n_distinct"))
            <= F.col("n_distinct") * 0.05 + F.lit(10)
        ).alias("sketch_ok"),
    )


CUSTOMER_PROFILE_SKETCH_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count({c}) AS n_nonnull, count(DISTINCT {c}) AS n_distinct,
       TRUE AS sketch_ok
FROM customer"""
    for c in PROFILE_COLS
)


# ------------------------------------------------- MERGE INTO upsert
def customer_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (operators/mergeinto.py) exercising all four
    branches in one pass: customers with >= $2M of 1997+ order volume
    are deleted (matched-delete), other customers with recent orders
    get their balance incremented (matched-update), supplier-derived
    rows keyed max(c_custkey) + s_suppkey insert as new accounts
    (not-matched-insert, key offset derived from the actual key domain
    so the disjoint-key premise holds at every sf — ADVICE r05), and
    customers with no recent orders carry
    unchanged (not-matched-by-source).  One full-outer join = one
    shuffle; the oracle replays the same CASE branches in ANSI SQL."""
    from musicflow_spark.operators.mergeinto import merge_into

    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
        _cents("c_acctbal").alias("acctbal_cents"),
    )
    orders = read_table(spark, sf_dir, "orders")
    upd_orders = (
        orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(_cents("o_totalprice")).alias("delta_cents"))
        .select(
            "custkey", "delta_cents",
            F.lit(None).cast("string").alias("new_name"),
            F.lit(None).cast("string").alias("new_seg"),
        )
    )
    max_key = base.agg(F.max("custkey").alias("max_custkey"))
    upd_suppliers = (
        read_table(spark, sf_dir, "supplier")
        .crossJoin(F.broadcast(max_key))
        .select(
            (F.col("max_custkey") + 1 + F.col("s_suppkey")).alias("custkey"),
            _cents("s_acctbal").alias("delta_cents"),
            F.col("s_name").alias("new_name"),
            F.lit("NEW").alias("new_seg"),
        )
    )
    updates = upd_orders.unionByName(upd_suppliers)
    merged = merge_into(
        base,
        updates,
        on=["custkey"],
        update_set={
            "acctbal_cents": F.col("acctbal_cents") + F.col("delta_cents")
        },
        delete_when=F.col("delta_cents") > 200_000_000,
        insert_set={
            "name": F.col("new_name"),
            "mktsegment": F.col("new_seg"),
            "acctbal_cents": F.col("delta_cents"),
        },
    )
    return merged


CUSTOMER_MERGE_UPSERT_SQL = """
WITH upd AS (
  SELECT o_custkey AS custkey,
         CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS delta_cents,
         CAST(NULL AS VARCHAR) AS new_name, CAST(NULL AS VARCHAR) AS new_seg
  FROM orders WHERE o_orderdate >= DATE '1997-01-01' GROUP BY o_custkey
  UNION ALL
  SELECT (SELECT max(c_custkey) + 1 FROM customer) + s_suppkey,
         CAST(round(s_acctbal * 100) AS BIGINT), s_name, 'NEW'
  FROM supplier
),
base AS (
  SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
)
SELECT b.custkey, b.name, b.mktsegment,
       CASE WHEN u.custkey IS NULL THEN b.acctbal_cents
            ELSE b.acctbal_cents + u.delta_cents END AS acctbal_cents
FROM base b LEFT JOIN upd u ON b.custkey = u.custkey
WHERE u.custkey IS NULL OR u.delta_cents <= 200000000
UNION ALL
SELECT u.custkey, u.new_name, u.new_seg, u.delta_cents
FROM upd u LEFT JOIN base b ON u.custkey = b.custkey
WHERE b.custkey IS NULL
"""


# ------------------------------------------------- bloom runtime filter
def bloom_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled runtime filter (operators/bloomfilter.py): orders
    are bloom-pruned on o_custkey against the BUILDING-segment key set
    BEFORE the exact semi join, so at 100 TB the fact side sheds
    ~4/5 of its rows map-side (segment selectivity) before any
    join exchange.  Bloom admits no false negatives, so the exact
    verify join makes the pipeline value-identical to the direct
    semi join — which is therefore the oracle (same pattern as the
    salted rewrites: a green row certifies the REWRITE).  False
    positives only cost verify work; the FP rate at these sizes is
    asserted ~0 in tests.

    Reference analogue: the in-memory liked/cached-id membership
    probes of ``dags/spotify_elt.py:311-336``, re-expressed as a
    broadcastable fixed-size bitmap instead of a shipped key list."""
    from musicflow_spark.operators.bloomfilter import bloom_build, bloom_probe

    cust = read_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", _cents("o_totalprice").alias("total_cents")
    )
    bloom = bloom_build(keys, "k", m_bits=1 << 20, n_hashes=7)
    pruned = bloom_probe(orders, "o_custkey", bloom, m_bits=1 << 20, n_hashes=7)
    verified = pruned.join(
        F.broadcast(keys), pruned["o_custkey"] == keys["k"], "left_semi"
    )
    return verified.groupBy("o_orderpriority").agg(
        F.sum("total_cents").alias("sum_total_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


BLOOM_FILTERED_REVENUE_SQL = """
SELECT o_orderpriority,
       CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


# ------------------------------------------------------------------ RFM
RFM_TILES = 5


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (ext): quintile scores for Recency (days from
    each customer's last order to the corpus max order date),
    Frequency (order count) and Monetary (lifetime cents), plus the
    classic marketing segment label from the (R, F) grid.

    Every NTILE runs through ``operators/ids.py::ntile_scaled`` — the
    range-repartitioned surrogate-id path plus NTILE's closed form —
    so no global single-partition window exists anywhere in the plan,
    while the oracle uses DuckDB's native ntile() over the identical
    (metric, custkey) total order: a hash-green row proves the
    closed-form/parallel-window path IS ANSI NTILE.  Monetary sums
    integer cents (round(x*100)) so the ordering has no float-sum
    ambiguity.  Reference analogue: none (marts are per-entity
    rollups, e.g. log_for_tableau.sql); RFM is the standard
    warehouse-side extension of the same customer-rollup shape."""
    from musicflow_spark.operators.ids import ntile_scaled

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("__anchor__"))
    base = (
        per_cust.crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.datediff(F.to_date("__anchor__"), F.to_date("last_order")),
        )
        .drop("__anchor__", "last_order")
    )
    scored = ntile_scaled(
        base.withColumn("__neg_f__", -F.col("frequency")),
        RFM_TILES,
        ["recency_days", "o_custkey"],
        "__b_r__",
    )
    scored = ntile_scaled(scored, RFM_TILES, ["__neg_f__", "o_custkey"], "__b_f__")
    scored = ntile_scaled(
        scored.withColumn("__neg_m__", -F.col("monetary_cents")),
        RFM_TILES,
        ["__neg_m__", "o_custkey"],
        "__b_m__",
    )
    r_s = (F.lit(RFM_TILES + 1) - F.col("__b_r__")).alias("r_score")
    f_s = (F.lit(RFM_TILES + 1) - F.col("__b_f__")).alias("f_score")
    m_s = (F.lit(RFM_TILES + 1) - F.col("__b_m__")).alias("m_score")
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champions")
        .when(F.col("r_score") >= 4, "new_or_promising")
        .when(F.col("f_score") >= 4, "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("core")
    )
    return (
        scored.select(
            "o_custkey", "recency_days", "frequency", "monetary_cents", r_s, f_s, m_s
        )
        .withColumn("segment", seg)
    )


CUSTOMER_RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1),
anchor AS (SELECT max(o_orderdate) AS anchor FROM orders),
base AS (
  SELECT p.o_custkey, p.frequency, p.monetary_cents,
         CAST(date_diff('day', CAST(p.last_order AS DATE), CAST(a.anchor AS DATE)) AS INT)
           AS recency_days
  FROM per_cust p, anchor a),
scored AS (
  SELECT *,
         CAST({RFM_TILES + 1} - ntile({RFM_TILES}) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_score,
         CAST({RFM_TILES + 1} - ntile({RFM_TILES}) OVER (ORDER BY -frequency, o_custkey) AS INT) AS f_score,
         CAST({RFM_TILES + 1} - ntile({RFM_TILES}) OVER (ORDER BY -monetary_cents, o_custkey) AS INT) AS m_score
  FROM base)
SELECT o_custkey, recency_days, frequency, monetary_cents, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
            WHEN r_score >= 4 THEN 'new_or_promising'
            WHEN f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            ELSE 'core' END AS segment
FROM scored
"""


# ------------------------------------------ Benford digit screen
BENFORD_SCALE = 1_000_000


def orders_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order values — the classic
    forensic-accounting anomaly test (fabricated amounts drift from
    the ln(1+1/d)/ln(10) law).  One row per leading digit: count,
    observed share in basis points (exact integer division), expected
    Benford share in micro-units, and the absolute gap — all integer,
    so the screen replays bit-for-bit.  Scale: one scan with the
    digit extracted from the cents string (no float log in the hot
    path), one 9-cell aggregate, a 1-row total broadcast."""
    o = read_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    cells = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    # ln(10) as a shared decimal literal: evaluating ln(10.0) at
    # runtime could differ by an ulp between libm implementations
    expected = F.round(
        F.log(1.0 + 1.0 / F.col("digit")) / 2.302585092994046 * BENFORD_SCALE, 0
    ).cast("long")
    share_bp = F.expr("(n * 10000) div total")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            share_bp.alias("share_bp"),
            expected.alias("benford_micro"),
            F.abs(
                F.expr(f"(n * {BENFORD_SCALE}) div total") - expected
            ).alias("gap_micro"),
        )
    )


ORDERS_BENFORD_SCREEN_SQL = f"""
WITH o AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders),
cells AS (SELECT digit, count(*) AS n FROM o GROUP BY digit),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
SELECT digit, n,
       (n * 10000) // total AS share_bp,
       CAST(round(ln(1.0 + 1.0 / digit) / 2.302585092994046 * {BENFORD_SCALE}) AS BIGINT)
         AS benford_micro,
       abs((n * {BENFORD_SCALE}) // total
           - CAST(round(ln(1.0 + 1.0 / digit) / 2.302585092994046 * {BENFORD_SCALE}) AS BIGINT))
         AS gap_micro
FROM cells CROSS JOIN tot
"""


# -------------------------------------------- PSI drift monitor
PSI_SCALE = 1_000_000  # micro grid
PSI_BIN_CENTS = 5_000_000  # $50k value bins
PSI_SPLIT_YEAR = 1996  # expected = years < split, actual = years >= split


def orders_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the early and late halves of
    the order-value distribution — THE drift monitor scored models are
    gated on (PSI < 0.1 stable / > 0.25 retrain).  Orders bucket into
    fixed $50k bins; the pre-{split}-year slice is the expected
    distribution, the rest the actual; each bin row carries counts and
    its (p−q)·ln(p/q) contribution with add-1 smoothing.  The shares
    and the log ride the integer micro grid BEFORE any summation
    (same discipline as the KL/perplexity family), so the bin table
    replays bit-for-bit.  Scale: one scan, one bin-keyed aggregate
    (bin count bounded by the value domain), two 1-row total
    broadcasts."""
    o = read_table(spark, sf_dir, "orders").select(
        F.expr(
            f"cast(round(o_totalprice * 100) AS bigint) div {PSI_BIN_CENTS}"
        ).alias("bin"),
        (F.year("o_orderdate") < PSI_SPLIT_YEAR).alias("is_expected"),
    )
    cells = o.groupBy("bin").agg(
        F.sum(F.col("is_expected").cast("long")).alias("n_exp"),
        F.sum((~F.col("is_expected")).cast("long")).alias("n_act"),
    )
    tot = cells.agg(
        F.sum("n_exp").alias("t_exp"), F.sum("n_act").alias("t_act"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    # add-1 smoothing keeps empty-side bins finite; shares on the
    # micro grid, each ln() rounded to int64 before the sum
    p = (F.col("n_exp") + 1).cast("double") / (F.col("t_exp") + F.col("n_bins"))
    q = (F.col("n_act") + 1).cast("double") / (F.col("t_act") + F.col("n_bins"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_exp",
            "n_act",
            F.round((p - q) * F.log(p / q) * PSI_SCALE, 0)
            .cast("long")
            .alias("psi_micro"),
        )
    )


ORDERS_PSI_DRIFT_SQL = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // {PSI_BIN_CENTS} AS bin,
         (year(o_orderdate) < {PSI_SPLIT_YEAR}) AS is_expected
  FROM orders),
cells AS (
  SELECT bin,
         CAST(sum(CASE WHEN is_expected THEN 1 ELSE 0 END) AS BIGINT) AS n_exp,
         CAST(sum(CASE WHEN is_expected THEN 0 ELSE 1 END) AS BIGINT) AS n_act
  FROM o GROUP BY bin),
tot AS (SELECT CAST(sum(n_exp) AS BIGINT) AS t_exp,
               CAST(sum(n_act) AS BIGINT) AS t_act,
               count(*) AS n_bins
        FROM cells)
SELECT bin, n_exp, n_act,
       CAST(round(
         ((n_exp + 1.0) / (t_exp + n_bins) - (n_act + 1.0) / (t_act + n_bins))
         * ln(((n_exp + 1.0) / (t_exp + n_bins)) / ((n_act + 1.0) / (t_act + n_bins)))
         * {PSI_SCALE}) AS BIGINT) AS psi_micro
FROM cells CROSS JOIN tot
"""


# ---------------------------------------- anti-entropy checksums
CKSUM_MOD = 1 << 20  # keeps the additive component overflow-free at 1e12 rows


def orders_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint — the anti-entropy check a
    replicated / migrated warehouse runs to prove two copies of a
    table are row-for-row identical without shipping rows: per status
    group, row count, XOR of the portable 60-bit row hashes, and the
    sum of hashes mod 2^20.  XOR and modular addition are commutative
    and associative, so the checksum is partitioning- and
    order-independent; a single changed, missing, or duplicated row
    flips it.  The row hash covers every column (money in cents,
    timestamps as ISO strings — both render identically in Spark and
    DuckDB).  Scale: one map pass + a |statuses|-cell aggregate; this
    is the cheapest full-table integrity query that exists."""
    o = read_table(spark, sf_dir, "orders")
    h = portable_hash60(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
            F.col("o_orderdate").cast("string"),
            F.col("o_orderpriority"),
        )
    )
    return (
        o.select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_hash"),
            F.sum(F.col("h") % CKSUM_MOD).alias("sum_hash_mod"),
        )
    )


ORDERS_TABLE_CHECKSUM_SQL = f"""
WITH h AS (
  SELECT o_orderstatus,
         ('0x' || substr(md5(
            cast(o_orderkey AS varchar) || '|' ||
            cast(o_custkey AS varchar) || '|' ||
            o_orderstatus || '|' ||
            cast(CAST(round(o_totalprice * 100) AS BIGINT) AS varchar) || '|' ||
            cast(o_orderdate AS varchar) || '|' ||
            o_orderpriority), 1, 15))::BIGINT AS h
  FROM orders)
SELECT o_orderstatus,
       count(*) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor_hash,
       CAST(sum(h % {CKSUM_MOD}) AS BIGINT) AS sum_hash_mod
FROM h
GROUP BY o_orderstatus
"""


# ------------------------------------- chi-square independence test
CHI2_SCALE = 1_000_000  # shared integer micro grid


def segment_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between customer
    market segment and order priority — the categorical-association
    statistic every feature-selection / drift-detection pass runs.
    One row per contingency cell: observed count, expected count
    (row_total * col_total / N) and the cell's (O-E)²/E contribution,
    both on the integer micro grid — each cell's double expression is
    a single multiply/divide chain (identical IEEE ops in both
    engines), rounded to int64 micro-units BEFORE any summation, so
    downstream totals are exact integer adds.

    Scale shape: the contingency table is one orderkey-joined groupBy
    (cells = |segments| x |priorities|, tiny); marginals are
    re-aggregations of the cells; N rides a 1-row broadcast."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cells = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    rt = cells.groupBy("c_mktsegment").agg(F.sum("observed").alias("row_total"))
    ct = cells.groupBy("o_orderpriority").agg(F.sum("observed").alias("col_total"))
    n = cells.agg(F.sum("observed").alias("n_total"))
    e = (F.col("row_total") * F.col("col_total")).cast("double") / F.col("n_total")
    return (
        cells.join(rt, "c_mktsegment")
        .join(ct, "o_orderpriority")
        .crossJoin(F.broadcast(n))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "observed",
            F.round(e * CHI2_SCALE, 0).cast("long").alias("expected_micro"),
            F.round(
                (F.col("observed") - e) * (F.col("observed") - e) / e * CHI2_SCALE,
                0,
            )
            .cast("long")
            .alias("chi2_cell_micro"),
        )
    )


SEGMENT_PRIORITY_CHI2_SQL = f"""
WITH cells AS (
  SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS observed
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
rt AS (SELECT c_mktsegment, CAST(sum(observed) AS BIGINT) AS row_total
       FROM cells GROUP BY 1),
ct AS (SELECT o_orderpriority, CAST(sum(observed) AS BIGINT) AS col_total
       FROM cells GROUP BY 1),
n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM cells)
SELECT cells.c_mktsegment, cells.o_orderpriority,
       CAST(observed AS BIGINT) AS observed,
       CAST(round(CAST(row_total * col_total AS double) / n_total
                  * {CHI2_SCALE}) AS BIGINT) AS expected_micro,
       CAST(round((observed - CAST(row_total * col_total AS double) / n_total)
                  * (observed - CAST(row_total * col_total AS double) / n_total)
                  / (CAST(row_total * col_total AS double) / n_total)
                  * {CHI2_SCALE}) AS BIGINT) AS chi2_cell_micro
FROM cells
JOIN rt USING (c_mktsegment)
JOIN ct USING (o_orderpriority)
CROSS JOIN n
"""


# --------------------------------- incremental join-view maintenance
def segment_join_view_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sided incremental maintenance of a JOIN view — the delta
    algebra V(A ⨝ B) = agg(A₀⨝B₀) ⊕ agg(ΔA⨝B₀) ⊕ agg(A₀⨝ΔB) ⊕
    agg(ΔA⨝ΔB), the identity every materialized-view maintainer
    (and every backfill that must not recompute history) rests on.
    The rollup-merge tier (operators/scd.py::merge_partial_rollups)
    already proves single-table delta maintenance
    (incremental_user_rollup); this extends it to deltas arriving on
    BOTH sides of a join: orders split by a deterministic orderkey
    stride (ΔA = keys ≡ 7 mod 10), customers by a custkey stride
    (ΔB = keys ≡ 3 mod 7).  The Spark side executes all four delta
    joins and merges the algebraic partials; the oracle is the
    from-scratch join + GROUP BY — a green row certifies the delta
    decomposition exactly (integer cents, so ⊕ is exact addition).

    Scale shape: each delta join is a keyed equi-join whose cost
    scales with the DELTA, not history — that is the point; the merge
    re-aggregates segment-cardinality partials."""
    from musicflow_spark.operators.scd import merge_partial_rollups

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    da_pred = F.col("o_orderkey") % 10 == 7
    db_pred = F.col("c_custkey") % 7 == 3
    a0, da = orders.filter(~da_pred), orders.filter(da_pred)
    b0, db = cust.filter(~db_pred), cust.filter(db_pred)

    def part(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("revenue_cents"),
            )
        )

    return merge_partial_rollups(
        [part(a0, b0), part(da, b0), part(a0, db), part(da, db)],
        ["c_mktsegment"],
    )


SEGMENT_JOIN_VIEW_IVM_SQL = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


# ------------------------------------------ entity-resolution mart
def customer_entity_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution — the warehouse composition of
    three hash-proven components into one mart: (1) BLOCKING, the
    symmetric-deletion edit-distance-1 name join
    (operators/fuzzyjoin.py, proven complete by fuzzy_customer_pairs'
    quadratic oracle), with a second attribute IN the blocking key
    (same nation — matching on one noisy field alone is how ER
    pipelines over-merge, and carrying the gate inside the join key
    rather than as a post-join filter divides candidate fan-out by
    |nations|);
    (2) CLUSTERING, large-star/small-star connected components over
    the match edges (operators/graph.py::star_components); (3)
    SURVIVORSHIP, one golden record per entity — representative =
    highest balance, ties to lowest custkey; balances sum in exact
    cents.  The oracle replays blocking as the quadratic theta-join,
    clustering as a recursive CTE, survivorship as a ranked window —
    so a green row certifies the COMPOSITION, not just the parts.

    Scale shape: deletion-key equi-join (8-byte hashed keys) for
    candidates; star contraction is edge-linear keyed rounds; the
    survivorship window partitions by cluster (near-dup-group-sized);
    no stage is quadratic in customers."""
    from musicflow_spark.operators.fuzzyjoin import fuzzy_pairs_dist1
    from musicflow_spark.operators.graph import star_components

    cust = read_table(spark, sf_dir, "customer")
    # nation rides INSIDE the blocking key (block_col), not as a
    # post-join filter: the match rule requires same-nation anyway, so
    # pre-gating loses nothing and divides per-deletion-key candidate
    # fan-out by |nations| — the x100 stress lever (VERDICT r07 item 6)
    pairs = fuzzy_pairs_dist1(
        cust.select("c_custkey", "c_name", "c_nationkey"),
        "c_custkey",
        "c_name",
        block_col="c_nationkey",
    )
    edges = pairs.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    clusters = star_components(
        cust.select("c_custkey"), edges, id_col="c_custkey"
    ).select("c_custkey", "cluster_id")
    members = clusters.join(cust, "c_custkey").select(
        "cluster_id",
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("cents"), F.asc("c_custkey"))
    golden = (
        members.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("c_custkey").alias("golden_custkey"),
            F.col("c_name").alias("golden_name"),
        )
    )
    stats = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("cents").alias("total_balance_cents"),
    )
    return stats.join(golden, "cluster_id").filter(F.col("n_members") > 1)


CUSTOMER_ENTITY_MART_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND a.c_nationkey = b.c_nationkey
   AND levenshtein(a.c_name, b.c_name) <= 1),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
cl AS (SELECT id AS c_custkey, min(r) AS cluster_id FROM reach GROUP BY id),
m AS (
  SELECT cl.cluster_id, c.c_custkey, c.c_name,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
  FROM cl JOIN customer c USING (c_custkey)),
stats AS (
  SELECT cluster_id, count(*) AS n_members,
         CAST(sum(cents) AS BIGINT) AS total_balance_cents
  FROM m GROUP BY cluster_id),
golden AS (
  SELECT cluster_id, c_custkey AS golden_custkey, c_name AS golden_name
  FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY cents DESC, c_custkey) AS rk
        FROM m)
  WHERE rk = 1)
SELECT s.cluster_id, s.n_members, s.total_balance_cents,
       g.golden_custkey, g.golden_name
FROM stats s JOIN golden g USING (cluster_id)
WHERE s.n_members > 1
"""


QUERIES = [
    Query(
        "orders_benford_screen",
        "ext: Benford first-digit anomaly screen (integer shares, shared-literal expected law)",
        orders_benford_screen,
        ORDERS_BENFORD_SCREEN_SQL,
    ),
    Query(
        "orders_psi_drift",
        "ext: PSI drift monitor between time slices (fixed value bins, add-1 smoothing, micro-grid contributions)",
        orders_psi_drift,
        ORDERS_PSI_DRIFT_SQL,
    ),
    Query(
        "orders_table_checksum",
        "ext: order-insensitive anti-entropy table fingerprint (count + XOR + modular-sum of portable row hashes)",
        orders_table_checksum,
        ORDERS_TABLE_CHECKSUM_SQL,
    ),
    Query(
        "segment_priority_chi2",
        "ext: Pearson chi-square independence test (per-cell O/E/(O-E)^2/E on the integer micro grid)",
        segment_priority_chi2,
        SEGMENT_PRIORITY_CHI2_SQL,
    ),
    Query(
        "segment_join_view_ivm",
        "ext: double-sided incremental join-view maintenance (four-partial delta algebra == full recompute)",
        segment_join_view_ivm,
        SEGMENT_JOIN_VIEW_IVM_SQL,
    ),
    Query(
        "customer_entity_mart",
        "ext: end-to-end entity resolution (deletion-key blocking + attribute gate -> star components -> golden-record survivorship)",
        customer_entity_mart,
        CUSTOMER_ENTITY_MART_SQL,
        bench=True,
    ),
    Query("skew_salted_agg", "ext: two-phase salted aggregation == direct", skew_salted_agg, SKEW_SALTED_AGG_SQL),
    Query("skew_salted_join", "ext: salted hot-key join == plain join", skew_salted_join_revenue, SKEW_SALTED_JOIN_SQL),
    Query("skew_salted_topk", "ext: two-phase salted top-k == direct window (last-reducer fix)", skew_salted_topk, SKEW_SALTED_TOPK_SQL),
    Query("order_status_cube", "ext: CUBE grouping-sets OLAP summary", order_status_cube, ORDER_STATUS_CUBE_SQL),
    Query("daily_moving_stats", "ext: frame-bounded moving/cumulative windows", daily_moving_stats, DAILY_MOVING_STATS_SQL),
    Query("scd2_customer_history", "ext: SCD Type-2 snapshot merge", scd2_customer_history, SCD2_CUSTOMER_HISTORY_SQL),
    Query("incremental_user_rollup", "ext: partial-aggregate merge == recompute", incremental_user_rollup, INCREMENTAL_USER_ROLLUP_SQL),
    Query("zorder_key_preview", "ext: Z-order layout key (multi-column data skipping)", zorder_key_preview, _zorder_oracle_sql()),
    Query("incremental_value_moments", "ext: mergeable exact variance (integer moments)", incremental_value_moments, INCREMENTAL_VALUE_MOMENTS_SQL),
    Query("nation_value_percentiles", "ext: exact grouped percentiles (dyadic, bit-portable)", nation_value_percentiles, NATION_VALUE_PERCENTILES_SQL),
    Query("segment_customer_overlap", "ext: INTERSECT/EXCEPT set-operator surface", segment_customer_overlap, SEGMENT_CUSTOMER_OVERLAP_SQL),
    Query("nation_metrics_unpivot", "ext: unpivot/melt wide-to-long reshape", nation_metrics_unpivot, NATION_METRICS_UNPIVOT_SQL),
    Query("customer_snapshot_diff", "ext: FULL OUTER snapshot reconciliation (added/removed/changed)", customer_snapshot_diff, CUSTOMER_SNAPSHOT_DIFF_SQL),
    Query("order_revenue_range_window", "ext: RANGE-framed trailing-interval window", order_revenue_range_window, ORDER_REVENUE_RANGE_WINDOW_SQL),
    Query("customer_profile", "ext: one-pass table profile (completeness + cardinality)", customer_profile, CUSTOMER_PROFILE_SQL),
    Query(
        "customer_rfm_segments",
        "ext: RFM quintile segmentation via parallel closed-form NTILE (no global window)",
        customer_rfm_segments,
        CUSTOMER_RFM_SEGMENTS_SQL,
    ),
    Query("orders_with_customer_version", "ext: fact -> SCD2 dimension-version lookup", orders_with_customer_version, _orders_with_customer_version_oracle_sql()),
    Query("customer_profile_sketch", "ext: sketch-tier profile (no-expand HLL pass, exact-gated)", customer_profile_sketch, CUSTOMER_PROFILE_SKETCH_SQL),
    Query("bloom_filtered_revenue", "ext: bloom runtime-filter semi-join reduction == direct semi join", bloom_filtered_revenue, BLOOM_FILTERED_REVENUE_SQL, bench=True),
    Query("customer_merge_upsert", "ext: MERGE INTO upsert-with-delete (single full-outer join)", customer_merge_upsert, CUSTOMER_MERGE_UPSERT_SQL, bench=True),
]
