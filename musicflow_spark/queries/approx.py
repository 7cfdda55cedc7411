"""Approximate/sketch query surfaces with soundness oracles, plus the
blocked fuzzy join certified against its quadratic twin.

The sketch queries follow the soundness-oracle pattern used by the
ANN family: the approximate value itself is not oracle-reproducible
(DuckDB runs a different HLL / quantile sketch), so the registered
query emits only (a) exactly-recomputable columns and (b) a boolean
"within documented error bound" gate computed ON SPARK against the
exact value.  The DuckDB oracle recomputes the exact columns and
emits literal TRUE for the gate — if the sketch ever drifts outside
its bound, the hash comparison goes red.  approx_count_distinct
(HLL++) and percentile_approx (KLL-ish GK variant) are deterministic
for a fixed input, so this is a stable, driver-checkable contract.

Weighted sampling is Efraimidis–Spirakis order sampling driven by the
engine-portable 60-bit hash (operators/dedup.py::portable_hash60), so
the DuckDB oracle replays the identical selection: key = ln(u)/w is a
monotone transform of u^(1/w); top-k by key is TakeOrderedAndProject
on Spark (per-partition top-k + merge, no global sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from musicflow_spark.operators.dedup import portable_hash60
from musicflow_spark.operators.fuzzyjoin import fuzzy_pairs_dist1
from musicflow_spark.queries.registry import Query
from musicflow_spark.sources.catalog import read_table

_POW2_60 = float(1 << 60)


# ---------------------------------------------------------------------------
# HLL distinct-count soundness
# ---------------------------------------------------------------------------

def hll_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: HLL++ sketch vs exact, gated at
    5% relative error (+10 absolute slack for tiny groups; the
    configured rsd is 2%).  One shuffle; both aggregates ride the
    same hash aggregation (map-side partial merge for both)."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("hll"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("hll") - F.col("exact_users"))
            <= F.col("exact_users") * 0.05 + F.lit(10)
        ).alias("hll_ok"),
    )


HLL_EVENT_USERS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events,
       TRUE AS hll_ok
FROM events
GROUP BY event_type
"""


def hll_mergeable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch partials (ext): per-day Datasketches HLL
    sketches of distinct users (``hll_sketch_agg``), merged with
    ``hll_union_agg`` into a month total — the incremental pattern a
    100 TB warehouse actually runs (build tiny daily sketches once,
    re-merge on every query instead of rescanning raw events).

    Soundness contract (same oracle pattern as ``hll_distinct_users``):
    the sketch values never leave Spark; the query emits the exact
    recomputable columns plus two gates computed ON Spark —
    ``merge_consistent`` (the merged-daily estimate within 2% of the
    direct whole-range sketch: register merge is max-wise lossless,
    but Datasketches estimates a BUILT sketch with the HIP estimator
    and a UNION with the composite one, so the two agree only to
    sketch accuracy, not bitwise — equality held at sf0.01 purely
    because both stayed in exact sparse mode, and sf0.1 disproved it)
    and ``est_ok`` (the merged estimate within 5% of the exact
    distinct count; lgK=12 gives ~1.6% rsd).  The DuckDB oracle
    recomputes the exact columns and emits literal TRUE for both
    gates."""
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "direct_est"
        ),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # two 1-row frames: the join is a trivial broadcast of scalars
    return merged.join(direct).select(
        "n_days",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= F.col("direct_est") * 0.02
        ).alias("merge_consistent"),
        (
            F.abs(F.col("merged_est") - F.col("exact_users"))
            <= F.col("exact_users") * 0.05
        ).alias("est_ok"),
    )


HLL_MERGEABLE_DAILY_SQL = """
SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(*) AS n_events,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS merge_consistent,
       TRUE AS est_ok
FROM events
"""


# ---------------------------------------------------------------------------
# Approximate-quantile soundness
# ---------------------------------------------------------------------------

def approx_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag approximate median of l_extendedprice
    (percentile_approx, accuracy 10000 => rank error <= n/10000),
    gated by recomputing the returned value's true rank band: rows
    STRICTLY BELOW the sketch's answer must not exceed 52% of the
    group, rows AT-OR-BELOW must reach 48% — the two-sided bound that
    stays sound under arbitrarily heavy ties at the median (a tied
    mass inflates <= but never <).  The gate is the oracle-checkable
    column; the sketch value itself never leaves Spark.

    Plan: one agg for the sketch (tiny result, broadcast back), one
    agg for the rank check — both map-side-combining group-bys."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("m")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("l_extendedprice") <= F.col("m")).cast("long")).alias(
                "_n_le"
            ),
            F.sum((F.col("l_extendedprice") < F.col("m")).cast("long")).alias(
                "_n_lt"
            ),
        )
        .select(
            F.col("l_returnflag").alias("flag"),
            "n_rows",
            (
                (F.col("_n_le") >= F.col("n_rows") * 0.48)
                & (F.col("_n_lt") <= F.col("n_rows") * 0.52)
            ).alias("p50_ok"),
        )
    )


APPROX_MEDIAN_PRICES_SQL = """
SELECT l_returnflag AS flag,
       count(*) AS n_rows,
       TRUE AS p50_ok
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis–Spirakis, portable-hash driven)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100


def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement of 100 orders, selection
    probability proportional to o_totalprice: ES order sampling with
    u = (portable_hash60(o_orderkey)+1)/2^60 in (0,1], rank key
    ln(u)/o_totalprice descending (monotone-equivalent to u^(1/w)).
    Deterministic, engine-portable, and one pass: orderBy+limit
    compiles to TakeOrderedAndProject (per-partition heap + driver
    merge of 100 rows), so no global sort at 100 TB."""
    o = read_table(spark, sf_dir, "orders")
    u = (portable_hash60(F.col("o_orderkey").cast("string")) + 1) / F.lit(_POW2_60)
    key = F.ln(u) / F.col("o_totalprice")
    return (
        o.select("o_orderkey", "o_custkey", key.alias("_es_key"))
        .orderBy(F.desc("_es_key"), "o_orderkey")
        .limit(WEIGHTED_SAMPLE_K)
        .select("o_orderkey", "o_custkey")
    )


WEIGHTED_SAMPLE_ORDERS_SQL = f"""
SELECT o_orderkey, o_custkey
FROM (
  SELECT o_orderkey, o_custkey,
         ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT + 1)
            / 1152921504606846976.0) / o_totalprice AS es_key
  FROM orders
)
ORDER BY es_key DESC, o_orderkey
LIMIT {WEIGHTED_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy join vs its quadratic oracle
# ---------------------------------------------------------------------------

def fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name pairs within edit distance 1 via the
    symmetric-deletion blocked join (operators/fuzzyjoin.py).  The
    oracle is the quadratic levenshtein theta-join — a row-for-row
    match certifies the blocking scheme loses no pairs."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # no output orderBy: the driver's value-hash is order-insensitive,
    # and a global sort on a pairs table is pure shuffle cost at scale
    return fuzzy_pairs_dist1(cust, "c_custkey", "c_name")


FUZZY_CUSTOMER_PAIRS_SQL = """
SELECT a.c_custkey AS id_a,
       b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a
JOIN customer b
  ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters, exact-gated
# ---------------------------------------------------------------------------

CMS_TOPK = 30


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency tier (ext) for the exact
    heavy-hitter miner (``doc_frequent_ngrams``): sketch every token
    occurrence in the corpus into a fixed 4×2048 counter grid
    (operators/cms.py), then certify it against the exact counts of
    the top-30 tokens.

    Soundness contract (HLL-family oracle pattern): the sketch values
    never leave Spark; the query emits the exact recomputable columns
    plus three gates computed ON Spark —

    * ``lower_ok``: estimate ≥ exact count (the CMS guarantee —
      collisions only ever ADD; a false here is an implementation
      bug, not sketch noise),
    * ``eps_ok``: estimate ≤ exact + 8·N/width + 8 (collision mass
      bound; deterministic for the fixed corpus),
    * ``merge_ok``: the union of two half-corpus partial sketches is
      counter-for-counter IDENTICAL to the one-pass sketch (CMS
      merge is exact integer addition, so this is equality, not a
      tolerance — the mergeability that makes the sketch the
      incremental/streaming scale path).

    The DuckDB oracle recomputes the exact columns and emits literal
    TRUE gates.  Scale shape: the grid is ≤ 8192 rows no matter the
    corpus size, so every sketch-side join is a broadcast; the only
    data-scaled shuffles are the token explode's groupBys."""
    from musicflow_spark.operators.cms import (
        CMS_WIDTH,
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from musicflow_spark.operators.textstats import tokens

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )

    sketch = cms_build(toks, "token")
    half_a = cms_build(toks.filter(F.col("doc_id") % 2 == 0), "token")
    half_b = cms_build(toks.filter(F.col("doc_id") % 2 == 1), "token")
    merged = cms_merge(half_a, half_b)

    # counter-exact merge proof: full outer on the grid coordinates,
    # every counter equal (both grids are <= 8192 rows, broadcastable)
    merge_ok = (
        sketch.withColumnRenamed("cnt", "cnt_direct")
        .join(
            # no broadcast hint: Spark can't broadcast-build a full
            # outer join; both grids are <= depth*width rows anyway
            merged.withColumnRenamed("cnt", "cnt_merged"),
            ["row", "bucket"],
            "full_outer",
        )
        .agg(
            F.min(
                F.coalesce(F.col("cnt_direct"), F.lit(-1))
                == F.coalesce(F.col("cnt_merged"), F.lit(-2))
            ).alias("merge_ok")
        )
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_tokens"))

    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(CMS_TOPK)
    )
    est = cms_estimate(top, sketch, "token")
    # 1-row scalar frames: trivial broadcasts (plan-audit allowlisted)
    return (
        est.join(F.broadcast(total))
        .join(F.broadcast(merge_ok))
        .select(
            "token",
            "exact_cnt",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("lower_ok"),
            (
                F.col("cms_est")
                <= F.col("exact_cnt") + F.lit(8.0) * F.col("n_tokens") / CMS_WIDTH + 8
            ).alias("eps_ok"),
            "merge_ok",
        )
    )


CMS_TOKEN_COUNTS_SQL = rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
           AS token
  FROM documents
)
SELECT token, count(*) AS exact_cnt,
       TRUE AS lower_ok, TRUE AS eps_ok, TRUE AS merge_ok
FROM toks
GROUP BY token
ORDER BY exact_cnt DESC, token
LIMIT {CMS_TOPK}
"""


APPROX_TOP_EMIT = 10
APPROX_TOP_TRACK = 50


def approx_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (Datasketches frequent-items) gated against
    the exact heavy hitters: the engine-native sibling of the
    hand-built CMS tier (``cms_token_counts``).

    The sketch tracks up to 10 000 items, far above the corpus vocab,
    so every tracked count is exact; asking it for the top
    ``APPROX_TOP_TRACK`` while emitting only the exact top
    ``APPROX_TOP_EMIT`` keeps rank-boundary ties away from the
    comparison.  Gate (computed ON Spark): each exact top-10 token
    appears in the sketch output with exactly its exact count.  The
    oracle recomputes the exact columns and emits TRUE."""
    from musicflow_spark.operators.textstats import tokens

    docs = read_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    sketch = toks.agg(
        F.map_from_entries(
            F.expr(f"approx_top_k(token, {APPROX_TOP_TRACK})")
        ).alias("mp")
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(APPROX_TOP_EMIT)
    )
    # 1-row sketch frame: trivial broadcast (plan-audit allowlisted)
    return top.join(F.broadcast(sketch)).select(
        "token",
        "exact_cnt",
        (F.col("mp")[F.col("token")] == F.col("exact_cnt")).alias("sketch_ok"),
    )


APPROX_TOP_TOKENS_SQL = rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
           AS token
  FROM documents
)
SELECT token, count(*) AS exact_cnt, TRUE AS sketch_ok
FROM toks
GROUP BY token
ORDER BY exact_cnt DESC, token
LIMIT {APPROX_TOP_EMIT}
"""


QSKETCH_QS_BP = (2500, 5000, 7500, 9000, 9900)


def quantile_sketch_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (ext): per-day fixed-bin integer
    histograms of event value cents, merged into the full-range
    sketch by exact counter addition, quantiles answered from the
    merged grid (operators/qsketch.py) — the third leg of the
    mergeable-sketch family beside HLL distincts
    (``hll_mergeable_daily``) and CMS frequencies
    (``cms_token_counts``).  At 100 TB the per-day partials are
    ≤ 256 counter rows each: quantile queries re-merge tiny state
    instead of rescanning raw events, and the build is one
    map-side-combined groupBy.

    Strongest oracle form in the family: the whole path is integer
    arithmetic (bounds, width, binning, cumulative rank, upper-edge
    estimate), so the DuckDB oracle REPLAYS it — binning the whole
    table directly, which hash-matches the Spark merge-of-daily-
    partials only because histogram merge is exact.  The two
    soundness gates (estimate does not undershoot the target rank;
    true quantile inside the reported bin, error < one bin width) are
    recomputed from raw data on BOTH engines — no literal-TRUE
    shortcut."""
    from musicflow_spark.operators.qsketch import (
        HIST_BINS,
        hist_bounds,
        hist_merge,
        hist_partials,
        hist_quantiles,
        hist_rank_gates,
    )

    ev = (
        read_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(F.col("cents").isNotNull())
    )
    bounds = hist_bounds(ev, "cents")
    daily = hist_partials(ev, "cents", bounds, HIST_BINS, part_cols=("day",))
    merged = hist_merge(daily)
    qs = hist_quantiles(merged, bounds, QSKETCH_QS_BP, HIST_BINS)
    return hist_rank_gates(ev, "cents", qs)


QUANTILE_SKETCH_DAILY_SQL = f"""
WITH vals AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
bw AS (
  SELECT lo, hi, n, (hi - lo) // 256 + 1 AS w
  FROM (SELECT min(cents) AS lo, max(cents) AS hi, count(*) AS n FROM vals)
),
hist AS (
  SELECT (v.cents - bw.lo) // bw.w AS bin, count(*) AS cnt
  FROM vals v, bw GROUP BY 1
),
cum AS (
  SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist
),
tgt AS (
  SELECT q.q_bp,
         (q.q_bp * bw.n + 9999) // 10000 AS target_rank,
         bw.lo, bw.w
  FROM (SELECT unnest({list(QSKETCH_QS_BP)}) AS q_bp) q, bw
),
est AS (
  SELECT t.q_bp,
         CAST(t.target_rank AS BIGINT) AS target_rank,
         CAST(t.lo + (min(c.bin) + 1) * t.w - 1 AS BIGINT) AS est,
         t.w
  FROM tgt t JOIN cum c ON c.cum >= t.target_rank
  GROUP BY t.q_bp, t.target_rank, t.lo, t.w
)
SELECT e.q_bp,
       e.target_rank,
       e.est,
       sum(CASE WHEN v.cents <= e.est THEN 1 ELSE 0 END) >= e.target_rank
         AS rank_ok,
       sum(CASE WHEN v.cents <= e.est - e.w THEN 1 ELSE 0 END) < e.target_rank
         AS bin_ok
FROM est e, vals v
GROUP BY e.q_bp, e.target_rank, e.est, e.w
"""


def event_type_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile sketch (ext): per-event-type quantiles over
    the SHARED global grid — one (lo, w) definition so per-group,
    per-day, per-source partials all merge and compare on the same
    bins, the design that lets a 100 TB warehouse keep one histogram
    layout across every slice.  Same all-integer oracle-replay
    contract as ``quantile_sketch_daily``, with per-group target
    ranks taken from the sketch's own counter sums and both
    soundness gates recomputed per group from raw data on both
    engines."""
    from musicflow_spark.operators.qsketch import (
        HIST_BINS,
        hist_bounds,
        hist_partials,
        hist_quantiles,
        hist_rank_gates,
    )

    ev = (
        read_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .filter(F.col("cents").isNotNull() & F.col("event_type").isNotNull())
    )
    bounds = hist_bounds(ev, "cents")
    sk = hist_partials(ev, "cents", bounds, HIST_BINS, part_cols=("event_type",))
    qs = hist_quantiles(
        sk, bounds, (5000, 9000), HIST_BINS, group_cols=("event_type",)
    )
    return hist_rank_gates(ev, "cents", qs, group_cols=("event_type",))


EVENT_TYPE_QUANTILES_SQL = """
WITH vals AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
bw AS (
  SELECT lo, hi, (hi - lo) // 256 + 1 AS w
  FROM (SELECT min(cents) AS lo, max(cents) AS hi FROM vals)
),
hist AS (
  SELECT event_type, (v.cents - bw.lo) // bw.w AS bin, count(*) AS cnt
  FROM vals v, bw GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n_grp
  FROM hist
),
tgt AS (
  SELECT c.event_type, q.q_bp,
         (q.q_bp * c.n_grp + 9999) // 10000 AS target_rank,
         bw.lo, bw.w, c.bin, c.cum
  FROM cum c, (SELECT unnest([5000, 9000]) AS q_bp) q, bw
),
est AS (
  SELECT event_type, q_bp,
         CAST(target_rank AS BIGINT) AS target_rank,
         CAST(lo + (min(CASE WHEN cum >= target_rank THEN bin END) + 1) * w - 1
              AS BIGINT) AS est,
         w
  FROM tgt GROUP BY event_type, q_bp, target_rank, lo, w
)
SELECT e.event_type,
       e.q_bp,
       e.target_rank,
       e.est,
       sum(CASE WHEN v.cents <= e.est THEN 1 ELSE 0 END) >= e.target_rank
         AS rank_ok,
       sum(CASE WHEN v.cents <= e.est - e.w THEN 1 ELSE 0 END) < e.target_rank
         AS bin_ok
FROM est e JOIN vals v ON v.event_type = e.event_type
GROUP BY e.event_type, e.q_bp, e.target_rank, e.est, e.w
"""


# ---------------------------------------------------------------------------
# Theta set-operation sketch + KLL quantile sketch (Spark 4 Datasketches)
# ---------------------------------------------------------------------------

def theta_year_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra (ext): the sketch family's missing
    operation.  HLL answers |A| and |A ∪ B| but CANNOT intersect or
    subtract; the theta sketch keeps a hash sample per set, so
    |A ∩ B| and |A \\ B| come from the SKETCHES — at 100 TB that
    means per-cohort sketches built once, then arbitrary audience
    overlap/churn questions answered sketch-side with no re-scan.

    A = custkeys ordering in 1994, B = in 1995 (genuinely
    overlapping sets).  One pass builds both sketches
    (conditional ``theta_sketch_agg``); union/intersection/
    difference estimates gate against the exact counts computed in
    the same query (est within 5% + 10 absolute — intersections
    amplify relative error, and below ~4k entries the sketch is in
    exact mode anyway).  Oracle: exact columns + literal-TRUE gates,
    the HLL-mergeable pattern."""
    yr = F.year("o_orderdate")
    ords = read_table(spark, sf_dir, "orders").select(
        "o_custkey", yr.alias("yr")
    ).filter(F.col("yr").isin(1994, 1995))
    sk = ords.agg(
        F.theta_sketch_agg(F.when(F.col("yr") == 1994, F.col("o_custkey"))).alias("ska"),
        F.theta_sketch_agg(F.when(F.col("yr") == 1995, F.col("o_custkey"))).alias("skb"),
    )
    ests = sk.select(
        F.theta_sketch_estimate(F.theta_union(F.col("ska"), F.col("skb"))).alias("union_est"),
        F.theta_sketch_estimate(F.theta_intersection(F.col("ska"), F.col("skb"))).alias("inter_est"),
        F.theta_sketch_estimate(F.theta_difference(F.col("ska"), F.col("skb"))).alias("diff_est"),
    )
    per_cust = ords.groupBy("o_custkey").agg(
        F.max(F.col("yr") == 1994).alias("in_a"),
        F.max(F.col("yr") == 1995).alias("in_b"),
    )
    exact = per_cust.agg(
        F.count(F.lit(1)).alias("union_n"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("inter_n"),
        F.sum((F.col("in_a") & ~F.col("in_b")).cast("long")).alias("diff_n"),
    )

    def gate(est: str, n: str) -> F.Column:
        return F.abs(F.col(est) - F.col(n)) <= F.col(n) * 0.05 + F.lit(10)

    # 1-row x 1-row scalar join (broadcast by construction)
    return ests.join(exact).select(
        "union_n",
        "inter_n",
        "diff_n",
        gate("union_est", "union_n").alias("union_ok"),
        gate("inter_est", "inter_n").alias("inter_ok"),
        gate("diff_est", "diff_n").alias("diff_ok"),
    )


THETA_YEAR_OVERLAP_SQL = """
WITH pc AS (
  SELECT o_custkey,
         max(CASE WHEN year(o_orderdate) = 1994 THEN 1 ELSE 0 END) = 1 AS in_a,
         max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) = 1 AS in_b
  FROM orders
  WHERE year(o_orderdate) IN (1994, 1995)
  GROUP BY o_custkey)
SELECT count(*) AS union_n,
       CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS inter_n,
       CAST(sum(CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END) AS BIGINT) AS diff_n,
       TRUE AS union_ok, TRUE AS inter_ok, TRUE AS diff_ok
FROM pc
"""


def kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch (ext): the library tier beside the
    hand-built fixed-bin histogram (operators/qsketch.py) — KLL has
    provable NORMALIZED-RANK error (~1.65% two-sided at the default
    k=200) independent of the value domain, where the histogram's
    error is one bin width.  Same deployment shape: per-day
    ``kll_sketch_agg_bigint`` partials over event-value cents, one
    ``kll_merge_agg_bigint`` re-merge, quantiles read from the
    merged sketch.

    Soundness gates recomputed from raw data per quantile q (the
    hist_rank_gates pattern, two-sided and tie-safe): count(v < est)
    must not exceed (q + eps)·N and count(v <= est) must reach
    (q - eps)·N, eps = 2%.  Oracle: exact counts + literal-TRUE
    gates."""
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        # cast-to-long truncates toward zero, matching DuckDB trunc()
        (F.col("value") * 1000).cast("long").alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.kll_sketch_agg_bigint("cents").alias("sk"))
    merged = daily.agg(F.kll_merge_agg_bigint("sk").alias("sk"))
    qs = merged.select(
        F.expr(
            "stack(3, 5000, kll_sketch_get_quantile_bigint(sk, 0.50),"
            " 9000, kll_sketch_get_quantile_bigint(sk, 0.90),"
            " 9900, kll_sketch_get_quantile_bigint(sk, 0.99)) as (q_bp, est)"
        )
    )
    v = F.col("cents")
    gates = ev.join(F.broadcast(qs)).groupBy("q_bp").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((v < F.col("est")).cast("long")).alias("n_lt"),
        F.sum((v <= F.col("est")).cast("long")).alias("n_le"),
    )
    # n_lt/n_le are measured against the SKETCH's estimate, so they
    # are not oracle-portable (the exact engine has no KLL); only the
    # exact row count and the rank gates leave the query
    eps_bp = 200  # 2% in basis points
    return gates.select(
        "q_bp",
        "n_events",
        (
            (F.col("n_le") * 10000 >= F.col("n_events") * (F.col("q_bp") - F.lit(eps_bp)))
            & (F.col("n_lt") * 10000 <= F.col("n_events") * (F.col("q_bp") + F.lit(eps_bp)))
        ).alias("rank_ok"),
    )


KLL_VALUE_QUANTILES_SQL = """
SELECT q_bp, count(*) AS n_events, TRUE AS rank_ok
FROM events, (SELECT unnest([5000, 9000, 9900]) AS q_bp) qs
GROUP BY q_bp
"""


QUERIES = [
    Query(
        "hll_distinct_users",
        "ext: HLL++ distinct-count sketch, exact-gated",
        hll_event_users,
        HLL_EVENT_USERS_SQL,
    ),
    Query(
        "hll_mergeable_daily",
        "ext: mergeable HLL partials (hll_sketch_agg/hll_union_agg)",
        hll_mergeable_daily,
        HLL_MERGEABLE_DAILY_SQL,
    ),
    Query(
        "approx_median_prices",
        "ext: quantile sketch, rank-soundness gated",
        approx_median_prices,
        APPROX_MEDIAN_PRICES_SQL,
    ),
    Query(
        "weighted_sample_orders",
        "ext: ES weighted sampling, portable-hash deterministic",
        weighted_sample_orders,
        WEIGHTED_SAMPLE_ORDERS_SQL,
    ),
    Query(
        "approx_top_tokens",
        "ext: approx_top_k frequent-items sketch, exact-gated",
        approx_top_tokens,
        APPROX_TOP_TOKENS_SQL,
    ),
    Query(
        "cms_token_counts",
        "ext: count-min sketch frequency tier, merge- and bound-gated",
        cms_token_counts,
        CMS_TOKEN_COUNTS_SQL,
    ),
    Query(
        "quantile_sketch_daily",
        "ext: mergeable fixed-bin quantile histogram, oracle-replayed",
        quantile_sketch_daily,
        QUANTILE_SKETCH_DAILY_SQL,
    ),
    Query(
        "event_type_quantiles",
        "ext: grouped quantile sketch on a shared global grid",
        event_type_quantiles,
        EVENT_TYPE_QUANTILES_SQL,
    ),
    Query(
        "theta_year_overlap",
        "ext: theta-sketch set algebra (union/intersection/difference), exact-gated",
        theta_year_overlap,
        THETA_YEAR_OVERLAP_SQL,
    ),
    Query(
        "kll_value_quantiles",
        "ext: KLL quantile sketch (daily partials + merge), rank-gated",
        kll_value_quantiles,
        KLL_VALUE_QUANTILES_SQL,
    ),
    Query(
        "fuzzy_customer_pairs",
        "ext: blocked edit-distance join == quadratic theta-join; J8",
        fuzzy_customer_pairs,
        FUZZY_CUSTOMER_PAIRS_SQL,
        bench=True,
    ),
]
