"""Skew-handling primitives (100 TB hygiene, SURVEY §7.8).

AQE's skew-join splitting handles most shuffle skew at runtime
(session.py enables it); these helpers cover the two cases AQE does
not:

- **Salted aggregation**: a groupBy where one key holds a large share
  of all rows hot-spots a single reducer.  Two-phase aggregation
  (partial per salt, then final) bounds any reducer's share to 1/S of
  the hot key.  Only ALGEBRAIC aggregates compose this way (sum,
  count, min, max: re-aggregatable partials).
- **Salted broadcast-fallback join**: a fact⋈fact equi-join whose key
  histogram is dominated by a handful of values; the hot keys' rows
  are salted S-ways on the big side and replicated S-ways on the
  other side, the long tail joins normally, results union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) with two-phase salting:
    partial aggregate on (keys, salt), final on keys.  The extra
    exchange is tiny (one row per key per salt), and no reducer ever
    sees more than ~1/n_salts of a hot key's rows.

    Equivalent result to the direct aggregation — use when a key's
    frequency is orders of magnitude above the median and the
    map-side partial aggregation alone leaves reducer skew."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt__")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "__salt__")
        .agg(
            F.sum(value_col).alias("__psum__"),
            F.count(F.lit(1)).alias("__pcnt__"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum__").alias(f"sum_{value_col}"),
        F.sum("__pcnt__").alias("cnt"),
    )


def hot_keys(df: DataFrame, key: str, min_share: float = 0.01) -> DataFrame:
    """Keys holding more than ``min_share`` of all rows — one
    aggregate pass; the result is dimension-sized by definition."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") >= total * min_share)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    hot: DataFrame | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed: hot-key
    rows are salted on the big side and replicated n_salts-ways on the
    other side; the long tail joins on the bare key.  ``hot`` defaults
    to ``hot_keys(big, key)``; pass it explicitly when the histogram
    is known (e.g. from table stats) to skip the counting pass.

    Works for inner and left joins of the big side."""
    hot = hot if hot is not None else hot_keys(big, key)
    hot = F.broadcast(hot.select(key))

    big_hot = big.join(hot, key, "left_semi").withColumn(
        "__salt__", (F.rand(seed=7) * n_salts).cast("int")
    )
    big_tail = big.join(hot, key, "left_anti").withColumn("__salt__", F.lit(-1))

    other_hot = (
        other.join(hot, key, "left_semi")
        .withColumn("__salt__", F.explode(F.array(*[F.lit(s) for s in range(n_salts)])))
    )
    other_tail = other.join(hot, key, "left_anti").withColumn("__salt__", F.lit(-1))

    joined_hot = big_hot.join(other_hot, [key, "__salt__"], how)
    joined_tail = big_tail.join(other_tail, [key, "__salt__"], how)
    return joined_hot.unionByName(joined_tail).drop("__salt__")


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column | str],
    k: int,
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Per-key top-k without a hot-key sort: a direct
    ``row_number() OVER (PARTITION BY keys ORDER BY ...)`` sorts every
    row of the hottest key in ONE task — the classic last-reducer
    stall when a key holds millions of rows.  Two phases fix it:
    rank within (keys, salt) and keep k per salt (any single task now
    sorts ~1/n_salts of the hot key), then rank the ≤ k·n_salts
    survivors per key.  Every global top-k row is necessarily inside
    its salt's top-k, so the result is EXACTLY the direct window's —
    provided ``order_cols`` is a total order (pass a full tiebreak
    chain; float ties are the caller's hazard).

    The salt is a deterministic hash of ``salt_on`` (default: ALL
    input columns — row-varying by construction), so retries re-salt
    identically; correctness holds under ANY row partition,
    determinism of the salt just keeps stage retries byte-stable
    (the datasource sink precondition)."""
    # ADVICE r06: withColumn would silently OVERWRITE a pre-existing
    # 'rank' / internal column instead of ranking next to it
    taken = {"rank", "__salt__", "__pr__"} & set(df.columns)
    if taken:
        raise ValueError(
            f"salted_topk output columns collide with input columns "
            f"{sorted(taken)}; rename them before calling"
        )
    salt_cols = salt_on if salt_on is not None else list(df.columns)
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).alias("__salt__")
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w_part = Window.partitionBy(*keys, "__salt__").orderBy(*order)
    w_final = Window.partitionBy(*keys).orderBy(*order)
    survivors = (
        df.select("*", salt)
        .withColumn("__pr__", F.row_number().over(w_part))
        .filter(F.col("__pr__") <= k)
        .drop("__salt__", "__pr__")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
    )
