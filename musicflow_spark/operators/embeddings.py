"""Embedding-matrix statistics and PCA projection — the whitening /
dimensionality-reduction step of an embedding-heavy training-data
pipeline (SemDeDup-style clustering, ANN index prep, drift monitoring
all start from the corpus covariance).

Two Gram/covariance paths with one contract:

- ``gram_moments_exact`` quantizes each coordinate to an integer grid
  (round(x * scale)) and aggregates integer products — bit-exact,
  order-independent, oracle-replayable in SQL.  Shape: a double
  posexplode of the same quantized array (d^2 fan-out per row, no
  join, no row id) into one (i, j)-keyed sum.  That d^2-per-row
  blow-up is the certification tier, not the 100 TB tier.
- ``gram_moments_fast`` computes a d x d numpy Gram per Arrow batch
  inside ``mapInPandas`` and sums the partials — the classic
  tree-aggregate: the shuffle carries only d^2 floats per partition,
  independent of row count.  Float summation order varies with
  partitioning, so this tier is approximate-to-ulp; tests pin it to
  the exact tier at 1e-6 relative.

``pca_project`` eigendecomposes the (tiny, d x d) covariance on the
driver — the only driver-side step, bounded by d^2 not rows — and
projects with native per-component dot folds (no Python in the row
path).

Integer-overflow headroom for the exact tier: |round(x*scale)| <= M
means each product is <= M^2 and a LONG sum holds ~9.2e18 / M^2 rows
(scale=1000, |x|<=8 -> M=8000 -> ~1.4e11 rows per (i,j) cell).  Past
that, sum as DECIMAL(38,0) (both engines aggregate decimals exactly)
or pre-aggregate per shard.

Reference parity: MusicFlow has no embedding layer — this module is
part of the training-data extension surface (SURVEY §2 "ext").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from musicflow_spark.operators.similarity import dot

#: default quantization grid: 3 decimal digits of each coordinate
DEFAULT_SCALE = 1000


def quantized(vec: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """array<long> integer grid of an array<float> column:
    round(x * scale) per element, half away from zero on both engines
    (Spark BigDecimal HALF_UP == DuckDB round).  Agreement requires
    the float->DOUBLE cast to happen BEFORE the scale multiply on
    both sides — a float32-arithmetic product rounds differently at
    .5 boundaries, so an oracle replay must write
    ``round(CAST(x AS DOUBLE) * scale)``, never ``round(x * scale)``
    on a FLOAT column."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def gram_moments_exact(
    df: DataFrame, vec_col: str, *, scale: int = DEFAULT_SCALE
) -> DataFrame:
    """Exact integer second-moment table: one row per dimension pair
    (i, j) with ``n`` vectors, ``sum_qi`` (Σ q_i over rows) and
    ``sum_qij`` (Σ q_i q_j) on the quantized grid — everything a
    covariance needs, in exact integer space.  Emits i <= j (the
    matrix is symmetric).  Column ``i``/``j`` are 0-based positions."""
    q = df.select(quantized(vec_col, scale).alias("__q__"))
    pairs = (
        q.select(F.posexplode("__q__").alias("i", "qi"), "__q__")
        .select("i", "qi", F.posexplode("__q__").alias("j", "qj"))
        .filter(F.col("i") <= F.col("j"))
    )
    return pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qi").alias("sum_qi"),
        F.sum("qj").alias("sum_qj"),
        F.sum(F.col("qi") * F.col("qj")).alias("sum_qij"),
    )


def gram_moments_fast(df: DataFrame, vec_col: str) -> DataFrame:
    """d x d float Gram + per-dim sums via per-batch numpy matmul and
    a d^2-row final sum — the scale path: the shuffle after the scan
    carries one partial matrix per Arrow batch, never the rows.
    Output schema matches ``gram_moments_exact`` (i <= j) with DOUBLE
    sums over the RAW (unquantized) values."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # rows x d; accumulate in float64 — Arrow hands float32
            # arrays over for array<float> columns, and a float32 Gram
            # loses ~3 digits before the merge even starts
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = m.T @ m
            s = m.sum(axis=0)
            d = m.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu,
                    "j": ju,
                    "n": np.full(len(iu), len(pdf), dtype="int64"),
                    "sum_xi": s[iu],
                    "sum_xj": s[ju],
                    "sum_xij": g[iu, ju],
                }
            )

    schema = "i int, j int, n long, sum_xi double, sum_xj double, sum_xij double"
    partials = df.select(vec_col).mapInPandas(partial, schema)
    return partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sum_xi").alias("sum_xi"),
        F.sum("sum_xj").alias("sum_xj"),
        F.sum("sum_xij").alias("sum_xij"),
    )


def covariance_matrix(moments: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """Dense d x d covariance + mean vector + row count from a
    ``gram_moments_fast`` frame — driver-side, bounded by d^2 (the
    one intentional collect)."""
    rows = moments.collect()
    if not rows:
        raise ValueError("no moment rows: input frame is empty")
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    if n < 2:
        raise ValueError(f"covariance needs >= 2 vectors, got {n}")
    cov = np.zeros((d, d))
    mean = np.zeros(d)
    for r in rows:
        c = (r["sum_xij"] - r["sum_xi"] * r["sum_xj"] / n) / (n - 1)
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = c
        if r["i"] == r["j"]:
            mean[r["i"]] = r["sum_xi"] / n
    return cov, mean, n


def pca_components(
    df: DataFrame, vec_col: str, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(top-k principal axes as rows, their eigenvalues descending,
    the mean vector).  Deterministic up to sign; sign is fixed so
    each component's largest-|coordinate| entry is positive."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cov, mean, _ = covariance_matrix(gram_moments_fast(df, vec_col))
    if k > cov.shape[0]:
        raise ValueError(f"k={k} exceeds embedding dim {cov.shape[0]}")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1
    return comps, vals[order], mean


def pca_project(
    df: DataFrame,
    vec_col: str,
    k: int,
    *,
    out_col: str = "pca",
    basis: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Append an array<double> column of the k leading principal
    components' centered scores ((x - mean) . v).  The d x k basis
    broadcasts as literals with the mean offset folded into a
    per-component constant; each score is a native zip_with/aggregate
    dot fold — zero Python in the row path, one extra map stage in
    the plan.  Pass ``basis`` (the :func:`pca_components` triple) to
    reuse an already-computed decomposition instead of re-scanning."""
    comps, _, mean = basis if basis is not None else pca_components(df, vec_col, k)
    if k > len(comps):
        raise ValueError(f"k={k} exceeds the {len(comps)}-component basis")
    comps = comps[:k]
    scores = [
        dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in comp]))
        - F.lit(float(np.dot(mean, comp)))
        for comp in comps
    ]
    return df.withColumn(out_col, F.array(*scores))
