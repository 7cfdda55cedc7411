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


def _list_col_to_2d(arr, n: int, dim: int, dtype):
    """(n, dim) numpy view of an Arrow list column of equal-length,
    null-free numeric lists.  ``flatten()`` hands back the values
    buffer (offset-aware, no per-row Python objects); the reshape
    fails loudly on ragged input.  The previous ``to_pylist()`` path
    built n Python lists per batch and dominated every kernel profile
    (guide §4.2 — keep the boundary columnar)."""
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, dim)


def _pairwise_d2(qv, cvs_t, c2):
    """Exact int64 squared-distance matrix via the expansion
    |q|^2 - 2 q·c + |c|^2.  numpy int64 arithmetic wraps mod 2^64
    (same ring as Java long), and the expansion is an algebraic
    identity in that ring, so the result is bit-identical to the
    direct ``((q - c) ** 2).sum(-1)`` — including under overflow —
    while avoiding the n·k·dim broadcast temporary (measured 21x on
    a 10k x 8 x 64 batch).  ``cvs_t`` is the (dim, k) transposed
    centroid matrix, ``c2`` its per-centroid squared norms."""
    q2 = (qv * qv).sum(axis=1)
    return q2[:, None] - 2 * (qv @ cvs_t) + c2[None, :]


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


def pca2_scores_closed_form(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, int] = (0, 1),
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Fully hash-checkable PCA: centered scores on BOTH principal
    axes of the 2-D sub-embedding at ``dims``, with the 2x2
    eigendecomposition done in CLOSED FORM (quadratic formula) so the
    whole projection — moments, eigenvalues, eigenvectors, scores —
    is one declarative plan with a line-for-line DuckDB replay
    (VERDICT r06 item 2: retire the rows-only d=24 grey row).

    Exactness contract: coordinates quantize to the integer grid
    (:func:`quantized`), so the second moments are exact BIGINT sums
    and the covariance NUMERATORS ``A = n*Sxx - Sx^2`` etc. are exact
    integers on both engines.  Everything after that is IEEE-754
    binary64 with the SAME operation tree on both sides (+ - * /
    sqrt are all correctly rounded, so bit-identical given identical
    inputs); scores are portably rounded to 6 dp and ``+ 0.0`` folds
    a rounded ``-0.0`` to ``+0.0`` before hashing.

    Conventions (mirrored verbatim in the oracle):

    - eigenvector of the LARGER eigenvalue L1 is ``(B, L1 - A)``
      (nonzero whenever B != 0, since then L1 > max(A, C)); when
      B == 0 the matrix is diagonal and the axes are coordinate axes
      ordered by variance (ties keep dim order);
    - each unit axis is sign-fixed so its largest-|coordinate| entry
      is positive (``>=`` tie goes to the first coordinate);
    - the second axis is the quarter-turn ``(-u1y, u1x)`` under the
      same sign fix — orthonormality by construction.

    Scale shape: one map-side-combinable 6-sum aggregate over the
    corpus, a 1-row broadcast crossJoin back, then a pure map stage —
    no window, no second shuffle.  Overflow headroom: ``n * Sxx`` <=
    n^2 * M^2 must stay under 2^63; with scale=1000 and |x| <= 8
    (M = 8000) that holds to ~380M rows per job — past that,
    aggregate the moments as DECIMAL(38,0) exactly as
    :func:`gram_moments_exact` documents."""
    i, j = dims
    q = quantized(vec_col, scale)
    pts = df.select(
        F.col(id_col), q[i].alias("qx"), q[j].alias("qy")
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qy") * F.col("qy")).alias("syy"),
    )
    n = F.col("n")
    big = pts.crossJoin(F.broadcast(m))
    # exact-integer covariance numerators (the n(n-1) denominator and
    # the grid scale only rescale eigenvalues, never eigenvectors)
    big = (
        big.withColumn("A", n * F.col("sxx") - F.col("sx") * F.col("sx"))
        .withColumn("B", n * F.col("sxy") - F.col("sx") * F.col("sy"))
        .withColumn("C", n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    ad, bd, cd = (F.col(c).cast("double") for c in ("A", "B", "C"))
    disc = F.sqrt((ad - cd) * (ad - cd) + F.lit(4.0) * bd * bd)
    l1 = ((ad + cd) + disc) / F.lit(2.0)
    diag = F.col("B") == 0
    wx = F.when(diag, F.when(F.col("A") >= F.col("C"), 1.0).otherwise(0.0)).otherwise(bd)
    wy = F.when(diag, F.when(F.col("A") >= F.col("C"), 0.0).otherwise(1.0)).otherwise(l1 - ad)
    nrm = F.sqrt(wx * wx + wy * wy)
    ux, uy = wx / nrm, wy / nrm

    def signfix(x: Column, y: Column) -> tuple[Column, Column]:
        pivot = F.when(F.abs(x) >= F.abs(y), x).otherwise(y)
        s = F.when(pivot < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        return s * x, s * y

    u1x, u1y = signfix(ux, uy)
    u2x, u2y = signfix(-uy, ux)
    cx = (n * F.col("qx") - F.col("sx")).cast("double")
    cy = (n * F.col("qy") - F.col("sy")).cast("double")
    den = (n * F.lit(scale).cast("long")).cast("double")
    pc1 = (cx * u1x + cy * u1y) / den
    pc2 = (cx * u2x + cy * u2y) / den
    six = F.lit(1000000.0)
    return big.select(
        F.col(id_col),
        (F.round(pc1 * six, 0) / six + F.lit(0.0)).alias("pc1"),
        (F.round(pc2 * six, 0) / six + F.lit(0.0)).alias("pc2"),
    )


# --------------------------------------------------------------- k-means
def kmeans_lloyd(
    df: DataFrame,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Lloyd's k-means on the integer grid, exactly replayable: the
    vectors are quantized (``quantized``, round(x·scale)), centroids
    stay integer via element-wise truncated (toward-zero) integer
    mean (``sum div count`` — Spark's div and DuckDB's // both truncate
    toward zero, NOT floor, for negative sums; ADVICE r06), and
    assignment is argmin of INTEGER squared L2 with cluster-id
    tiebreak — every operation is engine-portable integer arithmetic,
    so a DuckDB oracle unrolling the same ``n_iter`` rounds
    (``kmeans_oracle_sql``) matches bit-for-bit, iteration by
    iteration.  Empty clusters drop out (standard Lloyd degeneracy) —
    deterministically on both engines.

    Returns the final assignment (id_col, cluster_id, d2) against the
    post-iteration centroids.

    Scale shape per iteration: assignment is a k-row broadcast
    crossJoin (centroid table ≤ k rows by construction — the PQ
    codebook contract) + a per-row argmin window keyed on the vector
    id; the update is one posexplode → groupBy(cluster, dim) partial
    agg — shuffle rows bounded by k·dim, never by the corpus.
    Centroids are localCheckpointed per round (flat lineage, the
    pagerank pattern).  Seeds are the k lowest-id vectors, fetched
    with a bounded k-row collect (same contract as the PQ seed
    codebook, operators/similarity.py::_pq_encode_parts).
    """
    q, cent = _kmeans_fit(df, k, n_iter, id_col, vec_col, scale)
    return _kmeans_assign(q, cent).select(
        F.col("id").alias(id_col), F.col("cid").alias("cluster_id"), "d2"
    )


def _kmeans_assign(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """Integer-L2 argmin of quantized vectors against the (≤ k-row by
    the codebook contract) centroid table, cluster-id tiebreak.

    Dispatches to the Arrow int64 kernel (``kmeans_assign_arrow``) —
    the native Catalyst fold (``_kmeans_assign_native``) evaluates the
    per-(row, centroid) distance through interpreted higher-order-
    function lambdas, which the x100 isolation showed is THE dominant
    constant of every trained tier (knn_opq cold 270 s post-encode-fix;
    ~2e8 interpreted lambda steps at 200k rows × 16 centroids × 2
    iters; VERDICT r10 item 2).  The centroid collect here is the same
    bounded k-row collect `_kmeans_fit` already performs for seeding.
    Assignments are asserted bit-identical row-for-row against the
    native fold in tests/test_embeddings.py."""
    rows = sorted(centroids.collect(), key=lambda r: int(r["cid"]))
    if not rows:
        return _kmeans_assign_native(q, centroids)
    return kmeans_assign_arrow(q, [(int(r["cid"]), list(r["cv"])) for r in rows])


def _kmeans_assign_native(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """Catalyst-expression twin of :func:`kmeans_assign_arrow` — the
    proven-portable fold the DuckDB oracle replays; kept as the
    bit-identity reference for the Arrow tier."""
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = q.crossJoin(F.broadcast(centroids)).select("id", "cid", d2.alias("d2"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("d2", "cid")
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def kmeans_assign_arrow(
    q: DataFrame, cent_rows: list[tuple[int, list[int]]]
) -> DataFrame:
    """Arrow compute tier of the k-means ASSIGN stage — IDENTICAL
    (id, cid, d2) rows to ``_kmeans_assign_native``, faster kernel.

    The quantization already happened on the JVM (``quantized`` — the
    cross-engine-sensitive float→grid rounding never touches Python);
    this kernel does only exact int64 subtract/square/sum/argmin per
    Arrow batch in numpy.  int64 addition is mod-2^64 like Java long,
    so even overflow wraps identically, and ``np.argmin`` takes the
    FIRST minimum while ``cent_rows`` is sorted by cid ascending —
    exactly the (d2, cid) lexicographic tie rule of the native window.
    The id column is passed through as raw Arrow (any id type
    survives untouched).  Map-only stage: no shuffle, no driver data.
    """
    import pyarrow as pa

    if not cent_rows:
        raise ValueError("cent_rows must be non-empty")
    cids_sorted = [c for c, _ in cent_rows]
    if cids_sorted != sorted(cids_sorted):
        raise ValueError("cent_rows must be sorted by cid ascending")
    dim = len(cent_rows[0][1])
    if any(len(v) != dim for _, v in cent_rows):
        raise ValueError("ragged centroid table")
    cids = np.asarray(cids_sorted, dtype=np.int32)
    cvs = np.asarray([v for _, v in cent_rows], dtype=np.int64)
    cvs_t = cvs.T.copy()
    c2 = (cvs * cvs).sum(axis=1)

    q = q.select("id", "qv")
    id_type = q.schema["id"].dataType.simpleString()
    out_schema = f"id {id_type}, cid int, d2 long"

    def run(batches):
        import numpy as _np
        import pyarrow as _pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            qv = _list_col_to_2d(batch.column(1), n, dim, _np.int64)
            d2 = _pairwise_d2(qv, cvs_t, c2)
            pos = _np.argmin(d2, axis=1)
            yield _pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    _pa.array(cids[pos], type=_pa.int32()),
                    _pa.array(d2[_np.arange(n), pos], type=_pa.int64()),
                ],
                names=["id", "cid", "d2"],
            )

    return q.mapInArrow(run, out_schema)


def kmeans_rank_arrow(
    q: DataFrame, cent_rows: list[tuple[int, list[int]]], n_best: int
) -> DataFrame:
    """Top-``n_best`` centroids per vector by (d2, cid) — the PROBE
    form of :func:`kmeans_assign_arrow` (an IVF query probes its
    ``n_probe`` nearest clusters, not just the argmin).  Emits
    (id, cid, d2, rn) with rn 1-based, IDENTICAL to ranking the
    native fold with ``row_number() OVER (PARTITION BY id ORDER BY
    d2, cid)`` and keeping rn <= n_best: a STABLE argsort on the
    int64 distance row preserves cid-ascending order among ties —
    the same lexicographic rule.  Same exactness contract as the
    assign tier (JVM quantization, exact int64 kernel)."""
    import pyarrow as pa

    if n_best < 1:
        raise ValueError(f"n_best must be >= 1, got {n_best}")
    if not cent_rows:
        raise ValueError("cent_rows must be non-empty")
    cids_sorted = [c for c, _ in cent_rows]
    if cids_sorted != sorted(cids_sorted):
        raise ValueError("cent_rows must be sorted by cid ascending")
    dim = len(cent_rows[0][1])
    if any(len(v) != dim for _, v in cent_rows):
        raise ValueError("ragged centroid table")
    cids = np.asarray(cids_sorted, dtype=np.int32)
    cvs = np.asarray([v for _, v in cent_rows], dtype=np.int64)
    cvs_t = cvs.T.copy()
    c2 = (cvs * cvs).sum(axis=1)
    nb = min(n_best, len(cent_rows))

    q = q.select("id", "qv")
    id_type = q.schema["id"].dataType.simpleString()
    out_schema = f"id {id_type}, cid int, d2 long, rn int"

    def run(batches):
        import numpy as _np
        import pyarrow as _pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            qv = _list_col_to_2d(batch.column(1), n, dim, _np.int64)
            d2 = _pairwise_d2(qv, cvs_t, c2)
            sel = _np.argsort(d2, axis=1, kind="stable")[:, :nb]
            rep = _pa.array(_np.repeat(_np.arange(n), nb), type=_pa.int64())
            yield _pa.RecordBatch.from_arrays(
                [
                    batch.column(0).take(rep),
                    _pa.array(cids[sel].ravel(), type=_pa.int32()),
                    _pa.array(
                        _np.take_along_axis(d2, sel, axis=1).ravel(),
                        type=_pa.int64(),
                    ),
                    _pa.array(
                        _np.tile(_np.arange(1, nb + 1, dtype=_np.int32), n),
                        type=_pa.int32(),
                    ),
                ],
                names=["id", "cid", "d2", "rn"],
            )

    return q.mapInArrow(run, out_schema)


def kmeans_update_arrow(
    q: DataFrame, cent_rows: list[tuple[int, list[int]]]
) -> DataFrame:
    """FUSED assign + map-side partial-sum stage of one Lloyd round:
    per Arrow batch, argmin-assign each vector (same exact int64
    kernel and (d2, cid) tie rule as ``kmeans_assign_arrow``), then
    emit per-cluster PARTIAL sums — (cid, pos, s=Σval, c=rows) rows,
    at most k·dim per batch.  The caller reduces the partials with
    ``sum(s) div sum(c)``, which equals the direct
    ``sum(val) div count(*)`` of the exploded form bit-for-bit:
    int64 partial sums wrap mod 2^64 exactly like Java long, and
    addition is associative under wrapping, so the grouping into
    batches cannot change the total.

    This is the 100 TB shape of Lloyd's update: the old form shuffled
    the corpus twice per round (assignment ⋈ vectors on id, then a
    posexplode of n·dim value rows into the agg); this stage is
    map-only over the pinned quantized frame and shuffles only
    k·dim-bounded partials — the classic distributed-kmeans
    map-side-combine, with the combine done in numpy instead of a
    Catalyst partial agg."""
    if not cent_rows:
        raise ValueError("cent_rows must be non-empty")
    cids_sorted = [c for c, _ in cent_rows]
    if cids_sorted != sorted(cids_sorted):
        raise ValueError("cent_rows must be sorted by cid ascending")
    dim = len(cent_rows[0][1])
    if any(len(v) != dim for _, v in cent_rows):
        raise ValueError("ragged centroid table")
    cids = np.asarray(cids_sorted, dtype=np.int32)
    cvs = np.asarray([v for _, v in cent_rows], dtype=np.int64)
    cvs_t = cvs.T.copy()
    c2 = (cvs * cvs).sum(axis=1)
    kk = len(cent_rows)

    q = q.select("id", "qv")

    def run(batches):
        import numpy as _np
        import pyarrow as _pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            qv = _list_col_to_2d(batch.column(1), n, dim, _np.int64)
            d2 = _pairwise_d2(qv, cvs_t, c2)
            pos = _np.argmin(d2, axis=1)
            counts = _np.bincount(pos, minlength=kk)
            sums = _np.zeros((kk, dim), dtype=_np.int64)
            _np.add.at(sums, pos, qv)
            nz = counts > 0
            n_nz = int(nz.sum())
            yield _pa.RecordBatch.from_arrays(
                [
                    _pa.array(
                        _np.repeat(cids[nz], dim), type=_pa.int32()
                    ),
                    _pa.array(
                        _np.tile(_np.arange(dim, dtype=_np.int32), n_nz),
                        type=_pa.int32(),
                    ),
                    _pa.array(sums[nz].ravel(), type=_pa.int64()),
                    _pa.array(
                        _np.repeat(counts[nz], dim), type=_pa.int64()
                    ),
                ],
                names=["cid", "pos", "s", "c"],
            )

    return q.mapInArrow(run, "cid int, pos int, s long, c long")


def _kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> tuple[DataFrame, DataFrame]:
    """Quantize + seed + run ``n_iter`` Lloyd rounds; returns the
    quantized frame (id, qv) and the post-iteration centroid table
    (cid, cv) — shared by ``kmeans_lloyd`` (assignment consumer) and
    ``kmeans_centroids`` (trained-quantizer consumer).

    Round state lives on the driver as ``cent_rows`` (k·dim ints —
    the same bounded codebook the assign tiers already collect), so
    each round is ONE job: the fused ``kmeans_update_arrow`` map
    stage plus a k·dim-row final agg/collect.  No per-round
    localCheckpoint, no corpus-sized shuffle (the pre-r13 form
    joined assignment back to the vectors and posexploded n·dim
    rows per round — measured 2.7 s of corpus_retrieval_mart's
    6.5 s at sf0.1; this form retrains in <1 s).  Truncated-mean
    (``sum div count``) and (d2, cid)-argmin semantics are
    bit-identical to the unrolled DuckDB oracle
    (``kmeans_oracle_sql``); empty clusters drop out of
    ``cent_rows`` exactly as they dropped out of the agg."""
    # LAZY checkpoint: the k-row seed TakeOrdered below touches every
    # partition (global order), so it is the materializing action —
    # quantize-pass job and seed job fuse into one (r13, guide §1.2)
    q = df.select(
        F.col(id_col).alias("id"), quantized(vec_col, scale).alias("qv")
    ).localCheckpoint(eager=False)
    spark = df.sparkSession
    seeds = q.orderBy("id").limit(k).collect()
    cent_rows = [
        (int(i), [int(x) for x in r["qv"]]) for i, r in enumerate(seeds)
    ]
    for _ in range(n_iter):
        if not cent_rows:
            break
        agg = (
            kmeans_update_arrow(q, cent_rows)
            .groupBy("cid", "pos")
            .agg(F.expr("sum(s) div sum(c)").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in agg:
            by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = int(r["m"])
        cent_rows = [
            (cid, [dims[p] for p in range(len(dims))])
            for cid, dims in sorted(by_cid.items())
        ]
    cent = spark.createDataFrame(
        [(c, v) for c, v in cent_rows], "cid int, cv array<long>"
    )
    return q, cent


def kmeans_centroids(
    df: DataFrame,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The trained coarse quantizer itself: the integer centroid table
    (cid, cv: array<long>) after ``n_iter`` Lloyd rounds — what a
    production IVF index build feeds its assignment pass
    (``knn_ivf_trained``).  Same fit as ``kmeans_lloyd``, exposing
    centroids instead of assignments; divide by ``scale`` for the
    double-grid form ANN operators consume.

    The centroid table is driver-materialized after the fit, so the
    quantized frame's checkpoint blocks are released eagerly here —
    callers that only want the codebook must not keep a corpus-sized
    pin alive (bench r12 showed leftover checkpoint blocks from
    repeated invocations degrading later runs 6.5 → 16 s until a JVM
    GC cycle let the ContextCleaner drain them)."""
    q, cent = _kmeans_fit(df, k, n_iter, id_col, vec_col, scale)
    q.unpersist(blocking=False)
    return cent


def kmeans_oracle_sql(
    table: str,
    dim: int,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> str:
    """Unrolled replay of ``kmeans_lloyd``: same quantization, same
    truncated-mean update, same (d2, cid) argmin, same round count.  All
    round CTEs MATERIALIZED (each is referenced multiple times)."""
    parts = kmeans_oracle_parts(
        table, dim, k, n_iter, id_col=id_col, vec_col=vec_col, scale=scale,
        final_assign=True,
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id AS {id_col}, cid AS cluster_id, d2 FROM a{n_iter}"""
    )


def kmeans_oracle_parts(
    table: str,
    dim: int,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    final_assign: bool = False,
    prefix: str = "",
) -> list[str]:
    """The kmeans replay as composable CTE fragments: quantization,
    seed centroids, and per-round distance/argmin/update CTEs ending
    at ``{prefix}cent{n_iter}`` (the trained quantizer).  With
    ``final_assign`` the post-training assignment CTEs are appended
    too.  ``prefix`` namespaces every CTE so several independent
    trainings compose in one WITH chain (the trained-PQ oracle runs
    one per subspace); the default "" keeps the emitted SQL
    semantically identical to the historical form (same CTE names and
    results; the refactor added a `q` table alias, so the TEXT is not
    byte-identical).  Callers
    (``kmeans_oracle_sql``, the trained-IVF and trained-PQ oracles)
    splice these into larger WITH chains."""
    P = prefix
    parts = [
        f"""{P}q AS MATERIALIZED (
  SELECT {id_col} AS id,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
  FROM {table}),
{P}cent0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cid, qv AS cv
  FROM (SELECT id, qv FROM {P}q ORDER BY id LIMIT {k}))"""
    ]
    last = n_iter if final_assign else n_iter - 1
    for t in range(last + 1):
        parts.append(
            f"""{P}d{t} AS MATERIALIZED (
  SELECT q.id, c.cid,
         CAST(list_sum(list_transform(range(1, {dim} + 1),
              i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT) AS d2
  FROM {P}q q, {P}cent{t} c),
{P}a{t} AS MATERIALIZED (
  SELECT id, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM {P}d{t})
  WHERE rn = 1)"""
        )
        if t < n_iter:
            parts.append(
                f"""{P}cent{t + 1} AS MATERIALIZED (
  SELECT cid, list(m ORDER BY pos) AS cv FROM (
    SELECT a.cid, r.i AS pos, CAST(sum(q.qv[r.i + 1]) // count(*) AS BIGINT) AS m
    FROM {P}a{t} a JOIN {P}q q ON q.id = a.id,
         unnest(range(0, {dim})) AS r(i)
    GROUP BY a.cid, r.i)
  GROUP BY cid)"""
            )
    return parts


# ------------------------------------- nearest-centroid classifier
def nearest_centroid_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification on the integer grid:
    per-label centroids are element-wise truncated (toward-zero)
    integer means of the quantized
    training vectors (ONE pass — the degenerate k-means where the
    assignment is given by the label), test vectors take the label of
    the integer-L2-nearest centroid with label-id tiebreak.  Exactly
    the arithmetic ``kmeans_lloyd`` proves portable, so the SQL
    replay is a one-round specialization.

    Returns (id_col, pred, d2).  Scale shape: the centroid update is
    one posexplode -> (label, dim) partial agg (shuffle rows bounded
    by |labels|·dim); assignment is a |labels|-row broadcast + argmin
    window — the bounded-broadcast contract of the PQ codebook.
    """
    qtr = train.select(
        F.col(label_col).alias("cls"), quantized(vec_col, scale).alias("qv")
    )
    cent = (
        qtr.select("cls", F.posexplode("qv").alias("pos", "val"))
        .groupBy("cls", "pos")
        .agg(F.expr("sum(val) div count(*)").alias("m"))
        .groupBy("cls")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    )
    qte = test.select(
        F.col(id_col).alias("id"), quantized(vec_col, scale).alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = qte.crossJoin(F.broadcast(cent)).select("id", "cls", d2.alias("d2"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("d2", "cls")
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(F.col("id").alias(id_col), F.col("cls").alias("pred"), "d2")
    )


# --------------------------------------- k-center coreset (FPS)
def coreset_fps(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Greedy k-CENTER coreset (farthest-point sampling / Gonzalez'
    2-approximation): pick the lowest-id point, then k-1 times the
    point MAXIMIZING its distance to the nearest already-chosen
    center — the diversity-first selection a training-data pipeline
    runs when it wants coverage of embedding space rather than
    density (the complement of head-heavy quality sampling; also the
    classic coreset for k-center/k-means warm starts).

    Exactness: vectors live on the integer grid (``quantized``),
    distances are int64 squared L2, argmax ties break to the lowest
    id — every selection is exact integer comparison, so the
    unrolled oracle replays it decision-for-decision.

    Returns (rank, id, min_d2): the selection order and each pick's
    distance to the nearest EARLIER center (pick r's min_d2 is the
    k-center covering radius after r-1 centers — the monotone
    non-increasing curve a coverage report plots; rank 1 emits 0).

    Scale shape: k sequential rounds, each ONE map stage (update the
    running nearest-center distance against the single new center —
    a d-length literal, never a join) + one TakeOrdered argmax
    collecting ONE row (the MMR/kmeans-seed bounded-collect
    contract); the frame re-checkpoints per round to keep lineage
    flat.  Never pairs points with points."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pts = df.select(
        F.col(id_col).alias("id"), quantized(vec_col, scale).alias("qv")
    ).localCheckpoint(eager=True)
    first = pts.orderBy("id").limit(1).collect()
    if not first:
        raise ValueError("empty frame")
    chosen = [(1, int(first[0]["id"]), 0, list(first[0]["qv"]))]
    intd2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cur = pts.filter(F.col("id") != chosen[0][1]).select(
        "id",
        "qv",
        intd2(
            F.col("qv"), F.array(*[F.lit(v) for v in chosen[0][3]])
        ).alias("mind2"),
    ).localCheckpoint(eager=True)
    for rank in range(2, k + 1):
        top = cur.orderBy(F.desc("mind2"), F.asc("id")).limit(1).collect()
        if not top:
            break  # fewer distinct points than k
        cid, cqv, cd2 = int(top[0]["id"]), list(top[0]["qv"]), int(top[0]["mind2"])
        chosen.append((rank, cid, cd2, cqv))
        cur = (
            cur.filter(F.col("id") != cid)
            .select(
                "id",
                "qv",
                F.least(
                    F.col("mind2"),
                    intd2(F.col("qv"), F.array(*[F.lit(v) for v in cqv])),
                ).alias("mind2"),
            )
            .localCheckpoint(eager=True)
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r, i, d) for r, i, d, _ in chosen],
        f"rank int, {id_col} long, min_d2 long",
    )


def coreset_fps_oracle_sql(
    table: str,
    dim: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> str:
    """Unrolled replay of :func:`coreset_fps` — round r's CTE carries
    every remaining point's running nearest-center distance; the
    pick is the (mind2 DESC, id ASC) head."""
    q = (
        f"list_transform({vec_col}, x -> "
        f"cast(round(cast(x AS DOUBLE) * {scale}) AS BIGINT))"
    )
    d2 = (
        "cast(list_sum(list_transform(range(1, {d} + 1), "
        "i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS BIGINT)"
    ).format(d=dim)
    parts = [
        f"pts AS MATERIALIZED (SELECT {id_col} AS id, {q} AS qv FROM {table})",
        "c1 AS MATERIALIZED (SELECT 1 AS rank, id, cast(0 AS bigint) AS min_d2, qv"
        " FROM pts ORDER BY id LIMIT 1)",
        f"m1 AS MATERIALIZED (SELECT a.id AS id, a.qv AS qv, {d2} AS mind2"
        "  FROM pts a, c1 b WHERE a.id <> b.id)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT {r} AS rank, id, mind2 AS min_d2, qv"
            f" FROM m{r - 1} ORDER BY mind2 DESC, id LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"m{r} AS MATERIALIZED (SELECT a.id AS id, a.qv AS qv,"
                f" least(a.mind2, {d2}) AS mind2"
                f" FROM m{r - 1} a, c{r} b WHERE a.id <> b.id)"
            )
    union = "\nUNION ALL\n".join(
        f"SELECT rank, id AS {id_col}, min_d2 FROM c{r}" for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


def pq_train_codebooks(
    corpus: DataFrame,
    dim: int,
    n_sub: int,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> list[list[list[int]]]:
    """TRAINED product-quantization codebooks: one independent
    integer-grid Lloyd run per subspace over the sliced corpus (the
    production PQ build — seeded codebooks are the deterministic
    bring-up tier, per-subspace kmeans is what FAISS et al. actually
    ship).  Returns ``[m][cid] -> sub_dim`` centroid lists on the
    fixed-point grid, ready for ``pq_topk(codebook_rows=...)``.

    Slicing commutes with the per-element quantization, so training
    on sliced raw vectors with the same ``scale`` lands on exactly
    the grid the encoder uses.  Each run's centroid table is k rows
    (the kmeans-seed bounded-collect contract); n_sub · k · sub_dim
    integers total come back to the driver — plan literals, never
    data."""
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub_dim = dim // n_sub
    out: list[list[list[int]]] = []
    for m in range(n_sub):
        sub = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim).alias(vec_col),
        )
        cent = kmeans_centroids(
            sub, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
            scale=scale,
        )
        rows = sorted(cent.collect(), key=lambda r: r["cid"])
        out.append([list(r["cv"]) for r in rows])
    return out


# ------------------------------------------------------- OPQ rotation
def opq_sweep_pairs(kind: str, dim: int, sub_dim: int = 8) -> list[tuple[int, int]]:
    """Disjoint dimension-pair layouts for one OPQ Jacobi sweep — each
    covers every dimension exactly once, so a sweep is an orthogonal
    (block-diagonal up to permutation) transform by construction:

    - ``offset``: (1,2), (3,4), ..., (dim-1, 0) — straddles the
      adjacent-pair boundaries so consecutive sweeps compose into a
      butterfly-style mixing network;
    - ``crosssub``: (i, i+sub_dim) between subspace 2m and 2m+1 —
      moves covariance ACROSS the PQ subspace split, the OPQ-specific
      target (within-subspace correlation is harmless to PQ, the
      cross-subspace part is what independence-of-codebooks loses);
    - ``half``: (i, i + dim/2) — the long-range mix.
    """
    half = dim // 2
    if kind == "offset":
        return [(2 * i + 1, (2 * i + 2) % dim) for i in range(half)]
    if kind == "crosssub":
        if dim % (2 * sub_dim):
            raise ValueError(f"dim {dim} not a multiple of 2*sub_dim")
        return [
            (m * 2 * sub_dim + r, m * 2 * sub_dim + r + sub_dim)
            for m in range(dim // (2 * sub_dim))
            for r in range(sub_dim)
        ]
    if kind == "half":
        return [(i, i + half) for i in range(half)]
    raise ValueError(f"unknown sweep kind {kind!r}")


def jacobi_rotate_sweep(
    df: DataFrame,
    pairs: list[tuple[int, int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """One closed-form Jacobi sweep of an OPQ rotation: for every
    disjoint dimension pair (i, j), apply the 2x2 rotation that
    DIAGONALIZES that pair's covariance (the same quadratic-formula
    eigenbasis and sign conventions as
    :func:`pca2_scores_closed_form`).  Pairs whose integer covariance
    numerator is exactly zero keep both coordinates unchanged
    (identity — the converged-Jacobi fixed point).

    Exactness contract: the pair moments are EXACT integer sums off
    the quantized grid (one map-combinable aggregate, collected as a
    single bounded row — the kmeans-seed collect contract); the
    rotation coefficients are then derived in binary64 with the same
    correctly-rounded + - * / sqrt operation tree the DuckDB oracle
    runs, so the embedded literals are bit-identical to what the
    oracle recomputes, and the rotated coordinates
    ``u1x*x_i + u1y*x_j`` match bit-for-bit.  (Deriving the
    coefficients driver-side instead of in-plan keeps each output
    expression 3 nodes — the in-plan form re-inlines the whole
    quadratic-formula tree into all 64 coordinates, a multiplicative
    codegen blow-up.)

    Output: ``df`` with ``vec_col`` replaced by the rotated
    array<double>.  Rotations are orthogonal, so norms / cosines /
    L2 distances are preserved up to float rounding — exact rerank
    stages keep using the ORIGINAL vectors.

    Scale shape: one moments aggregate over the corpus (5 sums per
    pair + a count, one pass), a 1-row driver collect, then a pure
    map stage — nothing shuffles by data size."""
    import math

    dims = sorted(d for ij in pairs for d in ij)
    if dims != list(range(len(dims))):
        raise ValueError("pairs must cover each dimension exactly once")
    dim = len(dims)
    # materialize the quantized array as ONE column first: inlining
    # quantized(vec)[i] into each of the 5·|pairs| aggregate
    # expressions would re-embed the 64-lambda transform per sum
    ivdf = df.select(quantized(vec_col, scale).alias("__iv__"))
    sums = [F.count(F.lit(1)).alias("n")]
    for p, (i, j) in enumerate(pairs):
        x, y = F.col("__iv__")[i], F.col("__iv__")[j]
        sums += [
            F.sum(x).alias(f"sx{p}"),
            F.sum(y).alias(f"sy{p}"),
            F.sum(x * x).alias(f"sxx{p}"),
            F.sum(x * y).alias(f"sxy{p}"),
            F.sum(y * y).alias(f"syy{p}"),
        ]
    m = ivdf.agg(*sums).collect()[0]
    n = m["n"]
    exprs: dict[int, Column] = {}
    for p, (i, j) in enumerate(pairs):
        # exact integer covariance numerators (Python ints: unbounded,
        # so no overflow; equal to both engines' BIGINT/HUGEINT sums)
        a = n * m[f"sxx{p}"] - m[f"sx{p}"] * m[f"sx{p}"]
        b = n * m[f"sxy{p}"] - m[f"sx{p}"] * m[f"sy{p}"]
        c = n * m[f"syy{p}"] - m[f"sy{p}"] * m[f"sy{p}"]
        xi = F.col(vec_col)[i].cast("double")
        xj = F.col(vec_col)[j].cast("double")
        if b == 0:
            exprs[i], exprs[j] = xi, xj
            continue
        ad, bd, cd = float(a), float(b), float(c)
        disc = math.sqrt((ad - cd) * (ad - cd) + 4.0 * bd * bd)
        l1 = ((ad + cd) + disc) / 2.0
        wx, wy = bd, l1 - ad
        nrm = math.sqrt(wx * wx + wy * wy)
        ux, uy = wx / nrm, wy / nrm
        s1 = -1.0 if (ux if abs(ux) >= abs(uy) else uy) < 0 else 1.0
        u1x, u1y = s1 * ux, s1 * uy
        s2 = -1.0 if (-uy if abs(uy) >= abs(ux) else ux) < 0 else 1.0
        u2x, u2y = s2 * -uy, s2 * ux
        exprs[i] = F.lit(u1x) * xi + F.lit(u1y) * xj
        exprs[j] = F.lit(u2x) * xi + F.lit(u2y) * xj
    rotated = F.array(*[exprs[d] for d in range(dim)])
    return df.select(F.col(id_col), rotated.alias(vec_col))


#: the registered OPQ sweep schedule: cross-subspace first (the OPQ
#: target), then the butterfly offset/half mixes.  Chosen by measuring
#: trained-PQ recall@10 under every 1-3 sweep schedule at all three
#: fixture SFs — 'offset,crosssub,half' is the only one that beats the
#: unrotated trained codebooks at ALL of sf0.001/0.01/0.1
#: (0.7875/0.8000/0.6875 vs 0.7500/0.7625/0.6375).  On near-isotropic
#: synthetic vectors the margin is small by nature; real embeddings
#: (strong cross-dimension correlation) are where OPQ earns its keep.
OPQ_SWEEPS: tuple[str, ...] = ("offset", "crosssub", "half")


def opq_rotate(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    sweeps: tuple[str, ...] = OPQ_SWEEPS,
    sub_dim: int = 8,
) -> DataFrame:
    """The OPQ rotation (Ge et al., CVPR'13, the non-parametric
    variant's alternating idea collapsed to a FIXED schedule of
    closed-form Jacobi sweeps so the whole train step is declarative
    and oracle-replayable): each sweep recomputes exact integer-grid
    pair moments of the CURRENT data, so later sweeps see what
    earlier sweeps changed.  Composition of orthogonal maps is
    orthogonal — distances are preserved; only the PQ subspace
    DECOMPOSITION changes.

    Each sweep's output is MATERIALIZED (``localCheckpoint``) before
    the next sweep reads it: sweep s+1's moment sums and rotated
    coordinates reference every element of sweep s's output array, so
    an unmaterialized chain would inline the previous sweep's whole
    64-expression tree into each of the next sweep's 64 expressions —
    multiplicative plan blow-up, minutes of Catalyst/codegen time for
    three sweeps.  A production build writes each sweep (or just the
    final rotated table) to storage, exactly as FAISS persists OPQ's
    trained R."""
    out = df
    for kind in sweeps:
        out = jacobi_rotate_sweep(
            out, opq_sweep_pairs(kind, dim, sub_dim), id_col, vec_col, scale
        ).localCheckpoint(eager=True)
    return out


def jacobi_sweep_oracle_parts(
    src: str,
    out: str,
    pairs: list[tuple[int, int]],
    scale: int = DEFAULT_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[str]:
    """DuckDB CTE parts replaying :func:`jacobi_rotate_sweep` from
    table ``src`` into MATERIALIZED table ``out`` — identical integer
    moments, identical binary64 operation tree, identical sign fixes
    (the pca2 oracle conventions, per-pair)."""
    tag = out
    values = ", ".join(f"({p}, {i}, {j})" for p, (i, j) in enumerate(pairs))
    return [
        f"{tag}_pairs(p, i, j) AS (SELECT * FROM (VALUES {values}))",
        f"""{tag}_iv AS (
  SELECT {id_col}, {vec_col},
         list_transform({vec_col},
           x -> CAST(round(cast(x AS double) * {scale}) AS BIGINT)) AS iv
  FROM {src})""",
        f"""{tag}_m AS (
  SELECT pr.p, pr.i, pr.j, count(*) AS n,
         sum(iv[pr.i + 1]) AS sx, sum(iv[pr.j + 1]) AS sy,
         sum(iv[pr.i + 1] * iv[pr.i + 1]) AS sxx,
         sum(iv[pr.i + 1] * iv[pr.j + 1]) AS sxy,
         sum(iv[pr.j + 1] * iv[pr.j + 1]) AS syy
  FROM {tag}_iv CROSS JOIN {tag}_pairs pr
  GROUP BY pr.p, pr.i, pr.j)""",
        f"""{tag}_num AS (
  SELECT p, i, j,
         n * sxx - sx * sx AS a,
         n * sxy - sx * sy AS b,
         n * syy - sy * sy AS c
  FROM {tag}_m)""",
        f"""{tag}_eig AS (
  SELECT p, i, j, b,
         cast(b AS double) AS wx,
         ((cast(a AS double) + cast(c AS double))
          + sqrt((cast(a AS double) - cast(c AS double))
                 * (cast(a AS double) - cast(c AS double))
                 + 4.0 * cast(b AS double) * cast(b AS double))) / 2.0
         - cast(a AS double) AS wy
  FROM {tag}_num)""",
        f"""{tag}_unit AS (
  SELECT p, i, j, b,
         wx / sqrt(wx * wx + wy * wy) AS ux,
         wy / sqrt(wx * wx + wy * wy) AS uy
  FROM {tag}_eig)""",
        f"""{tag}_axes AS (
  SELECT p, i, j, b,
         (CASE WHEN (CASE WHEN abs(ux) >= abs(uy) THEN ux ELSE uy END) < 0
               THEN -1.0 ELSE 1.0 END) * ux AS u1x,
         (CASE WHEN (CASE WHEN abs(ux) >= abs(uy) THEN ux ELSE uy END) < 0
               THEN -1.0 ELSE 1.0 END) * uy AS u1y,
         (CASE WHEN (CASE WHEN abs(-uy) >= abs(ux) THEN -uy ELSE ux END) < 0
               THEN -1.0 ELSE 1.0 END) * (-uy) AS u2x,
         (CASE WHEN (CASE WHEN abs(-uy) >= abs(ux) THEN -uy ELSE ux END) < 0
               THEN -1.0 ELSE 1.0 END) * ux AS u2y
  FROM {tag}_unit)""",
        f"""{tag}_vals AS (
  SELECT v.{id_col}, a.i AS d,
         CASE WHEN a.b = 0 THEN cast(v.{vec_col}[a.i + 1] AS double)
              ELSE a.u1x * cast(v.{vec_col}[a.i + 1] AS double)
                   + a.u1y * cast(v.{vec_col}[a.j + 1] AS double) END AS val
  FROM {src} v CROSS JOIN {tag}_axes a
  UNION ALL
  SELECT v.{id_col}, a.j AS d,
         CASE WHEN a.b = 0 THEN cast(v.{vec_col}[a.j + 1] AS double)
              ELSE a.u2x * cast(v.{vec_col}[a.i + 1] AS double)
                   + a.u2y * cast(v.{vec_col}[a.j + 1] AS double) END AS val
  FROM {src} v CROSS JOIN {tag}_axes a)""",
        f"""{out} AS MATERIALIZED (
  SELECT {id_col}, array_agg(val ORDER BY d) AS {vec_col}
  FROM {tag}_vals GROUP BY {id_col})""",
    ]
