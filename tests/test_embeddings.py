"""Embedding Gram/PCA operator tests: the exact integer tier vs the
numpy mapInPandas tier, and the projection's PCA invariants against a
straight numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.embeddings import (
    DEFAULT_SCALE,
    covariance_matrix,
    gram_moments_exact,
    gram_moments_fast,
    pca2_scores_closed_form,
    pca_components,
    pca_project,
    quantized,
)

DIM = 6
N = 200


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # anisotropic: two dominant directions so eigenvalues separate
    base = rng.normal(size=(N, DIM))
    base[:, 0] *= 4.0
    base[:, 1] *= 2.0
    mat = base @ np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    rows = [(i, [float(x) for x in mat[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # repartition so the fast tier genuinely merges multiple partials
    return mat.astype(np.float32).astype(np.float64), df.repartition(5)


def test_quantized_rounding(spark):
    df = spark.createDataFrame([([0.0014, -0.0005, 1.9996],)], "v array<float>")
    got = df.select(quantized("v").alias("q")).collect()[0]["q"]
    assert got == [1, -1, 2000]  # half away from zero


def test_fast_matches_exact_tier(vecs):
    mat, df = vecs
    exact = {
        (r["i"], r["j"]): r
        for r in gram_moments_exact(df, "embedding").collect()
    }
    fast = {
        (r["i"], r["j"]): r for r in gram_moments_fast(df, "embedding").collect()
    }
    assert set(exact) == set(fast) and len(exact) == DIM * (DIM + 1) // 2
    s = float(DEFAULT_SCALE)
    for key, e in exact.items():
        f = fast[key]
        assert e["n"] == f["n"] == N
        # quantization error per coordinate <= 0.5/scale; compare on
        # the descaled exact sums with that error budget
        assert f["sum_xi"] == pytest.approx(e["sum_qi"] / s, abs=N * 0.5 / s)
        assert f["sum_xij"] == pytest.approx(
            e["sum_qij"] / s**2, rel=1e-3, abs=N * 0.02
        )


def test_covariance_matches_numpy(vecs):
    mat, df = vecs
    cov, mean, n = covariance_matrix(gram_moments_fast(df, "embedding"))
    assert n == N
    np.testing.assert_allclose(mean, mat.mean(axis=0), atol=1e-6)
    # partial-Gram summation order differs from numpy's single matmul
    np.testing.assert_allclose(cov, np.cov(mat, rowvar=False), rtol=1e-5, atol=1e-8)


def test_pca_invariants_and_reference(vecs):
    mat, df = vecs
    k = 3
    comps, vals, mean = pca_components(df, "embedding", k)
    # orthonormal rows, eigenvalues descending and positive
    np.testing.assert_allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    assert vals[0] > vals[1] > vals[2] > 0
    # numpy reference: eigh of np.cov with the same sign convention
    ref_vals, ref_vecs = np.linalg.eigh(np.cov(mat, rowvar=False))
    order = np.argsort(ref_vals)[::-1][:k]
    np.testing.assert_allclose(vals, ref_vals[order], rtol=1e-5)
    for got, want in zip(comps, ref_vecs[:, order].T):
        if want[np.argmax(np.abs(want))] < 0:
            want = -want
        np.testing.assert_allclose(got, want, atol=1e-5)

    out = pca_project(df, "embedding", k)
    assert dict(out.dtypes)["pca"] == "array<double>"
    scores = np.array([r["pca"] for r in out.orderBy("vec_id").collect()])
    ref_scores = (mat - mat.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(scores, ref_scores, atol=1e-5)
    # centered scores: per-component mean ~ 0, variance ~ eigenvalue
    np.testing.assert_allclose(scores.mean(axis=0), np.zeros(k), atol=1e-5)
    np.testing.assert_allclose(scores.var(axis=0, ddof=1), vals, rtol=1e-4)


def test_pca2_closed_form_matches_numpy(vecs):
    mat, df = vecs
    out = pca2_scores_closed_form(df, "vec_id", "embedding").orderBy("vec_id")
    got = np.array([(r["pc1"], r["pc2"]) for r in out.collect()])
    # numpy reference over the SAME quantized 2-D sub-embedding
    q = np.round(mat[:, :2] * DEFAULT_SCALE)
    centered = (q - q.mean(axis=0)) / DEFAULT_SCALE
    cov = np.cov(q, rowvar=False)
    vals, vecs_ = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    u1 = vecs_[:, order].T[0]
    if u1[np.argmax(np.abs(u1))] < 0:
        u1 = -u1
    # the operator's second axis is the quarter-turn of u1 under the
    # same largest-|coord|-positive sign rule (numpy's own second
    # eigenvector may be its negation)
    u2 = np.array([-u1[1], u1[0]])
    if u2[np.argmax(np.abs(u2))] < 0:
        u2 = -u2
    ref = np.column_stack([centered @ u1, centered @ u2])
    np.testing.assert_allclose(got, ref, atol=2e-6)
    # scores decorrelated and variance-ordered
    assert abs(np.corrcoef(got[:, 0], got[:, 1])[0, 1]) < 1e-3
    assert got[:, 0].var() > got[:, 1].var()


def test_pca2_diagonal_covariance_axes(spark):
    # B == 0 branch: independent axes, larger variance on dim 1 ->
    # pc1 must be the (centered) SECOND coordinate
    rows = [(i, [float(i % 3 - 1) * 0.1, float(i % 7 - 3) * 0.2]) for i in range(21)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pca2_scores_closed_form(df, "vec_id", "embedding").orderBy("vec_id")
    got = np.array([(r["pc1"], r["pc2"]) for r in out.collect()])
    q = np.array([r[1] for r in rows])
    q = np.round(q * DEFAULT_SCALE)
    centered = (q - q.mean(axis=0)) / DEFAULT_SCALE
    np.testing.assert_allclose(got[:, 0], centered[:, 1], atol=1e-6)
    np.testing.assert_allclose(got[:, 1], centered[:, 0], atol=1e-6)


def test_project_plan_is_native(vecs):
    # the row path must stay JVM-side: no Python eval nodes
    _, df = vecs
    plan = (
        pca_project(df, "embedding", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parameter_validation(spark, vecs):
    _, df = vecs
    with pytest.raises(ValueError, match="scale"):
        df.select(quantized("embedding", scale=0))
    with pytest.raises(ValueError, match="k must"):
        pca_components(df, "embedding", 0)
    with pytest.raises(ValueError, match="exceeds embedding dim"):
        pca_components(df, "embedding", DIM + 1)


def test_kmeans_lloyd_matches_python_reference(spark, vecs):
    """Independent pure-python Lloyd on the same integer grid — same
    lowest-id seeding, trunc-division means, (d2, cid) argmin — must
    agree exactly with the DataFrame plan after every round."""
    mat, df = vecs
    from musicflow_spark.operators.embeddings import kmeans_lloyd

    k, iters, scale = 4, 3, 1000
    # python reference (uses round-half-away like Spark's F.round)
    from decimal import ROUND_HALF_UP, Decimal

    q = {
        i: [
            int(Decimal(repr(float(x) * scale)).quantize(0, ROUND_HALF_UP))
            for x in mat[i]
        ]
        for i in range(len(mat))
    }
    cent = {c: list(q[c]) for c in range(k)}  # lowest-id seeds

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cent[c])), c) for c in cent
            )
            out[i] = best
        return out

    for _ in range(iters):
        a = assign()
        members = {}
        for i, (_, c) in a.items():
            members.setdefault(c, []).append(q[i])
        def trunc_div(a: int, b: int) -> int:  # toward zero == Spark div
            m = abs(a) // b
            return m if a >= 0 else -m

        cent = {
            c: [trunc_div(sum(col), len(col)) for col in zip(*vs)]
            for c, vs in members.items()
        }
    want = {i: (c, d2) for i, (d2, c) in assign().items()}

    got = {
        r["vec_id"]: (r["cluster_id"], r["d2"])
        for r in kmeans_lloyd(df, k=k, n_iter=iters, scale=scale).collect()
    }
    assert got == {i: (c, d) for i, (c, d) in want.items()}


def test_mmr_matches_python_greedy_and_diversifies(spark, vecs):
    """Pure-python greedy MMR on the same integer grid must agree
    exactly; and the diversified ranking must differ from plain
    relevance order (the pool has correlated directions by
    construction, so redundancy suppression must kick in)."""
    mat, df = vecs
    from decimal import ROUND_HALF_UP, Decimal

    from musicflow_spark.operators.similarity import mmr_topk

    k, pool, scale, qid = 5, 20, 1000, 0
    q = {
        i: [
            int(Decimal(repr(float(x) * scale)).quantize(0, ROUND_HALF_UP))
            for x in mat[i]
        ]
        for i in range(len(mat))
    }
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731
    rel = {i: dot(v, q[qid]) for i, v in q.items() if i != qid}
    pool_ids = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    sel, want = [], []
    for rank in range(1, k + 1):
        cands = [i for i in pool_ids if i not in sel]
        scored = [
            (rel[i] - max(dot(q[i], q[s]) for s in sel) if sel else rel[i], i)
            for i in cands
        ]
        score, best = max(((sc, -i) for sc, i in scored))
        best = -best
        sel.append(best)
        want.append((rank, best, rel[best], score))
    got = [
        (r["rank"], r["vec_id"], r["rel"], r["score"])
        for r in mmr_topk(df, query_id=qid, k=k, pool=pool, scale=scale)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    plain = [i for i in pool_ids[:k]]
    assert [v for _, v, _, _ in want] != plain  # diversification bites


def test_nearest_centroid_separable_and_tiebreak(spark):
    """Two well-separated label blobs -> 100% accuracy; an exactly
    equidistant test point goes to the smaller label id."""
    from pyspark.sql import functions as F

    from musicflow_spark.operators.embeddings import nearest_centroid_classify

    test = spark.createDataFrame(
        [(100, [9.9, 0.1]), (101, [0.1, 9.9]), (102, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    train = spark.createDataFrame(
        [(0, 0, [10.0, 0.0]), (2, 0, [10.0, 0.002]),
         (4, 1, [0.0, 10.0]), (6, 1, [0.002, 10.0])],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r["vec_id"]: r["pred"] for r in
           nearest_centroid_classify(train, test).collect()}
    assert got[100] == 0 and got[101] == 1
    # centroids are (10000,1) and (1,10000) on the milli grid; the
    # diagonal point is equidistant -> label-id tiebreak picks 0
    assert got[102] == 0


def test_pca2_reduced_knn_recovers_structured_neighbors(spark):
    # data whose signal lives entirely in the projected plane: the
    # reduced-space squared-L2 ranking must equal the full-space one
    # (rotation + centering preserve distances)
    import numpy as np

    from musicflow_spark.queries.vectors import knn_pca2_reduced

    rng = np.random.default_rng(3)
    n, dim = 120, 8
    sig = rng.normal(size=(n, 2)) * [4.0, 1.5]
    mat = np.zeros((n, dim))
    mat[:, :2] = sig
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    import tempfile

    path = tempfile.mkdtemp(prefix="mf_pca2knn_") 
    df.write.mode("overwrite").parquet(path + "/embeddings.parquet")
    got = knn_pca2_reduced(spark, path)
    got_sets = {}
    for r in got.collect():
        got_sets.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))

    # numpy reference: full-space L2 on the QUANTIZED float32 grid the
    # operator sees (round(x*1000)/1000 of the float32 cast)
    q = np.round(mat.astype(np.float32).astype(np.float64) * 1000) / 1000
    for qid in range(8):
        d2 = ((q - q[qid]) ** 2).sum(axis=1)
        want = sorted(range(n), key=lambda i: (d2[i], i))[:10]
        gotlist = [nid for _, nid in sorted(got_sets[qid])]
        assert gotlist == want, f"query {qid}"


# ------------------------------ vector-index lifecycle composition
def test_corpus_retrieval_mart_contract(spark):
    """The composed retrieval mart: per-query ranks are dense from 1,
    own-document chunks never retrieved, cosine within [-1, 1] and
    non-increasing by rank."""
    from musicflow_spark.queries.vectors import (
        RETR_ID_STRIDE,
        RETR_TOPK,
        corpus_retrieval_mart,
    )

    rows = corpus_retrieval_mart(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["query_id"] // RETR_ID_STRIDE != r["neighbor_id"] // RETR_ID_STRIDE
        assert -1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= RETR_TOPK
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


# ------------------------------------ k-center coreset (FPS) greedy
def test_coreset_fps_matches_python_reference(spark):
    """Farthest-point sampling vs an exact pure-python replica on the
    same integer grid — selection order, ids, AND radii; plus the
    k-center property that the covering radius is non-increasing."""
    from musicflow_spark.operators.embeddings import coreset_fps

    vecs = {
        0: [0.0, 0.0],
        1: [10.0, 0.0],
        2: [0.0, 10.0],
        3: [10.0, 10.0],
        4: [5.0, 5.0],
        5: [5.1, 5.1],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = [
        (r["rank"], r["vec_id"], r["min_d2"])
        for r in coreset_fps(df, k=5).orderBy("rank").collect()
    ]
    # pure-python FPS on the quantized grid
    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    chosen = [min(q)]
    want = [(1, chosen[0], 0)]
    mind2 = {
        i: sum((a - b) ** 2 for a, b in zip(q[i], q[chosen[0]]))
        for i in q
        if i != chosen[0]
    }
    for rank in range(2, 6):
        nxt = max(mind2, key=lambda i: (mind2[i], -i))
        want.append((rank, nxt, mind2[nxt]))
        del mind2[nxt]
        for i in mind2:
            d = sum((a - b) ** 2 for a, b in zip(q[i], q[nxt]))
            mind2[i] = min(mind2[i], d)
        chosen.append(nxt)
    assert got == want
    # greedy picks the far corners before the near-duplicate center
    assert {got[1][1], got[2][1], got[3][1]} == {1, 2, 3}
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_coreset_fps_short_frame_and_validation(spark):
    from musicflow_spark.operators.embeddings import coreset_fps

    df = spark.createDataFrame(
        [(7, [1.0, 2.0]), (9, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    # k beyond the frame: emits every point once, then stops
    assert coreset_fps(df, k=10).count() == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        coreset_fps(df, k=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="empty"):
        coreset_fps(empty, k=2)


# --------------------------- feature-hash embedding compute tiers
def test_feature_hash_embedding_arrow_bitwise_parity(spark, sf_dir):
    """The Arrow tier must produce BIT-IDENTICAL signed integer
    counts to the native fold — on fixture documents (null/empty
    handling included) and on crafted edge cases (mixed whitespace,
    case folding, repeated tokens)."""
    from musicflow_spark.operators.similarity import (
        feature_hash_embedding,
        feature_hash_embedding_arrow,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = {
        r["doc_id"]: list(r["embedding"])
        for r in feature_hash_embedding(docs, dim=16).collect()
    }
    b = {
        r["doc_id"]: list(r["embedding"])
        for r in feature_hash_embedding_arrow(docs, dim=16).collect()
    }
    assert a == b and len(a) > 0
    edge = spark.createDataFrame(
        [
            (1, "  Mixed\tCASE  case\ncase "),
            (2, ""),
            (3, None),
            (4, "one"),
            # Unicode whitespace must NOT split: Java regex \s is
            # ASCII-only, so 'a b' is ONE token on the native
            # tier — the Arrow tier must agree (ADVICE r09: Python's
            # Unicode-aware \s silently split it before the fix)
            (5, "a\u00a0b c\u2028d \u3000 e"),
            (6, "\x0bvtab\x0bsplit\x0b"),  # \x0b IS in Java's \s
        ],
        "doc_id long, text string",
    )
    ea = {
        r["doc_id"]: (None if r["embedding"] is None else list(r["embedding"]))
        for r in feature_hash_embedding(edge, dim=8).collect()
    }
    eb = {
        r["doc_id"]: (None if r["embedding"] is None else list(r["embedding"]))
        for r in feature_hash_embedding_arrow(edge, dim=8).collect()
    }
    assert ea[3] is None  # NULL text -> NULL embedding on BOTH tiers
    assert ea == eb
    # case folding really collapsed the three 'case' occurrences
    assert sum(abs(v) for v in ea[1]) in (2.0, 4.0)  # mixed +-1 signs


@pytest.mark.slow
def test_pq_trained_beats_seeded_recall(spark, sf_dir):
    """Why train the fine quantizer: per-subspace kmeans codebooks
    must match-or-beat the deterministic stride-seeded codebook's
    recall@10 against brute force (0.7625 vs 0.60 measured at
    sf0.01)."""
    from musicflow_spark.operators.similarity import brute_force_topk
    from musicflow_spark.queries.vectors import (
        N_QUERY_VECS,
        TOP_K,
        knn_pq,
        knn_pq_trained,
    )
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    ex = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=TOP_K).collect()
    }
    seeded = {
        (r.query_id, r.neighbor_id) for r in knn_pq(spark, sf_dir).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id)
        for r in knn_pq_trained(spark, sf_dir).collect()
    }
    r_seed = len(seeded & ex) / len(ex)
    r_train = len(trained & ex) / len(ex)
    assert r_train >= r_seed, (r_seed, r_train)
    assert r_train >= 0.7, r_train


def test_opq_rotation_is_orthogonal(spark, sf_dir):
    """The composed Jacobi sweeps must preserve L2 norms (rotations
    are orthogonal) — the property that lets the OPQ tier rerank on
    the ORIGINAL vectors."""
    import math

    from musicflow_spark.operators.embeddings import opq_rotate
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(200)
    rot = opq_rotate(emb, dim=64)
    orig = {
        r["vec_id"]: math.sqrt(sum(float(x) * float(x) for x in r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in rot.collect():
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(n - orig[r["vec_id"]]) <= 1e-9 * max(1.0, orig[r["vec_id"]])


@pytest.mark.slow
def test_opq_beats_trained_recall(spark, sf_dir):
    """Why rotate (VERDICT r09 item 4): OPQ's recall@10 vs brute
    force must beat the unrotated trained-codebook tier's (measured
    0.7875/0.8000/0.6875 vs 0.7500/0.7625/0.6375 at sf0.001/0.01/0.1
    — the margin is small on near-isotropic synthetic vectors, real
    correlated embeddings are where rotation pays)."""
    from musicflow_spark.operators.similarity import brute_force_topk
    from musicflow_spark.queries.vectors import (
        N_QUERY_VECS,
        TOP_K,
        knn_opq,
        knn_pq_trained,
    )
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    ex = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=TOP_K).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id)
        for r in knn_pq_trained(spark, sf_dir).collect()
    }
    opq = {(r.query_id, r.neighbor_id) for r in knn_opq(spark, sf_dir).collect()}
    r_trained = len(trained & ex) / len(ex)
    r_opq = len(opq & ex) / len(ex)
    assert r_opq > r_trained, (r_trained, r_opq)
    assert r_opq >= 0.75, r_opq


def test_pq_arrow_encode_codes_bit_identical(spark, sf_dir):
    """The Arrow int64-argmin encode tier must produce EXACTLY the
    native Catalyst fold's codes row-for-row (pure integer math, same
    lowest-cid tie rule) — the feature_hash_embedding_arrow /
    brute_force_topk_vectorized contract, for the PQ encode stage."""
    from musicflow_spark.operators.embeddings import pq_train_codebooks
    from musicflow_spark.operators.similarity import (
        _pq_encode_parts,
        pq_encode_codes_arrow,
    )
    from musicflow_spark.queries.vectors import (
        PQ_DIM,
        PQ_SCALE,
        PQ_SUB,
        PQT_ITERS,
        PQT_K,
    )
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cb = pq_train_codebooks(
        emb, dim=PQ_DIM, n_sub=PQ_SUB, k=PQT_K, n_iter=PQT_ITERS,
        scale=PQ_SCALE,
    )
    _, native, _ = _pq_encode_parts(
        emb, emb.limit(1), None, "vec_id", "embedding", PQ_DIM, PQ_SUB,
        PQ_SCALE, codebook_rows=cb,
    )
    nat = {r["neighbor_id"]: list(r["codes"]) for r in native.collect()}
    arw = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode_codes_arrow(
            emb, cb, "vec_id", "embedding", PQ_DIM, PQ_SUB, PQ_SCALE
        ).collect()
    }
    assert nat == arw

def test_kmeans_assign_arrow_bit_identical(spark, sf_dir):
    """The Arrow int64-argmin ASSIGN tier must produce EXACTLY the
    native Catalyst fold's (id, cid, d2) rows (pure integer math,
    first-minimum argmin over cid-ascending centroids == the native
    (d2, cid) lexicographic tie rule) — the pq_encode_codes_arrow
    contract, for the trained-tier assignment stage (VERDICT r10
    item 2: the dominant constant of every trained tier)."""
    from musicflow_spark.operators.embeddings import (
        _kmeans_assign_native,
        kmeans_assign_arrow,
        quantized,
    )
    from musicflow_spark.sources.catalog import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("id"), quantized("embedding").alias("qv")
    )
    # centroid table with deliberate duplicates so the tie rule is
    # actually exercised (two cids share a vector -> d2 ties)
    seeds = q.orderBy("id").limit(4).collect()
    rows = [(i, list(seeds[i % 4]["qv"])) for i in range(8)]
    cent = spark.createDataFrame(rows, "cid int, cv array<long>")
    nat = {
        r["id"]: (r["cid"], r["d2"])
        for r in _kmeans_assign_native(q, cent).collect()
    }
    arw = {
        r["id"]: (r["cid"], r["d2"])
        for r in kmeans_assign_arrow(q, rows).collect()
    }
    assert nat == arw
    # ties resolved to the LOWEST cid: duplicated centroids mean no
    # assignment may land on cids 4..7
    assert all(cid < 4 for cid, _ in arw.values())


def test_kmeans_assign_arrow_validation(spark):
    from musicflow_spark.operators.embeddings import kmeans_assign_arrow

    q = spark.createDataFrame([(1, [0, 0])], "id long, qv array<long>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        kmeans_assign_arrow(q, [])
    with _pytest.raises(ValueError, match="sorted"):
        kmeans_assign_arrow(q, [(1, [0, 0]), (0, [1, 1])])
    with _pytest.raises(ValueError, match="ragged"):
        kmeans_assign_arrow(q, [(0, [0, 0]), (1, [1])])


def test_nearest_centroid_ids_arrow_bit_identical(spark, sf_dir):
    """The Arrow DOUBLE-d2 coarse-assignment tier must produce
    EXACTLY the native nearest_centroids(top=1) rows: the kernel
    accumulates (x-y)^2 dimension-sequentially in IEEE double — the
    same rounding sequence as the Catalyst fold — and np.argmin's
    first-minimum over cluster_id-ascending centroids is the native
    (d2, cluster_id) window tie rule (exercised here via duplicated
    centroids)."""
    from musicflow_spark.operators.similarity import (
        nearest_centroid_ids_arrow,
        nearest_centroids,
    )
    from musicflow_spark.sources.catalog import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    base = [
        list(r["embedding"])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    # duplicates -> d2 ties -> the lowest cluster_id must win
    rows = [(i, [float(x) for x in base[i % 4]]) for i in range(8)]
    cent = spark.createDataFrame(rows, "cluster_id long, centroid array<double>")
    nat = {
        r["neighbor_id"]: r["cluster_id"]
        for r in nearest_centroids(
            emb, cent, "vec_id", "embedding", "neighbor_id", "__cv__", 1
        ).select("neighbor_id", "cluster_id").collect()
    }
    arw = {
        r["neighbor_id"]: r["cluster_id"]
        for r in nearest_centroid_ids_arrow(
            emb, rows, "vec_id", "neighbor_id"
        ).collect()
    }
    assert nat == arw
    assert all(cid < 4 for cid in arw.values())


def test_pq_codebook_rows_from_seeds_matches_in_frame(spark, sf_dir):
    """The driver-collected seed codebook must yield Arrow-encode
    codes identical to the native seed-frame encode — i.e. the
    collect+slice replicates the in-frame array_sort/slice codebook
    value-for-value (JVM fixed-point rounding on both paths)."""
    from musicflow_spark.operators.similarity import (
        _pq_encode_parts,
        pq_codebook_rows_from_seeds,
        pq_encode_codes_arrow,
    )
    from musicflow_spark.queries.vectors import (
        N_QUERY_VECS,
        PQ_CENT_MOD,
        PQ_CENT_REM,
        PQ_DIM,
        PQ_SCALE,
        PQ_SEED_MAX,
        PQ_SUB,
    )
    from musicflow_spark.sources.catalog import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(
        (F.col("vec_id") % PQ_CENT_MOD == PQ_CENT_REM)
        & (F.col("vec_id") < PQ_SEED_MAX)
    )
    _, native, _ = _pq_encode_parts(
        emb, emb.limit(1), seeds, "vec_id", "embedding", PQ_DIM, PQ_SUB,
        PQ_SCALE,
    )
    cb = pq_codebook_rows_from_seeds(
        seeds, "vec_id", "embedding", PQ_DIM, PQ_SUB, PQ_SCALE
    )
    nat = {r["neighbor_id"]: list(r["codes"]) for r in native.collect()}
    arw = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode_codes_arrow(
            emb, cb, "vec_id", "embedding", PQ_DIM, PQ_SUB, PQ_SCALE
        ).collect()
    }
    assert nat == arw
