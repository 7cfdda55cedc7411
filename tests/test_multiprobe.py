"""Budgeted multi-probe IVF (VERDICT r12 item 6): the recall-vs-scan
curve must PARETO-BEAT fixed-probe serving — some budget reaches the
fixed tier's best recall with strictly less scanned candidates.  Run
at sf0.1 (2000 vectors): the reallocation effect needs cells big
enough that over-scanning a deep-in-cell query costs something; at
sf0.001 the 31-row average cell makes every probe near-free and both
curves collapse."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

SF_DIR = "/root/testdata/sf0.1"
K = 16
N_ITER = 2
NQ = 8
TOPK = 10


@pytest.fixture(scope="module")
def mp_setup(spark):
    from musicflow_spark.operators.embeddings import (
        kmeans_assign_arrow,
        kmeans_centroids,
        kmeans_rank_arrow,
        quantized,
    )
    from musicflow_spark.operators.similarity import brute_force_topk
    from musicflow_spark.sources.catalog import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    cent = kmeans_centroids(emb, k=K, n_iter=N_ITER)
    cent_rows = [
        (int(r["cid"]), list(r["cv"]))
        for r in sorted(cent.collect(), key=lambda r: int(r["cid"]))
    ]
    qq = emb.select(
        F.col("vec_id").alias("id"), quantized("embedding").alias("qv")
    ).localCheckpoint(eager=True)
    assigned = (
        kmeans_assign_arrow(qq, cent_rows)
        .select(F.col("id").alias("neighbor_id"), "cid")
        .localCheckpoint(eager=True)
    )
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("sz"))
    ranked = kmeans_rank_arrow(
        qq.filter(F.col("id") < NQ), cent_rows, K
    ).select(F.col("id").alias("query_id"), "cid", "rn")
    queries = emb.filter(F.col("vec_id") < NQ)
    truth: dict[int, set[int]] = {}
    for r in brute_force_topk(emb, queries, k=TOPK).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return emb, queries, assigned, sizes, ranked, truth, cent_rows


def _recall_scan(emb, queries, assigned, probes, truth):
    from musicflow_spark.operators.similarity import _exact_rerank

    cands = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    scanned = cands.count()
    got: dict[int, set[int]] = {}
    for r in _exact_rerank(
        emb, queries, cands, "vec_id", "embedding", TOPK
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rec = sum(len(got.get(q, set()) & t) for q, t in truth.items()) / sum(
        len(t) for t in truth.values()
    )
    return rec, scanned


def test_budgeted_multiprobe_pareto_beats_fixed(spark, mp_setup):
    emb, queries, assigned, sizes, ranked, truth, _ = mp_setup
    n = emb.count()
    fixed = [
        _recall_scan(
            emb, queries, assigned,
            ranked.filter(F.col("rn") <= p).select("query_id", "cid"), truth,
        )
        for p in (1, 2, 3)
    ]
    w = (
        Window.partitionBy("query_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rs = ranked.join(F.broadcast(sizes), "cid").withColumn(
        "cum_prev", F.coalesce(F.sum("sz").over(w), F.lit(0).cast("long"))
    )
    budgets = [n // 16, n // 8, n // 4]
    multi = [
        _recall_scan(
            emb, queries, assigned,
            rs.filter(F.col("cum_prev") < b).select("query_id", "cid"), truth,
        )
        for b in budgets
    ]
    # recall is nondecreasing in budget (more probes never hurt)
    recs = [r for r, _ in multi]
    assert recs == sorted(recs), multi
    # Pareto: the best fixed-probe recall is reached by some budget
    # at strictly less scan than the cheapest fixed setting reaching it
    best_fixed_rec = max(r for r, _ in fixed)
    fixed_scan_at_best = min(s for r, s in fixed if r >= best_fixed_rec)
    mp_hits = [s for r, s in multi if r >= best_fixed_rec]
    assert mp_hits, (fixed, multi)
    assert min(mp_hits) < fixed_scan_at_best, (fixed, multi)


def test_multiprobe_operator_matches_curve_point(spark, mp_setup):
    """The packaged operator (ivf_multiprobe_topk) reproduces the
    curve machinery: its result at budget n//4 equals the manual
    probe-walk + rerank composition bit-for-bit."""
    from musicflow_spark.operators.similarity import (
        _exact_rerank,
        ivf_multiprobe_topk,
    )

    emb, queries, assigned, sizes, ranked, _truth, cent_rows = mp_setup
    n = emb.count()
    b = n // 4
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_multiprobe_topk(
            emb, queries, cent_rows, b, k=TOPK
        ).collect()
    }
    w = (
        Window.partitionBy("query_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    probes = (
        ranked.join(F.broadcast(sizes), "cid")
        .withColumn(
            "cum_prev", F.coalesce(F.sum("sz").over(w), F.lit(0).cast("long"))
        )
        .filter(F.col("cum_prev") < b)
        .select("query_id", "cid")
    )
    cands = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in _exact_rerank(
            emb, queries, cands, "vec_id", "embedding", TOPK
        ).collect()
    }
    assert got == want
