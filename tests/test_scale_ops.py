"""Scale-path operators: salted aggregation/join equivalence on
skewed data, and IVF ANN recall against the brute-force oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_topk,
    lsh_neardup_pairs,
)
from musicflow_spark.operators.skew import hot_keys, salted_join, salted_sum_count
from musicflow_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of key 'hot', a long tail of 100 other keys
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    )
    tail = spark.range(2_000).select(
        F.concat(F.lit("k"), (F.col("id") % 100)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail).localCheckpoint(eager=True)


def test_hot_keys_finds_the_hot_key(skewed):
    got = {r["k"] for r in hot_keys(skewed, "k", min_share=0.1).collect()}
    assert got == {"hot"}


def test_salted_sum_count_equals_direct(skewed):
    direct = {
        r["k"]: (r["s"], r["c"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["cnt"])
        for r in salted_sum_count(skewed, ["k"], "v", n_salts=8).collect()
    }
    assert salted == direct


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(100)],
        "k string, label string",
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(skewed, dim, "k", n_salts=8).groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(skewed, dim, "k", n_salts=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("label").isNull()).count() == 2_000


def test_ivf_recall_vs_brute_force(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=10, n_clusters=16, n_probe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random vectors are the worst case for any partitioning index;
    # probing 6/16 clusters must still recover a solid fraction
    assert recall >= 0.4, f"recall {recall:.2f}"
    # and the rank-1 neighbor structure is exact cosine on candidates
    assert all(r["rank"] >= 1 for r in ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=2).collect())


def test_lsh_neardup_sound_and_recalls(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_neardup_pairs(emb, 0.4).collect()
    }
    sketched = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in lsh_neardup_pairs(emb, 0.4, n_planes=6, n_tables=16).collect()
    }
    # soundness: every emitted pair is a true near-dup (exact verify)
    assert set(sketched) <= set(exact)
    for pair, cs in sketched.items():
        assert abs(cs - exact[pair]) < 1e-9
    # recall: this corpus is all near-orthogonal random vectors with
    # qualifying pairs at cos 0.4-0.6 — the SRP worst case; ~0.70
    # measured.  Clustered real embeddings recall far higher.
    recall = len(sketched) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_semantic_dedup_min_id_wins_within_cluster(spark):
    from musicflow_spark.operators.similarity import semantic_dedup_flags

    # two well-separated centroids on orthogonal axes; ids 1/2/3 are
    # near-identical x-ish vectors (one dup group), id 4 is an x-ish
    # vector below threshold, ids 10/11 are identical y-ish vectors in
    # the OTHER cluster (their own dup pair); id 3 is similar to 10 in
    # angle? no — cross-cluster pairs are never compared by design
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.998, -0.02, 0.0]),
        (4, [0.5, 0.5, 0.70]),     # same cluster, cosine ~0.5 to id 1
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cluster_id int, centroid array<double>",
    )
    out = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in semantic_dedup_flags(emb, cent, 0.9).collect()
    }
    assert out[1] == (0, True)     # smallest id of the dup group survives
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[4][1] is True       # below threshold: kept
    assert out[10] == (1, True)    # other cluster: its own min-id wins
    assert out[11] == (1, False)
    assert len(out) == 6           # every input row flagged exactly once


def test_pq_recall_and_determinism(spark):
    from musicflow_spark.operators.similarity import pq_topk

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    seeds = emb.filter(F.col("vec_id") % 31 == 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    got = pq_topk(emb, queries, seeds, k=10, dim=64, n_sub=8,
                  n_candidates=64).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    # random vectors are PQ's worst case too (no cluster structure for
    # the codebook to exploit); the ADC ordering must still recover a
    # solid fraction scanning 64 of 500 candidates after encode
    assert recall >= 0.4, f"recall {recall:.2f}"
    # deterministic: integer-grid distances admit no tie ambiguity
    again = pq_topk(emb, queries, seeds, k=10, dim=64, n_sub=8,
                    n_candidates=64).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # every query emits exactly k ranked rows (corpus >> k)
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_ivfpq_recall_pruning_and_determinism(spark):
    from musicflow_spark.operators.similarity import ivfpq_topk, nearest_centroids

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    # mod-31 stride -> ~16 coarse clusters at sf0.001, so probe=4
    # genuinely prunes (~25% of cluster lists scanned)
    cent = emb.filter(F.col("vec_id") % 31 == 5).select(
        F.col("vec_id").alias("cluster_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    seeds = emb.filter(F.col("vec_id") % 31 == 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    got = ivfpq_topk(emb, queries, cent, seeds, k=10, n_probe=4,
                     dim=64, n_sub=8, n_candidates=64).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    # pruned ADC scan of random vectors — the compounded worst case;
    # still must recover a solid fraction
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"recall {recall:.2f}"
    # IVF containment: every returned neighbor's cluster is in its
    # query's probe list (the pruning is real, not decorative)
    assign = {
        r["nid"]: r["cluster_id"]
        for r in nearest_centroids(emb, cent, "vec_id", "embedding",
                                   "nid", "v", 1).collect()
    }
    probes: dict[int, set] = {}
    for r in nearest_centroids(queries, cent, "vec_id", "embedding",
                               "qid", "v", 4).collect():
        probes.setdefault(r["qid"], set()).add(r["cluster_id"])
    for r in got:
        assert assign[r["neighbor_id"]] in probes[r["query_id"]]
    # deterministic: integer-grid ADC admits no tie ambiguity
    again = ivfpq_topk(emb, queries, cent, seeds, k=10, n_probe=4,
                       dim=64, n_sub=8, n_candidates=64).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pq_rejects_indivisible_dim(spark):
    import pytest as _pytest

    from musicflow_spark.operators.similarity import pq_topk

    emb = read_table(spark, SF_DIR, "embeddings")
    with _pytest.raises(ValueError, match="divisible"):
        pq_topk(emb, emb.limit(1), emb.limit(3), dim=64, n_sub=7)


def test_knn_graph_candidate_join_is_not_broadcast(spark):
    """kNN-graph mode (broadcast_queries=False) must plan the
    (table_id, bucket) candidate join as a SHUFFLE join — with queries
    == corpus a broadcast contract would ship the whole corpus to
    every task at scale."""
    from musicflow_spark.operators.similarity import lsh_topk

    emb = read_table(spark, SF_DIR, "embeddings")
    out = lsh_topk(emb, emb, k=3, dim=64, n_planes=6, n_tables=4,
                   broadcast_queries=False)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # the only broadcasts are the two 1-row plane frames
    assert plan.count("BroadcastNestedLoopJoin") <= 4  # AQE dups subtrees
    # and the default bounded-query mode still broadcasts
    q = emb.filter(F.col("vec_id") < 8)
    out_b = lsh_topk(emb, q, k=3, dim=64, n_planes=6, n_tables=4)
    out_b.write.format("noop").mode("overwrite").save()
    plan_b = out_b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b, plan_b


def test_salted_topk_equals_direct_window_on_skewed(spark, skewed):
    from pyspark.sql import Window

    from musicflow_spark.operators.skew import salted_topk

    # v alone is not a total order on the hot key (10k rows, v in 0..6)
    # -> add a deterministic synthetic tiebreak on both sides
    keyed = skewed.withColumn("tb", F.xxhash64("k", "v"))
    w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("tb"))
    direct = keyed.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    salted = salted_topk(keyed, ["k"], [F.desc("v"), F.asc("tb")], k=5, n_salts=8)
    assert sorted(map(tuple, direct.select("k", "v", "rank").collect())) == \
        sorted(map(tuple, salted.select("k", "v", "rank").collect()))


def test_salted_topk_partial_phase_really_prunes(spark, skewed):
    """The survivor frame entering the final window must hold at most
    k rows per (key, salt) — the bound that fixes the last reducer."""
    from musicflow_spark.operators.skew import salted_topk

    keyed = skewed.withColumn("tb", F.xxhash64("k", "v"))
    out = salted_topk(keyed, ["k"], [F.desc("v"), F.asc("tb")], k=3, n_salts=4)
    rows = out.groupBy("k").count().collect()
    assert all(r["count"] == 3 for r in rows)  # k rows per key, all keys


def test_sq8_recall_beats_pq_and_is_deterministic(spark):
    """SQ8 keeps one byte PER DIMENSION (vs PQ's one byte per 8-dim
    subspace), so on structure-free random vectors its candidate
    ordering must recover brute-force neighbors at least as well as
    PQ's documented floor, and much better in practice."""
    from musicflow_spark.operators.similarity import sq_topk

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    got = sq_topk(emb, queries, k=10, dim=64, n_candidates=40).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall {recall:.2f}"
    again = sq_topk(emb, queries, k=10, dim=64, n_candidates=40).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_sq8_codes_are_bytes_on_the_trained_grid(spark):
    """Corpus codes must span [0, levels] and hit both rails (the min
    and max row of every dimension code to 0 and levels exactly)."""
    from musicflow_spark.operators.similarity import _sq_code, _sq_stats

    emb = read_table(spark, SF_DIR, "embeddings")
    stats = _sq_stats(emb, "embedding", 64)
    codes = emb.crossJoin(F.broadcast(stats)).select(
        _sq_code("embedding", 64, 255).alias("code")
    )
    agg = codes.select(
        F.array_min("code").alias("lo"), F.array_max("code").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert agg["lo"] == 0 and agg["hi"] == 255


def test_ivf_trained_recall_and_probe_containment(spark):
    """The trained-quantizer IVF must recover a solid fraction of the
    brute-force neighbors, and every returned neighbor's trained
    cluster must be in its query's probe list."""
    from musicflow_spark.queries.vectors import (
        IVF_TRAIN_PROBE,
        knn_ivf_trained,
    )
    from musicflow_spark.operators.embeddings import (
        _kmeans_assign,
        kmeans_centroids,
        quantized,
    )

    got = knn_ivf_trained(spark, SF_DIR).collect()
    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"recall {recall:.2f}"

    cent = kmeans_centroids(emb, k=8, n_iter=3)
    qq = emb.select(F.col("vec_id").alias("id"), quantized("embedding").alias("qv"))
    assign = {r["id"]: r["cid"] for r in _kmeans_assign(qq, cent).collect()}
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("d2", "cid")
    probes: dict[int, set] = {}
    for r in (
        qq.filter(F.col("id") < 8)
        .crossJoin(F.broadcast(cent))
        .select("id", "cid", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TRAIN_PROBE)
        .collect()
    ):
        probes.setdefault(r["id"], set()).add(r["cid"])
    for r in got:
        assert assign[r["neighbor_id"]] in probes[r["query_id"]]


def test_jitter_geometry_identity_at_n1():
    # tools/scale_stress.py --jitter times x1 through _jitter_fn(q, 1);
    # that MUST be the registered call (every geometry knob at its
    # default) or the measured ratio compares different plans
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scale_stress",
        os.path.join(os.path.dirname(__file__), "..", "tools", "scale_stress.py"),
    )
    ss = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ss)
    from musicflow_spark.queries.vectors import (
        HNSW_MOD2,
        HNSW_PLANES1,
        LSH_PLANES,
    )

    extra0 = max(0, 1 - 1).bit_length()
    assert extra0 == 0
    # n=10 geometry: +4 planes (ceil log2 10), apex stride x10
    extra10 = max(0, 10 - 1).bit_length()
    assert extra10 == 4
    # the n=1 lambdas call with defaults — spot-check by introspecting
    # the closures' geometry dict
    fn = ss._jitter_fn("knn_hnsw", 1)
    geo = fn.__closure__ and {
        k: v
        for cell in fn.__closure__
        for k, v in (
            cell.cell_contents.items()
            if isinstance(cell.cell_contents, dict)
            else []
        )
    }
    assert geo == {
        "mod2": HNSW_MOD2,
        "planes1": HNSW_PLANES1,
        "graph_planes": LSH_PLANES,
    }


def test_jitter_sign_flip_is_within_replica_isometry(spark):
    # per-replica sign flips (scale_stress._replica jitter=True) must
    # preserve within-replica cosines EXACTLY and decorrelate the
    # replica from the base — the property that lets graph-ANN scale
    # curves measure the plan instead of fixture bucket merges
    import importlib.util
    import math
    import os

    spec = importlib.util.spec_from_file_location(
        "scale_stress",
        os.path.join(os.path.dirname(__file__), "..", "tools", "scale_stress.py"),
    )
    ss = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ss)

    emb = read_table(spark, SF_DIR, "embeddings").limit(40)
    base = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    rep = ss._replica(emb, "embeddings", 1, jitter=True)
    jit = {r["vec_id"] - ss.KEY_STRIDE: r["embedding"] for r in rep.collect()}
    assert set(jit) == set(base)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    ids = sorted(base)[:10]
    for a in ids[:5]:
        for b in ids[5:]:
            # exact isometry: float sign flip is lossless
            assert cos(base[a], base[b]) == pytest.approx(
                cos(jit[a], jit[b]), abs=0.0
            )
    # decorrelated vs base: a vector and its own jittered copy are far
    # from parallel (|cos| ~ N(0, 1/sqrt(64)) — use a loose 0.6 bound)
    for a in ids:
        assert abs(cos(base[a], jit[a])) < 0.6
