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
