"""Bit-identity of the r14 Arrow cosine rerank kernel vs the native
interpreted fold — same contract style as the r13 kernel tests
(nearest_centroid_ids_arrow, seed-codebook encode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.similarity import _exact_rerank


@pytest.fixture(scope="module")
def vec_frame(spark):
    # deterministic float32-ish values exercising non-trivial rounding
    rows = [
        (i, [((i * 37 + j * 17) % 101 - 50) / 7.0 for j in range(16)])
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_arrow_rerank_bit_identical(spark, vec_frame):
    queries = vec_frame.filter(F.col("vec_id") < 5)
    cands = (
        queries.select(F.col("vec_id").alias("query_id"))
        .crossJoin(vec_frame.select(F.col("vec_id").alias("neighbor_id")))
        .filter("query_id != neighbor_id")
    )
    nat = _exact_rerank(
        vec_frame, queries, cands, "vec_id", "embedding", 7, arrow=False
    )
    arr = _exact_rerank(
        vec_frame, queries, cands, "vec_id", "embedding", 7, arrow=True
    )
    a = sorted(map(tuple, nat.collect()))
    b = sorted(map(tuple, arr.collect()))
    # bit-exact: cos_sim doubles compared with ==, ranks identical
    assert a == b and len(a) == 35


def test_arrow_rerank_rejects_ragged(spark):
    rows = [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") == 0)
    cands = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, neighbor_id long"
    )
    arr = _exact_rerank(df, queries, cands, "vec_id", "embedding", 2, arrow=True)
    with pytest.raises(Exception, match="ragged|dim mismatch"):
        arr.collect()
