"""Tests for the approximate/sketch query family and the blocked
fuzzy join (musicflow_spark/queries/approx.py, operators/fuzzyjoin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from musicflow_spark.operators.fuzzyjoin import fuzzy_pairs_dist1
from musicflow_spark.queries.approx import (
    WEIGHTED_SAMPLE_K,
    approx_median_prices,
    fuzzy_customer_pairs,
    hll_event_users,
    weighted_sample_orders,
)


class TestFuzzyPairs:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id int, s string")

    def test_substitution_insertion_deletion_found(self, spark):
        rows = [
            (1, "kitten"),
            (2, "mitten"),   # substitution, dist 1
            (3, "kitte"),    # deletion, dist 1
            (4, "kittens"),  # insertion, dist 1
            (5, "sitting"),  # dist 3 from kitten — excluded
        ]
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs_dist1(self._df(spark, rows), "id", "s").collect()
        }
        assert (1, 2, 1) in got
        assert (1, 3, 1) in got
        assert (1, 4, 1) in got
        assert all(a != 5 and b != 5 for a, b, _ in got)
        # kitte vs kittens is dist 2 — must not appear
        assert (3, 4, 2) not in got and (3, 4, 1) not in got

    def test_equal_strings_distance_zero(self, spark):
        rows = [(1, "abc"), (2, "abc")]
        got = fuzzy_pairs_dist1(self._df(spark, rows), "id", "s").collect()
        assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 0)]

    def test_no_duplicate_pairs(self, spark):
        # "ab" and "b" share multiple deletion keys; pair must emit once
        rows = [(1, "ab"), (2, "b")]
        got = fuzzy_pairs_dist1(self._df(spark, rows), "id", "s").collect()
        assert len(got) == 1 and got[0].dist == 1

    def test_matches_quadratic_on_testdata(self, spark, sf_dir):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_name"
        )
        blocked = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs_dist1(cust, "c_custkey", "c_name").collect()
        }
        quad = {
            (r.id_a, r.id_b, r.dist)
            for r in (
                cust.alias("a")
                .join(
                    cust.alias("b"),
                    F.col("a.c_custkey") < F.col("b.c_custkey"),
                )
                .select(
                    F.col("a.c_custkey").alias("id_a"),
                    F.col("b.c_custkey").alias("id_b"),
                    F.levenshtein("a.c_name", "b.c_name").alias("dist"),
                )
                .filter(F.col("dist") <= 1)
                .collect()
            )
        }
        assert blocked == quad and len(blocked) > 0


class TestSketchGates:
    def test_hll_within_bound(self, spark, sf_dir):
        rows = hll_event_users(spark, sf_dir).collect()
        assert rows and all(r.hll_ok for r in rows)

    def test_approx_median_rank_sound(self, spark, sf_dir):
        rows = approx_median_prices(spark, sf_dir).collect()
        assert rows and all(r.p50_ok for r in rows)


class TestWeightedSample:
    def test_deterministic_and_sized(self, spark, sf_dir):
        a = [tuple(r) for r in weighted_sample_orders(spark, sf_dir).collect()]
        b = [tuple(r) for r in weighted_sample_orders(spark, sf_dir).collect()]
        n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        assert a == b
        assert len(a) == min(WEIGHTED_SAMPLE_K, n_orders)
        assert len({k for k, _ in a}) == len(a)

    def test_weight_bias(self, spark, sf_dir):
        # price-weighted sampling must overshoot the corpus mean price
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        mean_all = orders.agg(F.avg("o_totalprice")).first()[0]
        sample = weighted_sample_orders(spark, sf_dir)
        mean_sample = (
            sample.join(orders, "o_orderkey")
            .agg(F.avg("o_totalprice"))
            .first()[0]
        )
        assert mean_sample > mean_all


def test_fuzzy_customer_pairs_symmetric_fields(spark, sf_dir):
    df = fuzzy_customer_pairs(spark, sf_dir)
    rows = df.collect()
    assert all(r.id_a < r.id_b and r.dist <= 1 for r in rows)
