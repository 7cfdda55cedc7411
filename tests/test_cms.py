"""Count-min sketch operator invariants (operators/cms.py): the
fixed grid size, the never-underestimate guarantee, exact-integer
mergeability, unseen-key behavior, and parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)

DEPTH, WIDTH = 4, 64  # narrow grid so collisions actually occur


@pytest.fixture(scope="module")
def keyed(spark):
    # 500 rows over a zipf-ish key mix: key_i appears ~500/(i+1) times
    rows = []
    for i in range(25):
        rows.extend([(f"k{i}",)] * (500 // (i + 1)))
    return spark.createDataFrame(rows, "key string")


def test_grid_bounded_and_mass_conserved(keyed):
    sk = cms_build(keyed, "key", DEPTH, WIDTH).collect()
    assert len(sk) <= DEPTH * WIDTH
    n = keyed.count()
    by_row = {}
    for r in sk:
        assert 0 <= r["bucket"] < WIDTH and 0 <= r["row"] < DEPTH
        by_row[r["row"]] = by_row.get(r["row"], 0) + r["cnt"]
    # every hash row counts every record exactly once
    assert by_row == {i: n for i in range(DEPTH)}


def test_estimate_never_underestimates(spark, keyed):
    sk = cms_build(keyed, "key", DEPTH, WIDTH)
    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, sk, "key", DEPTH, WIDTH)
    bad = est.filter(F.col("cms_est") < F.col("exact")).collect()
    assert not bad, bad


def test_merge_is_exact_integer_addition(spark, keyed):
    a = keyed.filter(F.length("key") == 2)   # k0..k9
    b = keyed.filter(F.length("key") == 3)   # k10..k24
    merged = cms_merge(
        cms_build(a, "key", DEPTH, WIDTH), cms_build(b, "key", DEPTH, WIDTH)
    )
    direct = cms_build(keyed, "key", DEPTH, WIDTH)
    diff = (
        direct.withColumnRenamed("cnt", "d")
        .join(merged.withColumnRenamed("cnt", "m"), ["row", "bucket"], "full_outer")
        .filter(
            F.coalesce(F.col("d"), F.lit(-1)) != F.coalesce(F.col("m"), F.lit(-2))
        )
        .collect()
    )
    assert not diff, diff


def test_unseen_key_estimate_is_collision_mass_only(spark, keyed):
    # wide grid -> essentially no collisions -> unseen key estimates 0
    sk = cms_build(keyed, "key", DEPTH, 1 << 14)
    probe = spark.createDataFrame([("never-seen-key",)], "key string")
    (row,) = cms_estimate(probe, sk, "key", DEPTH, 1 << 14).collect()
    assert row["cms_est"] == 0


def test_parameter_validation(keyed):
    with pytest.raises(ValueError):
        cms_build(keyed, "key", 0, WIDTH)
    with pytest.raises(ValueError):
        cms_merge()


def test_estimate_rejects_clashing_key_columns(spark, keyed):
    sk = cms_build(keyed, "key", DEPTH, WIDTH)
    bad = keyed.withColumn("cnt", F.lit(1))
    with pytest.raises(ValueError, match="clash"):
        cms_estimate(bad, sk, "key", DEPTH, WIDTH)
