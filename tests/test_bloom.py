"""Bloom-filter runtime-filter operator (operators/bloomfilter.py).

Covers the three contract points: no false negatives (the correctness
load-bearing half), a bounded false-positive rate at the documented
sizing, and the plan shape — the probe filter must run map-side at the
scan (no shuffle on the probe side; the bitmap arrives as a 1-row
broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from musicflow_spark.operators.bloomfilter import (
    bloom_build,
    bloom_positions,
    bloom_probe,
)

M_BITS = 1 << 16
N_HASHES = 7


def _frames(spark):
    keys = spark.range(0, 500).select((F.col("id") * 13 + 1).alias("k"))
    probe = spark.range(0, 30000).select(
        (F.col("id") % 9973).alias("k"), F.lit(1).alias("v")
    )
    return keys, probe


def test_no_false_negatives(spark):
    keys, probe = _frames(spark)
    bloom = bloom_build(keys, "k", m_bits=M_BITS, n_hashes=N_HASHES)
    passed = bloom_probe(probe, "k", bloom, m_bits=M_BITS, n_hashes=N_HASHES)
    exact = probe.join(keys.distinct(), "k", "left_semi")
    # every exact member must survive the bloom prefilter
    dropped = exact.join(
        passed.select("k").distinct(), "k", "left_anti"
    ).count()
    assert dropped == 0


def test_false_positive_rate_bounded(spark):
    keys, probe = _frames(spark)
    bloom = bloom_build(keys, "k", m_bits=M_BITS, n_hashes=N_HASHES)
    passed_keys = {
        r.k
        for r in bloom_probe(
            probe.select("k").distinct(), "k", bloom,
            m_bits=M_BITS, n_hashes=N_HASHES,
        ).collect()
    }
    true_keys = {r.k for r in keys.collect()} & {
        r.k for r in probe.select("k").distinct().collect()
    }
    n_candidates = probe.select("k").distinct().count()
    fps = len(passed_keys - true_keys)
    # n=500 keys in m=2^16 bits with k=7: theoretical FP ~1e-6; allow
    # three orders of magnitude of slack and it still proves pruning
    assert fps / n_candidates < 0.005, fps


def test_dense_bitmap_shape(spark):
    keys, _ = _frames(spark)
    row = bloom_build(keys, "k", m_bits=M_BITS, n_hashes=N_HASHES).collect()
    assert len(row) == 1
    words = row[0]["__bloom__"]
    # dense: exactly m/64 words, fixed size regardless of key count
    assert len(words) == M_BITS // 64
    # 500 keys x 7 hashes set <= 3500 bits; the bitmap is mostly zero
    set_bits = sum(bin(w & (2**64 - 1)).count("1") for w in words)
    assert 0 < set_bits <= 500 * N_HASHES


def test_positions_in_range_and_stable(spark):
    df = spark.range(0, 200).select(
        bloom_positions(F.col("id"), M_BITS, N_HASHES).alias("pos")
    )
    rows = df.collect()
    assert all(0 <= p < M_BITS for r in rows for p in r.pos)
    assert rows == df.collect()  # deterministic


def test_probe_side_has_no_shuffle(spark):
    keys, probe = _frames(spark)
    bloom = bloom_build(keys, "k", m_bits=M_BITS, n_hashes=N_HASHES)
    passed = bloom_probe(probe, "k", bloom, m_bits=M_BITS, n_hashes=N_HASHES)
    passed.collect()
    plan = passed._jdf.queryExecution().executedPlan().toString()
    # the bitmap side aggregates (1 hash exchange: the bit_or groupBy,
    # counted twice because the AQE plan string repeats initial+final
    # subtrees); the PROBE side must contribute none — the only join
    # is the 1-row broadcast nested loop carrying the bitmap
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BroadcastNestedLoopJoin" in plan
    # the filter must sit above the probe scan, not after a shuffle:
    # no SortMergeJoin / ShuffledHashJoin anywhere
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_null_keys_pass_only_with_null_in_build(spark):
    """NULL hashes as a distinct constant: the probe admits a probe-side
    NULL iff the build side had one — a SUPERSET of equi-join semantics
    (which never match NULL); the exact verify join downstream restores
    join semantics exactly."""
    probe = spark.createDataFrame([(1,), (None,), (5,)], "k int")
    with_null = bloom_build(
        spark.createDataFrame([(1,), (None,)], "k int"), "k",
        m_bits=1 << 10, n_hashes=3,
    )
    got = {
        r.k
        for r in bloom_probe(
            probe, "k", with_null, m_bits=1 << 10, n_hashes=3
        ).collect()
    }
    assert 1 in got and None in got and 5 not in got
    without_null = bloom_build(
        spark.createDataFrame([(1,), (2,)], "k int"), "k",
        m_bits=1 << 10, n_hashes=3,
    )
    got2 = {
        r.k
        for r in bloom_probe(
            probe, "k", without_null, m_bits=1 << 10, n_hashes=3
        ).collect()
    }
    assert None not in got2


def test_bloom_params_sizing(spark):
    from musicflow_spark.operators.bloomfilter import bloom_params

    m, k = bloom_params(73_000, 0.01)
    assert m == 1 << 20 and 5 <= k <= 10
    m2, k2 = bloom_params(100, 0.001)
    assert m2 >= 1 << 6 and k2 >= 1
    # realized FP at the suggested sizing stays under target: probe
    # disjoint keys and count survivors
    from pyspark.sql import functions as F
    m3, k3 = bloom_params(500, 0.01)
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    neg = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", m_bits=m3, n_hashes=k3)
    fps = bloom_probe(neg, "k", bloom, m_bits=m3, n_hashes=k3).count()
    assert fps / 20_000 < 0.02, fps  # 2x slack on the 1% target


def test_probe_rejects_non_identifier_key(spark):
    """key_col is interpolated into raw SQL — non-identifier names
    must raise up front (qsketch-parity guard), never mis-parse."""
    import pytest

    keys, probe = _frames(spark)
    bloom = bloom_build(keys, "k", m_bits=1 << 10, n_hashes=3)
    for bad in ("k; drop", "k k", "1k", "k`"):
        with pytest.raises(ValueError, match="identifier"):
            bloom_probe(probe, bad, bloom, m_bits=1 << 10, n_hashes=3)


def test_probe_raises_on_m_bits_mismatch(spark):
    """Probing with m_bits different from the build side would index a
    different modulus and silently produce false negatives; the width
    guard must turn that into a loud runtime error instead."""
    import pytest

    keys, probe = _frames(spark)
    bloom = bloom_build(keys, "k", m_bits=1 << 12, n_hashes=3)
    bad = bloom_probe(probe, "k", bloom, m_bits=1 << 14, n_hashes=3)
    with pytest.raises(Exception, match="m_bits mismatch"):
        bad.collect()
    # matched parameters still pass cleanly
    ok = bloom_probe(probe, "k", bloom, m_bits=1 << 12, n_hashes=3)
    assert ok.count() > 0
