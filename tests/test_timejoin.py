"""Temporal-join operator tests: as-of join directions/strictness,
bucketed range join vs a reference theta-join, and the tz-free micros
conversion both are built on."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from musicflow_spark.operators.timejoin import (
    US_PER_DAY,
    asof_join,
    days_between,
    micros,
    overlap_join_bucketed,
    range_join_bucketed,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: per-key "quotes" at known times, with a duplicate-ts
    # pair on key 2 to exercise the documented pre-dedup contract
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 100, "a"),
        (1, _ts("2024-01-01 00:10:00"), 110, "b"),
        (1, _ts("2024-01-01 01:00:00"), 120, "c"),
        (2, _ts("2024-01-01 00:30:00"), 200, "d"),
    ]
    return spark.createDataFrame(rows, "k long, qts timestamp, px long, tag string")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, _ts("2024-01-01 00:05:00"), "t1"),   # between a and b
        (1, _ts("2024-01-01 00:10:00"), "t2"),   # exactly at b
        (1, _ts("2023-12-31 23:00:00"), "t3"),   # before any quote
        (2, _ts("2024-01-01 02:00:00"), "t4"),   # after d
        (3, _ts("2024-01-01 00:00:00"), "t5"),   # key with no quotes
    ]
    return spark.createDataFrame(rows, "k long, tts timestamp, trade string")


def _m(df):
    return {r["trade"]: (r["px"], r["tag"]) for r in df.collect()}


class TestAsofJoin:
    def test_backward_inclusive(self, trades, quotes):
        out = asof_join(trades, quotes, "k", "k", "tts", "qts")
        got = _m(out)
        assert got["t1"] == (100, "a")      # latest at-or-before 00:05
        assert got["t2"] == (110, "b")      # exact match included
        assert got["t3"] == (None, None)    # nothing before -> null
        assert got["t4"] == (200, "d")
        assert got["t5"] == (None, None)    # unseen key -> null
        assert out.count() == trades.count()  # exactly one row per left row

    def test_backward_strict(self, trades, quotes):
        out = asof_join(
            trades, quotes, "k", "k", "tts", "qts", allow_exact_matches=False
        )
        got = _m(out)
        assert got["t2"] == (100, "a")      # equal-ts quote excluded
        assert got["t1"] == (100, "a")

    def test_forward(self, trades, quotes):
        out = asof_join(trades, quotes, "k", "k", "tts", "qts", direction="forward")
        got = _m(out)
        assert got["t3"] == (100, "a")      # earliest at-or-after
        assert got["t1"] == (110, "b")
        assert got["t2"] == (110, "b")      # exact match included
        assert got["t4"] == (None, None)    # nothing after -> null

    def test_null_payload_not_leapfrogged(self, spark):
        # a right row whose PAYLOAD is null must still win over an
        # older row — the struct wrapper prevents last(ignorenulls)
        # from reaching past it field-wise
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:00:00"), 5), (1, _ts("2024-01-01 01:00:00"), None)],
            "k long, qts timestamp, px long",
        )
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 02:00:00"), "x")], "k long, tts timestamp, t string"
        )
        out = asof_join(left, right, "k", "k", "tts", "qts").collect()[0]
        assert out["px"] is None
        assert out["qts"] == _ts("2024-01-01 01:00:00")

    def test_name_clash_suffixed(self, spark, quotes):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:20:00"), 7)], "k long, tts timestamp, px long"
        )
        out = asof_join(left, quotes, "k", "k", "tts", "qts")
        assert "px_right" in out.columns and "px" in out.columns
        row = out.collect()[0]
        assert (row["px"], row["px_right"]) == (7, 110)

    def test_bad_direction(self, trades, quotes):
        with pytest.raises(ValueError):
            asof_join(trades, quotes, "k", "k", "tts", "qts", direction="nearest")


class TestRangeJoinBucketed:
    @pytest.fixture(scope="class")
    def points(self, spark):
        rows = [
            (1, _ts("2024-01-01 12:00:00"), "p1"),
            (1, _ts("2024-01-03 00:00:00"), "p2"),   # at an interval's hi: excluded
            (1, _ts("2024-01-05 23:59:59"), "p3"),
            (2, _ts("2024-01-01 12:00:00"), "p4"),   # other key
        ]
        return spark.createDataFrame(rows, "k long, ts timestamp, p string")

    @pytest.fixture(scope="class")
    def intervals(self, spark):
        rows = [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"), "i1"),
            (1, _ts("2024-01-02 00:00:00"), _ts("2024-01-06 00:00:00"), "i2"),
            (1, _ts("2024-01-04 00:00:00"), _ts("2024-01-04 00:00:00"), "i_empty"),
            (2, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"), "i3"),
        ]
        return spark.createDataFrame(rows, "ik long, lo timestamp, hi timestamp, iv string")

    def _pairs(self, df):
        return sorted((r["p"], r["iv"]) for r in df.collect())

    def test_matches_theta_join(self, points, intervals):
        got = range_join_bucketed(points, intervals, "k", "ik", "ts", "lo", "hi")
        want = points.join(
            intervals,
            (points["k"] == intervals["ik"])
            & (points["ts"] >= intervals["lo"])
            & (points["ts"] < intervals["hi"]),
        )
        assert self._pairs(got) == self._pairs(want)
        assert self._pairs(got) == [
            ("p1", "i1"), ("p2", "i2"), ("p3", "i2"), ("p4", "i3")
        ]

    def test_no_duplicate_pairs_across_buckets(self, points, intervals):
        # i2 spans 4 day-buckets; each matching pair must appear once
        got = range_join_bucketed(points, intervals, "k", "ik", "ts", "lo", "hi")
        pairs = self._pairs(got)
        assert len(pairs) == len(set(pairs))

    def test_left_pads_unmatched_intervals(self, points, intervals):
        got = range_join_bucketed(
            points, intervals, "k", "ik", "ts", "lo", "hi", how="left"
        )
        ivs = sorted(r["iv"] for r in got.collect())
        # i_empty is a zero-length interval: kept by left semantics,
        # padded with null point columns
        assert ivs == ["i1", "i2", "i2", "i3", "i_empty"]
        pad = got.filter(F.col("iv") == "i_empty").collect()[0]
        assert pad["p"] is None and pad["ts"] is None

    def test_wide_buckets_still_exact(self, points, intervals):
        got = range_join_bucketed(
            points, intervals, "k", "ik", "ts", "lo", "hi",
            bucket_us=7 * US_PER_DAY,
        )
        narrow = range_join_bucketed(
            points, intervals, "k", "ik", "ts", "lo", "hi",
            bucket_us=US_PER_DAY // 24,
        )
        assert self._pairs(got) == self._pairs(narrow)


class TestOverlapJoinBucketed:
    @pytest.fixture(scope="class")
    def spans(self, spark):
        rows = [
            # key 1: a overlaps b; b touches c exactly (half-open: NOT
            # an overlap); d is a long interval crossing many buckets
            # that overlaps a, b, AND c
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"), "a"),
            (1, _ts("2024-01-02 00:00:00"), _ts("2024-01-04 00:00:00"), "b"),
            (1, _ts("2024-01-04 00:00:00"), _ts("2024-01-05 00:00:00"), "c"),
            (1, _ts("2023-12-25 00:00:00"), _ts("2024-01-20 00:00:00"), "d"),
            # key 2: same span as a — keys must not cross-match
            (2, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"), "e"),
            # key 1: empty interval — dropped entirely
            (1, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 00:00:00"), "z"),
        ]
        return spark.createDataFrame(rows, "k long, lo timestamp, hi timestamp, iv string")

    def _right(self, spans):
        return spans.select(
            F.col("k").alias("k2"),
            F.col("lo").alias("lo2"),
            F.col("hi").alias("hi2"),
            F.col("iv").alias("iv2"),
        )

    def _pairs(self, df):
        return sorted(
            (r["iv"], r["iv2"]) for r in df.filter(F.col("iv") < F.col("iv2")).collect()
        )

    EXPECT = [("a", "b"), ("a", "d"), ("b", "d"), ("c", "d")]

    def test_matches_theta_join(self, spans):
        got = overlap_join_bucketed(
            spans, self._right(spans), "k", "k2", "lo", "hi", "lo2", "hi2"
        )
        assert self._pairs(got) == self.EXPECT

    def test_exactly_once_across_shared_buckets(self, spans):
        # d shares ~26 day-buckets with a/b/c — each pair must still
        # appear exactly once (emission pinned to the later-start bucket)
        got = overlap_join_bucketed(
            spans, self._right(spans), "k", "k2", "lo", "hi", "lo2", "hi2"
        )
        all_pairs = [(r["iv"], r["iv2"]) for r in got.collect()]
        assert len(all_pairs) == len(set(all_pairs))
        # symmetric closure: every unordered pair shows up in both
        # orientations plus each interval matching itself
        n_intervals = 5  # z is empty and dropped
        assert len(all_pairs) == 2 * len(self.EXPECT) + n_intervals

    def test_random_spans_match_theta_join(self, spark):
        # 300 seeded-random intervals over 20 keys, lengths 0..5 days,
        # bucket deliberately mismatched to the length distribution —
        # the bucketed join must still equal the quadratic theta join
        import random

        rng = random.Random(42)
        base = _ts("2024-01-01 00:00:00")
        rows = []
        for i in range(300):
            lo = base + dt.timedelta(minutes=rng.randrange(0, 60 * 24 * 30))
            hi = lo + dt.timedelta(minutes=rng.randrange(0, 60 * 24 * 5))
            rows.append((rng.randrange(20), lo, hi, f"iv{i}"))
        spans = spark.createDataFrame(
            rows, "k long, lo timestamp, hi timestamp, iv string"
        )
        right = self._right(spans)
        got = overlap_join_bucketed(
            spans, right, "k", "k2", "lo", "hi", "lo2", "hi2",
            bucket_us=3 * US_PER_DAY // 2,
        )
        want = spans.join(
            right,
            (spans["k"] == right["k2"])
            & (spans["lo"] < right["hi2"])
            & (right["lo2"] < spans["hi"]),
        )
        assert sorted(
            (r["iv"], r["iv2"]) for r in got.collect()
        ) == sorted((r["iv"], r["iv2"]) for r in want.collect())

    def test_bucket_width_invariance(self, spans):
        wide = overlap_join_bucketed(
            spans, self._right(spans), "k", "k2", "lo", "hi", "lo2", "hi2",
            bucket_us=40 * US_PER_DAY,
        )
        narrow = overlap_join_bucketed(
            spans, self._right(spans), "k", "k2", "lo", "hi", "lo2", "hi2",
            bucket_us=US_PER_DAY // 4,
        )
        assert self._pairs(wide) == self._pairs(narrow) == self.EXPECT


class TestMicros:
    def test_micros_invariant_to_session_tz(self, spark):
        # the contract both joins rely on: micros() of a STORED value
        # never moves when the session timezone does.  LTZ stores epoch
        # micros directly; an NTZ wall clock diffs against the naive
        # epoch — neither consults the session tz (a plain cast between
        # the flavors does, which is why micros() never casts).
        epoch_us = 1_704_090_600_123_456  # 2024-01-01 06:30:00.123456 UTC
        df = (
            spark.range(1)
            .select(F.timestamp_micros(F.lit(epoch_us)).alias("t"))
            .withColumn("tn", F.expr("TIMESTAMP_NTZ'2024-01-01 06:30:00.123456'"))
        )
        old = spark.conf.get("spark.sql.session.timeZone")
        try:
            for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                row = df.select(
                    micros(df, "t").alias("a"), micros(df, "tn").alias("b")
                ).collect()[0]
                assert row["a"] == epoch_us, tz
                assert row["b"] == epoch_us, tz
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)

    def test_long_passthrough_and_reject(self, spark):
        df = spark.createDataFrame([(42,)], "x long")
        assert df.select(micros(df, "x")).collect()[0][0] == 42
        with pytest.raises(TypeError):
            micros(df.withColumn("s", F.lit("nope")), "s")

    def test_days_between_floor(self, spark):
        df = spark.createDataFrame(
            [
                (_ts("2024-01-08 00:00:00"), _ts("2024-01-01 00:00:01")),
                (_ts("2024-01-08 00:00:01"), _ts("2024-01-01 00:00:01")),
            ],
            "e timestamp, s timestamp",
        )
        vals = [r[0] for r in df.select(days_between(df, "e", "s")).collect()]
        assert vals == [6, 7]


def test_bucket_width_validated(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "k long, lo timestamp, hi timestamp",
    )
    with pytest.raises(ValueError, match="bucket_us"):
        range_join_bucketed(df, df, "k", "k", "lo", "lo", "hi", bucket_us=0)
    with pytest.raises(ValueError, match="bucket_us"):
        overlap_join_bucketed(df, df, "k", "k", "lo", "hi", "lo", "hi", bucket_us=-5)
