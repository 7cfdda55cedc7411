"""Structured Streaming tests: every streaming operator must converge
to its batch twin when fed the same events as an in-order file stream
(multiple micro-batches via maxFilesPerTrigger=1, availableNow
termination, a far-future flush sentinel to advance the watermark
past all real data)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from musicflow_spark.queries.events import (
    hourly_event_stats,
    latest_event_per_user,
    session_window_stats,
)
from musicflow_spark.sources.catalog import read_table
from musicflow_spark.streaming import (
    event_stream,
    foreach_batch_upsert,
    hourly_event_stats_stream,
    latest_event_per_user_stream,
    user_sessions_stream,
)

SF_DIR = "/root/testdata/sf0.001"
SENTINEL_USER = -1


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Events split into 3 ts-ordered chunk files plus a flush
    sentinel 30 days past the end (advances the global watermark so
    every real window/session finalizes in append mode)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    ev = read_table(spark, SF_DIR, "events").orderBy("ts").localCheckpoint(eager=True)
    n = ev.count()
    rows_per_chunk = n // 3 + 1
    chunked = ev.withColumn(
        "chunk",
        F.floor((F.row_number().over(Window.orderBy("ts", "event_id")) - 1) / rows_per_chunk),
    )
    for i in range(3):
        chunked.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "append"
        ).parquet(path)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(10**9, max_ts + dt.timedelta(days=30), SENTINEL_USER, "flush", 0.0, "{}")],
        ev.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(path)
    return path


def _run_to_memory(df, name: str, tmp_path, mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


def test_hourly_stream_matches_batch(spark, stream_dir, tmp_path):
    stream = hourly_event_stats_stream(
        event_stream(spark, stream_dir, max_files_per_trigger=1)
    )
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _run_to_memory(stream, "hourly", tmp_path, "append").collect()
        if r["event_type"] != "flush"
    }
    want = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_event_stats(spark, SF_DIR).collect()
    }
    assert got == want


def test_sessions_stream_matches_batch_session_window(spark, stream_dir, tmp_path):
    stream = user_sessions_stream(event_stream(spark, stream_dir, max_files_per_trigger=1))
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["session_value"])
        for r in _run_to_memory(stream, "sessions", tmp_path, "append").collect()
        if r["user_id"] != SENTINEL_USER
    }
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["session_value"])
        for r in session_window_stats(spark, SF_DIR).collect()
    }
    assert got == want


def test_stateful_latest_event_converges(spark, stream_dir, tmp_path):
    # update-mode stateful operator: fold every micro-batch's updates
    # into an upsert dict; final state must equal the batch top-1
    stream = latest_event_per_user_stream(
        event_stream(spark, stream_dir, max_files_per_trigger=1)
    )
    final: dict = {}

    def absorb(batch, _bid):
        for r in batch.collect():
            final[r["user_id"]] = (r["event_id"], r["ts"], r["event_type"])

    q = (
        stream.writeStream.foreachBatch(absorb)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_latest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final.pop(SENTINEL_USER, None)
    want = {
        r["user_id"]: (r["event_id"], r["ts"], r["event_type"])
        for r in latest_event_per_user(spark, SF_DIR).collect()
    }
    assert final == want


def test_foreach_batch_upsert_sink(spark, stream_dir, tmp_path):
    # update-mode windowed agg -> keyed parquet upsert; the sink's
    # final state is the complete aggregate (last write per key wins)
    out = str(tmp_path / "hourly_upsert")
    stream = hourly_event_stats_stream(
        event_stream(spark, stream_dir, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_upsert(out, ["hour_start", "event_type"])
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_upsert"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
        if r["event_type"] != "flush"
    }
    want = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_event_stats(spark, SF_DIR).collect()
    }
    assert got == want


@pytest.mark.slow
def test_streaming_marts_converge_to_batch(spark, musicflow_sources, tmp_path):
    """Log rows arriving as a 2-chunk stream must leave the warehouse
    marts identical to a one-shot batch build over the same rows."""
    from musicflow_spark.config import PipelineConfig
    from musicflow_spark.plans.pipeline import build_all
    from musicflow_spark.streaming.pipeline import MARTS, stream_log_to_marts

    cfg = PipelineConfig()
    log = musicflow_sources["spotify_log"]
    stream_dir = str(tmp_path / "log_stream")
    half = log.filter(F.col("log_id") < 6)
    rest = log.filter(F.col("log_id") >= 6)
    half.coalesce(1).write.mode("append").parquet(stream_dir)
    rest.coalesce(1).write.mode("append").parquet(stream_dir)

    static = {k: v for k, v in musicflow_sources.items() if k != "spotify_log"}
    wh = str(tmp_path / "wh")
    q = stream_log_to_marts(
        spark, stream_dir, static, cfg, wh, str(tmp_path / "ckpt_marts")
    )
    q.awaitTermination(300)

    batch_models = build_all(musicflow_sources, cfg)
    for mart in MARTS:
        got = spark.read.parquet(f"{wh}/{mart}")
        want = batch_models[mart]
        cols = sorted(set(got.columns) - {"id"})  # W1 surrogate ids are order-dependent
        key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731 - None-safe sort
        g = sorted((tuple(r) for r in got.select(*cols).collect()), key=key)
        w = sorted((tuple(r) for r in want.select(*cols).collect()), key=key)
        assert g == w, mart
    # the upserted log equals the full input
    assert spark.read.parquet(f"{wh}/spotify_log").count() == log.count()


@pytest.mark.slow
def test_full_dag_streaming_twin_converges_and_leaves_cache_warm(
    spark, musicflow_sources, tmp_path
):
    """VERDICT r03 stretch: the COMPLETE pipeline (extract -> match
    cascade with cache -> models -> marts) driven by a library file
    stream.  Library saves arrive in two playlist-aligned chunks;
    after the stream drains, (a) every mart equals the one-shot batch
    build, and (b) the cache is complete: a fully-warm re-run with a
    poison candidate source (raises on ANY search) succeeds — the
    streamed run cached every video and every other-user group."""
    from musicflow_spark.config import PipelineConfig
    from musicflow_spark.matching import CatalogCandidateSource
    from musicflow_spark.plans.dag import musicflow_pipeline
    from musicflow_spark.plans.pipeline import build_all
    from musicflow_spark.streaming.pipeline import MARTS, stream_library_to_marts
    from tests.test_matching_cache import PoisonSource

    cfg = PipelineConfig()
    lib = musicflow_sources["youtube_library"]
    src = CatalogCandidateSource(
        musicflow_sources["spotify_tracks"],
        musicflow_sources["spotify_albums"],
        musicflow_sources["spotify_playlists_others"],
    )
    # playlist-aligned chunks: other-user groups stay whole per batch,
    # so the group-grain cache entries are stable across batches
    chunk1_pls = ("LM", "PL_rock", "PL_other1")
    stream_dir = str(tmp_path / "lib_stream")
    lib.filter(F.col("youtube_playlist_id").isin(*chunk1_pls)).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    lib.filter(~F.col("youtube_playlist_id").isin(*chunk1_pls)).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)

    wh = str(tmp_path / "wh_dag")
    cache = str(tmp_path / "cache")
    q = stream_library_to_marts(
        spark, stream_dir, musicflow_sources, cfg, src, wh,
        str(tmp_path / "ckpt_dag"), cache_path=cache,
    )
    q.awaitTermination(600)

    # (a) convergence: streamed marts == one-shot batch marts
    batch_models = build_all(
        dict(
            musicflow_sources,
            **{
                t: spark.read.parquet(f"{wh}/{t}")
                for t in ("spotify_log", "spotify_tracks", "spotify_albums",
                          "spotify_playlists_others")
            },
        ),
        cfg,
    )
    batch_wh = str(tmp_path / "wh_batch")
    batch_ctx = musicflow_pipeline(
        spark, musicflow_sources, cfg, src, batch_wh
    ).run()
    for mart in MARTS:
        got = spark.read.parquet(f"{wh}/{mart}")
        want = batch_ctx[mart]
        cols = sorted(set(got.columns) - {"id"})  # W1 ids are order-dependent
        key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
        g = sorted((tuple(r) for r in got.select(*cols).collect()), key=key)
        w = sorted((tuple(r) for r in want.select(*cols).collect()), key=key)
        assert g == w, mart
    del batch_models  # convergence is against the independent batch run

    # (b) the stream left a COMPLETE cache: fully-warm rerun with a
    # poison source (raises on any search) must succeed
    warm = musicflow_pipeline(
        spark, musicflow_sources, cfg, PoisonSource(), str(tmp_path / "wh_warm"),
        cache_path=cache,
    )
    warm_ctx = warm.run()
    assert warm_ctx["spotify_log"].count() == spark.read.parquet(f"{wh}/spotify_log").count()


@pytest.fixture(scope="module")
def replayed_stream_dir(spark, tmp_path_factory):
    """The same events written TWICE as separate chunk files (an
    at-least-once replay inside the watermark) plus the flush
    sentinel."""
    path = str(tmp_path_factory.mktemp("events_replay") / "events")
    ev = read_table(spark, SF_DIR, "events").localCheckpoint(eager=True)
    for _ in range(2):
        ev.coalesce(1).write.mode("append").parquet(path)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(10**9, max_ts + dt.timedelta(days=30), SENTINEL_USER, "flush", 0.0, "{}")],
        ev.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(path)
    return path


def test_dedup_stream_drops_replays(spark, replayed_stream_dir, tmp_path):
    from musicflow_spark.streaming import dedup_stream

    stream = event_stream(spark, replayed_stream_dir, max_files_per_trigger=1)
    out = _run_to_memory(
        dedup_stream(stream, ["event_id"], watermark="90 days"),
        "dedup_stream_out",
        tmp_path,
        "append",
    )
    got = out.filter(F.col("user_id") != SENTINEL_USER)
    n_batch_distinct = read_table(spark, SF_DIR, "events").count()
    # every replayed duplicate dropped, every original kept exactly once
    assert got.count() == n_batch_distinct
    assert got.select("event_id").distinct().count() == n_batch_distinct


def test_content_dedup_stream_collapses_same_payload(spark, replayed_stream_dir, tmp_path):
    from musicflow_spark.operators.textstats import normalize_for_fingerprint
    from musicflow_spark.streaming import content_dedup_stream

    stream = event_stream(spark, replayed_stream_dir, max_files_per_trigger=1)
    out = _run_to_memory(
        content_dedup_stream(stream, text_col="props", watermark="90 days"),
        "content_dedup_out",
        tmp_path,
        "append",
    )
    got = out.filter(F.col("user_id") != SENTINEL_USER)
    want = (
        read_table(spark, SF_DIR, "events")
        .select(F.md5(normalize_for_fingerprint("props")).alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == want
    assert got.select("fp").distinct().count() == want


@pytest.mark.slow
def test_minhash_candidates_stream_converges_to_batch(spark, tmp_path):
    from musicflow_spark.operators.dedup import (
        minhash_lsh_candidates,
        with_hashed_shingles,
    )
    from musicflow_spark.streaming import minhash_candidates_stream

    docs = read_table(spark, SF_DIR, "documents").localCheckpoint(eager=True)
    # 3 chunk files -> 3+ micro-batches with maxFilesPerTrigger=1
    path = str(tmp_path / "docs_stream")
    for lo, hi in ((0, 170), (170, 340), (340, 10_000)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(path)
    # replay the first chunk: already-seen docs must not re-pair
    docs.filter(F.col("doc_id") < 170).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = minhash_candidates_stream(stream, k=32, bands=16)
    q = (
        out.writeStream.format("memory")
        .queryName("mh_cands_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.table("mh_cands_stream").collect()
    }

    sets = with_hashed_shingles(docs).filter(F.size("sh") > 0)
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, k=32, bands=16, sets=sets).collect()
    }
    assert got == want
    assert len(want) > 0  # the corpus does contain near-dups


def test_suffix_removable_stream_converges_to_batch(spark, tmp_path):
    """Cross-chunk keep-first: a window whose second occurrence
    arrives in a LATER micro-batch must be cut there while the
    first-arrived keeper survives — and the assembled result must
    equal the batch suffix_span_scrub verbatim."""
    import os

    from musicflow_spark.operators.dedup import _scrub_tail, suffix_span_scrub
    from musicflow_spark.operators.textstats import tokens
    from musicflow_spark.streaming.dedup import suffix_removable_stream

    span = "quick brown foxes leap high"  # 5 tokens
    rows = [
        (1, f"intro {span} tail words here"),
        (2, f"pad {span} also inside chunk one"),  # within-chunk dup
        (5, f"later arrival with {span} again"),  # cross-chunk dup
        (6, "completely unrelated text with no repeats at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs_sfx")
    # chunk 1: docs 1-2; chunk 2: docs 5-6 — strictly increasing
    # mtimes pin the arrival order (the keep-first contract)
    stamped: set[str] = set()
    for i, (lo, hi) in enumerate(((0, 3), (3, 10))):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(path)
        # stamp only files NEW in this chunk (seen-set, like
        # streamtwins._bump_mtimes) — re-stamping chunk-1 files would
        # equalize mtimes and leave arrival order to the arbitrary
        # part-UUID path tiebreak, flipping keep-first (ADVICE r09)
        for name in sorted(os.listdir(path)):
            full = os.path.join(path, name)
            if os.path.isfile(full) and full not in stamped:
                os.utime(full, (1_600_000_000 + i, 1_600_000_000 + i))
                stamped.add(full)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        suffix_removable_stream(stream, min_span=5)
        .writeStream.format("memory")
        .queryName("sfx_removable_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sfx"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    removable = spark.table("sfx_removable_stream").select("doc_id", "pos")
    base = docs.select("doc_id", tokens("text").alias("__toks__"))
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in _scrub_tail(base, removable, n=5, min_run_grams=1).collect()
    }
    want = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in suffix_span_scrub(docs, min_span=5).collect()
    }
    assert got == want
    # and the semantics are the intended ones: first keeps, later cut
    assert got[1][0] == 0 and span in got[1][1]
    assert got[2][0] == 5 and span not in got[2][1]
    assert got[5][0] == 5 and span not in got[5][1]
    assert got[6][0] == 0


def test_asof_join_stream_converges_to_batch(spark, stream_dir, tmp_path):
    from musicflow_spark.operators.timejoin import asof_join
    from musicflow_spark.queries.timeseries import _orders_deduped
    from musicflow_spark.streaming import asof_join_stream

    orders = _orders_deduped(spark, SF_DIR)
    stream = event_stream(spark, stream_dir, max_files_per_trigger=1).select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_stream(
        stream, orders, "user_id", "o_custkey", "ts", "o_orderdate"
    )
    got = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in _run_to_memory(out, "asof_stream", tmp_path, "append").collect()
        if r["user_id"] != SENTINEL_USER
    }
    batch_left = spark.read.parquet(stream_dir).select(
        "event_id", "user_id", "ts"
    ).filter(F.col("user_id") != SENTINEL_USER)
    want = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in asof_join(
            batch_left, orders, "user_id", "o_custkey", "ts", "o_orderdate"
        ).collect()
    }
    assert got == want
    assert any(v[0] is not None for v in want.values())


def test_range_join_stream_converges_to_batch(spark, stream_dir, tmp_path):
    from musicflow_spark.operators.timejoin import range_join_bucketed
    from musicflow_spark.streaming import range_join_stream

    # static intervals: each user's first week, derived from the batch
    # view of the same data (a stream-side interval build would need a
    # streaming agg — the operator's contract is stream points x
    # static intervals)
    batch_left = spark.read.parquet(stream_dir).select(
        "event_id", "user_id", "ts"
    ).filter(F.col("user_id") != SENTINEL_USER)
    iv = (
        batch_left.groupBy("user_id")
        .agg(F.min("ts").alias("lo"))
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 7 DAYS"))
        .withColumnRenamed("user_id", "iv_user")
    )
    stream = event_stream(spark, stream_dir, max_files_per_trigger=1).select(
        "event_id", "user_id", "ts"
    ).filter(F.col("user_id") != SENTINEL_USER)
    out = range_join_stream(
        stream, iv, "user_id", "iv_user", "ts", "lo", "hi"
    )
    got = {
        (r["event_id"], r["iv_user"])
        for r in _run_to_memory(out, "range_stream", tmp_path, "append").collect()
    }
    want = {
        (r["event_id"], r["iv_user"])
        for r in range_join_bucketed(
            batch_left, iv, "user_id", "iv_user", "ts", "lo", "hi"
        ).collect()
    }
    assert got == want
    assert len(want) > 0


# interval streams carved from the event files: even event_ids on the
# left, odd on the right, each a 30-minute activity span keyed by user
# — shared by the convergence and state-eviction tests so both always
# exercise the SAME join
def _overlap_shape(df, tag):
    side = 0 if tag == "l" else 1
    return (
        df.filter(F.col("user_id") != SENTINEL_USER)
        .filter(F.col("event_id") % 2 == side)
        .select(
            F.col("event_id").alias(f"{tag}_id"),
            F.col("user_id").alias(f"{tag}_user"),
            F.col("ts").alias(f"{tag}_lo"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias(f"{tag}_hi"),
        )
    )


def _overlap_joined_stream(spark, stream_dir):
    from musicflow_spark.streaming import overlap_join_stream

    return overlap_join_stream(
        _overlap_shape(event_stream(spark, stream_dir, max_files_per_trigger=1), "l"),
        _overlap_shape(event_stream(spark, stream_dir, max_files_per_trigger=1), "r"),
        "l_user", "r_user", "l_lo", "l_hi", "r_lo", "r_hi",
        max_len="1 hour", watermark="1 hour",
    )


def test_overlap_join_stream_stream_converges_to_batch(spark, stream_dir, tmp_path):
    from musicflow_spark.operators.timejoin import overlap_join_bucketed

    out = _overlap_joined_stream(spark, stream_dir)
    got = {
        (r["l_id"], r["r_id"])
        for r in _run_to_memory(out, "overlap_stream", tmp_path, "append").collect()
    }
    batch = spark.read.parquet(stream_dir)
    want = {
        (r["l_id"], r["r_id"])
        for r in overlap_join_bucketed(
            _overlap_shape(batch, "l"), _overlap_shape(batch, "r"),
            "l_user", "r_user", "l_lo", "l_hi", "r_lo", "r_hi",
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_overlap_join_stream_state_is_evicted(spark, stream_dir, tmp_path):
    # the max_len time-range bound must actually evict join state:
    # after draining a month of data, buffered state must be far
    # smaller than the total rows that flowed through the join
    out = _overlap_joined_stream(spark, stream_dir)
    q = (
        out.writeStream.format("memory")
        .queryName("overlap_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_overlap_state"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)  # drained, not a mid-run snapshot
    # numRowsRemoved is per-micro-batch: sum across the run, don't
    # read only the final batch's progress
    removed = sum(
        p["stateOperators"][0]["numRowsRemoved"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    final_total = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    n_input = (
        spark.read.parquet(stream_dir)
        .filter(F.col("user_id") != SENTINEL_USER)
        .count()
    )
    assert removed > 0                   # eviction actually ran
    assert final_total < n_input / 2     # horizon << month of data


def test_asof_stream_stream_converges_to_batch(spark, stream_dir, tmp_path):
    # odd event_ids are the left stream, even the right; each left
    # event must match the latest even event of the same user within
    # a 2-hour lookback — chained stateful ops (join -> max_by agg)
    from musicflow_spark.streaming import asof_join_stream_stream

    # the sentinel flows through both sides so each stream's watermark
    # advances past all real data (it self-matches on user -1 and is
    # dropped from the comparison)
    def sides(df):
        l = df.filter(
            (F.col("event_id") % 2 == 1) | (F.col("user_id") == SENTINEL_USER)
        ).select(
            F.col("event_id").alias("l_id"),
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
        )
        r = df.filter(
            (F.col("event_id") % 2 == 0) | (F.col("user_id") == SENTINEL_USER)
        ).select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )
        return l, r

    ls, rs = sides(event_stream(spark, stream_dir, max_files_per_trigger=1))
    out = asof_join_stream_stream(
        ls, rs, "l_user", "r_user", "l_ts", "r_ts",
        horizon="2 hours", watermark="2 hours",
    )
    got = {
        r["l_id"]: r["r_id"]
        for r in _run_to_memory(out, "asof_ss", tmp_path, "append").collect()
        if r["l_user"] != SENTINEL_USER
    }
    lb, rb = sides(spark.read.parquet(stream_dir))
    lb = lb.filter(F.col("l_user") != SENTINEL_USER)
    rb = rb.filter(F.col("r_user") != SENTINEL_USER)
    cand = lb.join(
        rb,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr("INTERVAL 2 HOURS")),
    )
    want = {
        r["l_id"]: r["r_id"]
        for r in cand.groupBy("l_id")
        .agg(F.max_by("r_id", F.struct("r_ts", "r_id")).alias("r_id"))
        .collect()
    }
    # ties on (user, ts) between right rows: both engines pick by
    # max r_ts; disambiguate identically by excluding exact ties
    assert len(got) == len(want)
    mismatches = {
        k: (got[k], want[k]) for k in want if got[k] != want[k]
    }
    # allow only genuine (user, ts)-duplicate right rows to differ
    if mismatches:
        rb_rows = {
            (r["r_user"], r["r_ts"]): 0 for r in rb.collect()
        }
        dup_ts = set()
        for r in rb.collect():
            key = (r["r_user"], r["r_ts"])
            rb_rows[key] += 1
            if rb_rows[key] > 1:
                dup_ts.add(key)
        assert dup_ts, mismatches  # mismatches without duplicate ts = bug
    assert len(want) > 0


def test_asof_stream_stream_left_outer_pads_unmatched(spark, stream_dir, tmp_path):
    # right stream restricted to a third of the users: lefts of the
    # excluded users must still emit, null-padded, once the watermark
    # proves no match can arrive
    from musicflow_spark.streaming import asof_join_stream_stream

    # the far-future sentinel flows through BOTH sides (its user id
    # matches no real key) so each stream's watermark advances past
    # all real data and every outer group can close; its rows are
    # excluded from the comparison below
    def left_side(df):
        return df.filter(
            (F.col("event_id") % 2 == 1) | (F.col("user_id") == SENTINEL_USER)
        ).select(
            F.col("event_id").alias("l_id"),
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
        )

    def right_side(df):
        return df.filter(
            ((F.col("event_id") % 2 == 0) & (F.col("user_id") % 3 == 0))
            | (F.col("user_id") == SENTINEL_USER)
        ).select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )

    out = asof_join_stream_stream(
        left_side(event_stream(spark, stream_dir, max_files_per_trigger=1)),
        right_side(event_stream(spark, stream_dir, max_files_per_trigger=1)),
        "l_user", "r_user", "l_ts", "r_ts",
        horizon="2 hours", watermark="2 hours", how="left",
    )
    rows = [
        r
        for r in _run_to_memory(out, "asof_ss_left", tmp_path, "append").collect()
        if r["l_user"] != SENTINEL_USER
    ]
    got_ids = {r["l_id"] for r in rows}
    batch = spark.read.parquet(stream_dir)
    all_left = {
        r["l_id"]
        for r in left_side(batch).collect()
        if r["l_user"] != SENTINEL_USER
    }
    assert got_ids == all_left          # every left event emitted exactly...
    assert len(rows) == len(all_left)   # ...once
    padded = [r for r in rows if r["r_id"] is None]
    matched = [r for r in rows if r["r_id"] is not None]
    assert padded and matched
    # no padded row belongs to a user the right stream covers with an
    # in-horizon match candidate; spot check: all matched users % 3 == 0
    assert all(r["l_user"] % 3 == 0 for r in matched)


def test_overlap_join_stream_left_outer_pads(spark, stream_dir, tmp_path):
    from musicflow_spark.streaming import overlap_join_stream

    # right stream restricted to a third of the users; sentinel flows
    # through BOTH sides so every outer group can close
    def keep(df, side_cond):
        return df.filter(side_cond | (F.col("user_id") == SENTINEL_USER))

    l = keep(
        event_stream(spark, stream_dir, max_files_per_trigger=1),
        F.col("event_id") % 2 == 0,
    ).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("l_hi"),
    )
    r = keep(
        event_stream(spark, stream_dir, max_files_per_trigger=1),
        (F.col("event_id") % 2 == 1) & (F.col("user_id") % 3 == 0),
    ).select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("r_hi"),
    )
    out = overlap_join_stream(
        l, r, "l_user", "r_user", "l_lo", "l_hi", "r_lo", "r_hi",
        max_len="1 hour", watermark="1 hour", how="left",
    )
    rows = [
        x
        for x in _run_to_memory(out, "overlap_left", tmp_path, "append").collect()
        if x["l_user"] != SENTINEL_USER
    ]
    all_left = {
        x["event_id"]
        for x in spark.read.parquet(stream_dir)
        .filter((F.col("event_id") % 2 == 0) & (F.col("user_id") != SENTINEL_USER))
        .collect()
    }
    assert {x["l_id"] for x in rows} == all_left  # no left interval lost
    padded = [x for x in rows if x["r_id"] is None]
    matched = [x for x in rows if x["r_id"] is not None]
    assert padded and matched
    assert all(x["l_user"] % 3 == 0 for x in matched)


def test_overlap_join_stream_rejects_column_clash(spark, stream_dir):
    from musicflow_spark.streaming import overlap_join_stream

    ev = event_stream(spark, stream_dir)
    with pytest.raises(ValueError, match="disjoint"):
        overlap_join_stream(
            ev, ev, "user_id", "user_id", "ts", "ts", "ts", "ts"
        )


def test_rollup_merge_sink_converges_to_batch(spark, stream_dir, tmp_path):
    """Append-mode raw stream -> per-batch partial aggregate merged
    into the materialized rollup (no state store): final table must
    equal the from-scratch batch rollup exactly."""
    from musicflow_spark.streaming import foreach_batch_rollup_merge

    out = str(tmp_path / "user_rollup")
    shaped = event_stream(spark, stream_dir, max_files_per_trigger=1).select(
        "user_id",
        F.lit(1).cast("long").alias("n_events"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    sink = foreach_batch_rollup_merge(out, ["user_id"])
    q = (
        shaped.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # observed per-batch row accounting sums to every input row
    n_input = spark.read.parquet(stream_dir).count()
    assert sum(m["rows_in"] for m in sink.metrics) == n_input
    got = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != SENTINEL_USER
    }
    want = {
        r["user_id"]: (r["n_events"], r["value_cents"])
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("variant", ["tws", "legacy"])
def test_running_user_stats_converges(spark, stream_dir, tmp_path, variant):
    # per-user running (count, cents-sum): the Spark-4
    # transformWithStateInPandas form (needs protobuf; skipped where
    # absent) and its applyInPandasWithState twin must both converge
    # to the batch aggregate
    from musicflow_spark.streaming.stateful import (
        running_user_stats_stream,
        running_user_stats_stream_legacy,
    )

    if variant == "tws":
        pytest.importorskip("google.protobuf")
        make = running_user_stats_stream
    else:
        make = running_user_stats_stream_legacy
    stream = make(event_stream(spark, stream_dir, max_files_per_trigger=1))
    final: dict = {}

    def absorb(batch, _bid):
        for r in batch.collect():
            final[r["user_id"]] = (r["n_events"], r["sum_cents"])

    q = (
        stream.writeStream.foreachBatch(absorb)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{variant}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final.pop(SENTINEL_USER, None)
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("s"),
        )
        .collect()
    }
    assert final == want


def test_cms_stream_merge_converges_to_batch_sketch(spark, stream_dir, tmp_path):
    """Streaming CMS maintenance: per-batch (row, bucket) counter
    partials merged through the no-state-store rollup sink must equal
    the one-pass batch sketch COUNTER-FOR-COUNTER (CMS merge is exact
    integer addition, so this is equality, not a tolerance)."""
    from musicflow_spark.operators.cms import cms_build, cms_pairs
    from musicflow_spark.streaming import foreach_batch_rollup_merge

    depth, width = 4, 256
    out = str(tmp_path / "cms_grid")
    shaped = cms_pairs(
        event_stream(spark, stream_dir, max_files_per_trigger=1).select("user_id"),
        "user_id",
        depth,
        width,
    ).withColumn("cnt", F.lit(1).cast("long"))
    q = (
        shaped.writeStream.foreachBatch(
            foreach_batch_rollup_merge(out, ["row", "bucket"])
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["row"], r["bucket"]): r["cnt"] for r in spark.read.parquet(out).collect()
    }
    # batch twin over the SAME stream files (sentinel included: the
    # sketch counts every record it saw, sentinel or not)
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(
            spark.read.parquet(stream_dir).select("user_id"), "user_id", depth, width
        ).collect()
    }
    assert got == want


def test_hist_stream_merge_converges_to_batch_sketch(spark, stream_dir, tmp_path):
    """Streaming quantile-histogram maintenance: per-batch (bin, cnt)
    partials merged through the no-state-store rollup sink must equal
    the one-pass batch fixed-domain build COUNTER-FOR-COUNTER
    (histogram merge is exact integer addition — equality, not a
    tolerance).  The domain is pinned up front, the fixed-domain
    streaming contract (a stream cannot run the bounds pre-pass)."""
    from musicflow_spark.operators.qsketch import (
        hist_build_fixed,
        hist_pairs_fixed,
    )
    from musicflow_spark.streaming import foreach_batch_rollup_merge

    lo, hi, n_bins = 0, 60_000, 64
    out = str(tmp_path / "hist_grid")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    shaped = hist_pairs_fixed(
        event_stream(spark, stream_dir, max_files_per_trigger=1)
        .select(cents.alias("cents")),
        "cents",
        lo,
        hi,
        n_bins,
    )
    q = (
        shaped.writeStream.foreachBatch(
            foreach_batch_rollup_merge(out, ["bin"])
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["bin"]: r["cnt"] for r in spark.read.parquet(out).collect()}
    want = {
        r["bin"]: r["cnt"]
        for r in hist_build_fixed(
            spark.read.parquet(stream_dir).select(cents.alias("cents")),
            "cents",
            lo,
            hi,
            n_bins,
        ).collect()
    }
    assert got == want


def test_sketch_merge_sink_maintains_hll_kll_theta(spark, stream_dir, tmp_path):
    """Streaming Datasketches maintenance through the union-merge
    sink (no state store): per-day HLL / KLL / theta partials built
    incrementally over 4 micro-batches must, when re-merged across
    days, answer (a) distinct users within HLL accuracy of exact,
    (b) quantiles within KLL's rank-error bound (bytes are
    order-dependent under randomized compaction — the RANK guarantee
    is the contract), (c) theta union estimate within accuracy of
    exact — the restart-from-table streaming tier of the sketch
    family."""
    from musicflow_spark.streaming.events import foreach_batch_sketch_merge

    out = str(tmp_path / "sketch_partials")
    cents = (F.col("value") * 1000).cast("long")
    shaped = event_stream(spark, stream_dir, max_files_per_trigger=1).select(
        F.to_date("ts").alias("day"), "user_id", cents.alias("cents")
    )
    sink = foreach_batch_sketch_merge(
        out,
        ["day"],
        build_aggs={
            "hll": F.hll_sketch_agg("user_id", F.lit(12)),
            "kll": F.kll_sketch_agg_bigint("cents"),
            "theta": F.theta_sketch_agg("user_id"),
        },
        merge_aggs={
            "hll": F.hll_union_agg("hll"),
            "kll": F.kll_merge_agg_bigint("kll"),
            "theta": F.theta_union_agg("theta"),
        },
    )
    q = (
        shaped.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sketch"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    partials = spark.read.parquet(out)
    raw = spark.read.parquet(stream_dir)
    assert partials.count() == raw.select(F.to_date("ts")).distinct().count()
    merged = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("users_est"),
        F.kll_sketch_get_quantile_bigint(
            F.kll_merge_agg_bigint("kll"), F.lit(0.5)
        ).alias("p50_est"),
        F.theta_sketch_estimate(F.theta_union_agg("theta")).alias("theta_est"),
    ).collect()[0]
    exact = raw.agg(
        F.countDistinct("user_id").alias("users"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert abs(merged["users_est"] - exact["users"]) <= exact["users"] * 0.05 + 2
    assert abs(merged["theta_est"] - exact["users"]) <= exact["users"] * 0.05 + 2
    # KLL rank gate at p50, eps = 2% (k=200 default ~1.65%)
    n_le = raw.filter(cents <= merged["p50_est"]).count()
    n_lt = raw.filter(cents < merged["p50_est"]).count()
    assert n_le >= exact["n"] * 0.48 and n_lt <= exact["n"] * 0.52


def test_bloom_merge_sink_bit_exact_convergence(spark, stream_dir, tmp_path):
    """Streaming per-day bloom maintenance through the generic
    sketch-merge sink (bit_or build/merge aggs over word rows): the
    materialized word table must be BIT-EXACT equal to the batch-built
    words (bit_or is associative+commutative+idempotent, so chunking
    cannot change a single bit), and the folded per-day bitmaps must
    admit every user that actually appeared that day (no false
    negatives)."""
    from musicflow_spark.operators.bloomfilter import (
        bloom_from_words,
        bloom_probe_grouped,
        bloom_word_rows,
    )
    from musicflow_spark.streaming.events import foreach_batch_sketch_merge

    m_bits, n_hashes = 1 << 14, 5
    out = str(tmp_path / "bloom_words")
    shaped_stream = event_stream(
        spark, stream_dir, max_files_per_trigger=1
    ).select(F.to_date("ts").alias("day"), "user_id")
    word_stream = bloom_word_rows(
        shaped_stream, "user_id", ["day"], m_bits=m_bits, n_hashes=n_hashes
    )
    sink = foreach_batch_sketch_merge(
        out,
        ["day", "word_idx"],
        build_aggs={"word": F.bit_or("mask")},
        merge_aggs={"word": F.bit_or("word")},
    )
    q = (
        word_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = spark.read.parquet(out)
    raw = spark.read.parquet(stream_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    batch_words = (
        bloom_word_rows(raw, "user_id", ["day"], m_bits=m_bits, n_hashes=n_hashes)
        .groupBy("day", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    # bit-exact: same (day, word_idx, word) set
    assert streamed.count() == batch_words.count()
    assert (
        streamed.join(batch_words, ["day", "word_idx", "word"], "left_anti").count()
        == 0
    )

    # no false negatives: every (day, user) present in the raw events
    # survives a probe against its day's folded bitmap
    blooms = bloom_from_words(streamed, ["day"], m_bits=m_bits)
    day_users = raw.distinct()
    passed = bloom_probe_grouped(
        day_users, "user_id", blooms, ["day"], m_bits=m_bits, n_hashes=n_hashes
    )
    assert passed.count() == day_users.count()


def test_merge_into_sink_converges_to_batch_merge(spark, tmp_path):
    """Streaming MERGE (foreach_batch_merge_into): a bootstrap batch
    plus two CDC batches applied through the sink must equal the
    one-shot batch merge_into of the same updates — all four branches
    (update / delete / insert / carry) exercised across batches."""
    from musicflow_spark.operators.mergeinto import merge_into
    from musicflow_spark.streaming.events import foreach_batch_merge_into

    src_dir = str(tmp_path / "cdc_src")
    out = str(tmp_path / "merged")
    bootstrap = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (4, 400)], "k int, d int"
    )
    b1 = spark.createDataFrame([(2, 5), (9, 50)], "k int, d int")       # update, insert
    b2 = spark.createDataFrame([(3, 9999), (9, 1)], "k int, d int")     # delete, update
    for i, b in enumerate((bootstrap, b1, b2)):
        b.coalesce(1).write.mode("append").parquet(src_dir)  # same dir, 3 files
    # stream files one per micro-batch IN ORDER of modification time is
    # not guaranteed; instead invoke the sink directly per batch (the
    # contract under test is the merge algebra, not file ordering)
    sink = foreach_batch_merge_into(
        out,
        on=["k"],
        update_set={"v": F.col("v") + F.col("d")},
        delete_when=F.col("d") > 1000,
        insert_set={"v": F.col("d")},
    )
    for i, b in enumerate((bootstrap, b1, b2)):
        sink(b, i)

    got = {r.k: r.v for r in spark.read.parquet(out).collect()}
    # one-shot reference: bootstrap inserts, then b1+b2 merged in turn
    base = bootstrap.select("k", F.col("d").alias("v"))
    for b in (b1, b2):
        base = merge_into(
            base, b, on=["k"],
            update_set={"v": F.col("v") + F.col("d")},
            delete_when=F.col("d") > 1000,
            insert_set={"v": F.col("d")},
        )
    want = {r.k: r.v for r in base.collect()}
    assert got == want
    assert got == {1: 100, 2: 205, 4: 400, 9: 51}  # 3 deleted


def test_merge_into_sink_wires_into_writestream(spark, tmp_path):
    """The sink runs under a real availableNow writeStream (wiring
    smoke: schema inference, checkpointing, atomic swap)."""
    from musicflow_spark.streaming.events import foreach_batch_merge_into

    src = str(tmp_path / "src")
    out = str(tmp_path / "tbl")
    spark.createDataFrame([(1, 10), (2, 20)], "k int, d int").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("k int, d int").parquet(src)
    sink = foreach_batch_merge_into(
        out, on=["k"],
        update_set={"v": F.col("v") + F.col("d")},
        insert_set={"v": F.col("d")},
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r.k, r.v) for r in spark.read.parquet(out).collect()} == {
        (1, 10), (2, 20),
    }


def test_sliding_twin_double_counts_exactly(spark):
    """2h/1h sliding windows: every event lands in exactly two
    finalized windows, so sum(n_events) == 2 x corpus events."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.streamtwins import stream_sliding_event_stats
    from musicflow_spark.sources.catalog import read_table

    sf = "/root/testdata/sf0.001"
    got = stream_sliding_event_stats(spark, sf)
    total = got.agg(F.sum("n_events")).collect()[0][0]
    n = read_table(spark, sf, "events").count()
    assert total == 2 * n


def test_stream_stream_join_matches_batch(spark):
    """The native interval join twin emits exactly the batch join's
    pair set, with every gap inside the horizon."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.streamtwins import stream_click_purchase_join
    from musicflow_spark.sources.catalog import read_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["click_id"], r["purchase_id"], r["gap_us"])
        for r in stream_click_purchase_join(spark, sf).collect()
    }
    ev = read_table(spark, sf, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    want = {
        (r["click_id"], r["purchase_id"], r["gap_us"])
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            F.expr("timestampdiff(MICROSECOND, c_ts, p_ts)").alias("gap_us"),
        )
        .collect()
    }
    assert got == want and got
    assert all(0 <= g <= 3_600_000_000 for _, _, g in got)


def test_stream_stream_fulljoin_pads_both_sides(spark):
    """The full-outer interval join twin must emit (a) the inner pair
    set, (b) every unmatched click null-padded, and (c) every
    unmatched purchase null-padded — (c) is the emission path only
    the full-outer mode exercises (symmetric watermark expiry)."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.streamtwins import (
        stream_click_purchase_fulljoin,
    )
    from musicflow_spark.sources.catalog import read_table

    sf = "/root/testdata/sf0.001"
    rows = stream_click_purchase_fulljoin(spark, sf).collect()
    inner = {
        (r["click_id"], r["purchase_id"]) for r in rows
        if r["click_id"] is not None and r["purchase_id"] is not None
    }
    pad_click = {r["click_id"] for r in rows if r["purchase_id"] is None}
    pad_purch = {r["purchase_id"] for r in rows if r["click_id"] is None}
    assert inner and pad_click and pad_purch

    ev = read_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    matched_c = {c for c, _ in inner}
    matched_p = {p for _, p in inner}
    all_c = {r["event_id"] for r in clicks.collect()}
    all_p = {r["event_id"] for r in purchases.collect()}
    # exactly the unmatched ids are padded, each exactly once
    assert pad_click == all_c - matched_c
    assert pad_purch == all_p - matched_p
    n_pad_rows = sum(1 for r in rows if r["purchase_id"] is None) + sum(
        1 for r in rows if r["click_id"] is None
    )
    assert n_pad_rows == len(pad_click) + len(pad_purch)
    # padded rows carry no gap
    assert all(
        r["gap_us"] is None
        for r in rows
        if r["click_id"] is None or r["purchase_id"] is None
    )


def test_stream_scd2_equals_sequential_batch_fold(spark):
    """The streaming SCD-2 twin's final history must equal
    scd2_apply_batches folding the same two update frames in the
    same order (streaming micro-batch boundaries == batch refresh
    boundaries)."""
    from pyspark.sql import functions as F

    from musicflow_spark.operators.dedup import portable_hash60
    from musicflow_spark.operators.scd import scd2_apply_batches, scd2_init
    from musicflow_spark.queries.streamtwins import stream_scd2_history
    from musicflow_spark.sources.catalog import read_table

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in stream_scd2_history(spark, sf)
        .select("c_custkey", "bal_cents", "c_mktsegment", "valid_from", "valid_to")
        .collect()
    }
    dim = read_table(spark, sf, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        "c_mktsegment",
    )
    b = portable_hash60(F.col("c_custkey").cast("string")) % 10
    dimb = dim.withColumn("__b__", b)
    u1 = dimb.filter(F.col("__b__") < 5).select(
        "c_custkey",
        F.when(F.col("__b__") < 3, F.col("bal_cents") + 500)
        .otherwise(F.col("bal_cents"))
        .alias("bal_cents"),
        "c_mktsegment",
    )
    u2 = (
        dimb.filter(F.col("__b__") < 2)
        .select(
            "c_custkey",
            (F.col("bal_cents") + 1200).alias("bal_cents"),
            "c_mktsegment",
        )
        .unionByName(
            dimb.filter(F.col("__b__").isin(5, 6)).select(
                "c_custkey", "bal_cents", F.lit("STREAMED").alias("c_mktsegment")
            )
        )
        .unionByName(
            dimb.filter(F.col("__b__") == 3).select(
                "c_custkey", "bal_cents", "c_mktsegment"
            )
        )
    )
    want = {
        tuple(r)
        for r in scd2_apply_batches(
            scd2_init(dim, 0),
            [(1, u1), (2, u2)],
            "c_custkey",
            ["bal_cents", "c_mktsegment"],
        ).collect()
    }
    assert got == want
    # repeated-change keys carry three versions
    three = [k for k, *_ in got]
    from collections import Counter

    c = Counter(three)
    assert max(c.values()) == 3


@pytest.mark.slow
def test_crossmodal_stream_converges_to_batch_mart(spark, sf_dir):
    """The streaming cross-modal gate (foreachBatch per micro-batch)
    must converge EXACTLY to the one-shot batch mart — the gate is
    per-row map-parallel, so chunking cannot change any verdict."""
    from musicflow_spark.queries.multimodal import corpus_crossmodal_mart
    from musicflow_spark.queries.streamtwins import stream_crossmodal_mart

    batch = {
        tuple(r) for r in corpus_crossmodal_mart(spark, sf_dir).collect()
    }
    streamed = {
        tuple(r)
        for r in stream_crossmodal_mart(spark, sf_dir)
        .select("doc_id", "n_tokens", "contrast", "clip_score", "reason", "keep")
        .collect()
    }
    assert streamed == batch


def test_unicode_dedup_stream_converges_to_batch(spark, sf_dir):
    """The streaming canonical-dedup twin (Arrow NFC normalize + md5
    keys per micro-batch, group rollup over the accumulated keys)
    must converge EXACTLY to the one-shot batch query — the key map
    is per-row, so chunk boundaries cannot change any group."""
    from musicflow_spark.queries.cleanse import doc_unicode_dedup
    from musicflow_spark.queries.streamtwins import stream_unicode_dedup

    batch = {tuple(r) for r in doc_unicode_dedup(spark, sf_dir).collect()}
    streamed = {tuple(r) for r in stream_unicode_dedup(spark, sf_dir).collect()}
    assert streamed == batch
