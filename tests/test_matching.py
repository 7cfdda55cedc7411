"""Match-engine tests: the set-oriented cascade must reproduce the
reference's row-at-a-time semantics (strategy order, first-hit-wins,
accept predicates, skip statuses, guarded upsert) on a deterministic
local catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from musicflow_spark.config import PipelineConfig
from musicflow_spark.matching import CatalogCandidateSource, MatchEngine

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def source(musicflow_sources):
    return CatalogCandidateSource(
        catalog_tracks=musicflow_sources["spotify_tracks"],
        catalog_albums=musicflow_sources["spotify_albums"],
        catalog_playlists=musicflow_sources["spotify_playlists_others"],
    )


@pytest.fixture(scope="module")
def engine_inputs(spark, musicflow_sources):
    # current-user videos (reference extract_videos shape): one row
    # per library entry with video payload
    lib = musicflow_sources["youtube_library"]
    vids = musicflow_sources["youtube_videos"]
    yp = musicflow_sources["youtube_playlists"]
    current = (
        lib.join(yp, "youtube_playlist_id")
        .filter((F.col("author") == CFG.your_channel_name) | F.col("author").isNull())
        .select("id", "youtube_playlist_id", "video_id")
        .join(vids, "video_id")
        .select(
            F.col("id").alias("log_id"),
            "youtube_playlist_id",
            "video_id",
            F.col("title"),
            F.col("author"),
            F.col("description"),
            F.col("duration_ms"),
        )
    )
    # a second PL_jazz video that resolves to the same track as v05 ->
    # exercises 'skipped (saved during the run)'
    extra = spark.createDataFrame(
        [
            (
                20,
                "PL_jazz",
                "v05b",
                "Take Five: The Classic",
                "SomeoneElse",
                "",
                326_000,
            )
        ],
        current.schema,
    )
    videos = current.unionByName(extra)
    playlist_map = musicflow_sources["playlist_ids"].select(
        "youtube_playlist_id",
        F.col("spotify_playlist_id").alias("user_playlist_id"),
    )
    return videos, playlist_map


@pytest.fixture(scope="module")
def result(spark, source, engine_inputs):
    videos, playlist_map = engine_inputs
    engine = MatchEngine(CFG, source)
    liked = spark.createDataFrame([("spotify:track:t03",)], "uri string")
    return engine.match(videos, playlist_map, liked_tracks=liked)


@pytest.fixture(scope="module")
def log_rows(result):
    return {r["log_id"]: r for r in result.log.collect()}


def test_track_matches_and_strategy_zero(log_rows):
    # v01 (log 0, LM): exact title+artist -> strategy 0, first try
    r = log_rows[0]
    assert r["track_uri"] == "spotify:track:t01"
    assert r["search_type_id"] == 0
    assert r["found_on_try"] == 1
    assert r["status"] == "saved"
    assert r["difference_ms"] == 1000
    assert r["track_match"] == 1 and r["total_tracks"] == 1


def test_ost_accept_without_artist(log_rows):
    # v03: 'Moonlight OST | Piano Version' — artist differs entirely;
    # accept via track-in-title + is_ost (spotify_elt.py:288-289)
    r = log_rows[1]
    assert r["track_uri"] == "spotify:track:t03"
    # liked + LM -> saved before the run
    assert r["status"] == "skipped (saved before the run)"


def test_album_branch_over_threshold(log_rows):
    # v06 (log 8, 2.58M ms >= threshold): album branch, duration exact
    r = log_rows[8]
    assert r["album_uri"] == "spotify:album:a10"
    assert r["track_uri"] is None
    assert r["track_match"] == 4 and r["total_tracks"] == 4
    assert r["difference_ms"] == 0


def test_not_found_videos_missing_from_log(log_rows):
    # v09 '(1984)' never matches; library ids 11,12 absent
    assert 11 not in log_rows and 12 not in log_rows


def test_same_playlist_duplicate_skipped_during(log_rows):
    # v05 (log 5) and v05b (log 20) both resolve t05 into sp_jazz:
    # lower log_id saved, higher skipped-during (log_id determinism,
    # SURVEY §7 watch-list #6)
    assert log_rows[5]["track_uri"] == "spotify:track:t05"
    assert log_rows[20]["track_uri"] == "spotify:track:t05"
    assert log_rows[5]["status"] == "saved"
    assert log_rows[20]["status"] == "skipped (saved during the run)"


def test_cross_playlist_duplicate_both_saved(log_rows):
    # v08 saved in PL_jazz (log 6) and LM (log 7): different
    # (uri, playlist) pairs -> both 'saved' (collect_track keys on the
    # pair, spotify_elt.py:317-321)
    assert log_rows[6]["status"] == "saved"
    assert log_rows[7]["status"] == "saved"


def test_exactly_one_uri_non_null(result):
    bad = result.log.filter(
        (
            F.col("album_uri").isNotNull().cast("int")
            + F.col("playlist_uri").isNotNull().cast("int")
            + F.col("track_uri").isNotNull().cast("int")
        )
        != 1
    )
    assert bad.count() == 0


def test_guarded_upsert_tracks(result):
    tracks = {r["track_uri"]: r for r in result.tracks.collect()}
    # track_uri unique after upsert
    assert result.tracks.count() == len(tracks)
    # album children materialize with their album_uri
    assert tracks["spotify:track:t11"]["album_uri"] == "spotify:album:a10"


def test_albums_table(result):
    albums = result.albums.collect()
    assert len(albums) == 1
    a = albums[0]
    assert a["album_uri"] == "spotify:album:a10"
    assert a["duration_ms"] == 2_580_000 and a["total_tracks"] == 4


def test_side_effect_sets(result):
    likes = {r["track_uri"] for r in result.tracks_to_like.collect()}
    # LM saved tracks liked; t03 was skipped-before so NOT liked
    assert "spotify:track:t01" in likes
    assert "spotify:track:t03" not in likes
    adds = {
        (r["user_playlist_id"], r["track_uri"])
        for r in result.playlist_additions.collect()
    }
    assert ("sp_jazz", "spotify:track:t05") in adds
    # album children added to no playlist (v06 lives in LM)
    assert all(p != "LM" for p, _ in adds)


def test_lazy_rounds_equal_eager(spark, source, engine_inputs):
    videos, playlist_map = engine_inputs
    liked = spark.createDataFrame([("spotify:track:t03",)], "uri string")
    eager = MatchEngine(CFG, source, lazy=False).match(
        videos, playlist_map, liked_tracks=liked
    )
    lazy = MatchEngine(CFG, source, lazy=True).match(
        videos, playlist_map, liked_tracks=liked
    )
    cols = ["log_id", "track_uri", "album_uri", "playlist_uri", "found_on_try", "search_type_id", "status"]
    e = sorted(tuple(r) for r in eager.log.select(*cols).collect())
    l = sorted(tuple(r) for r in lazy.log.select(*cols).collect())
    assert e == l
