"""Match-result cache (SURVEY §2.1 S9): the reference memoizes each
video's match in Redis as JSON so a restarted run skips already-
searched videos (spotify_elt.py:772-774,797,823,850; flushed at
:1210; reproduce.md "Just restart the flow").

Spark shape: a parquet cache table ``(video_id, payload)`` where
payload is the JSON-encoded match struct (F21: to_json/from_json with
an explicit schema — the exact idiom the reference uses for Redis
values).  A run left-joins its videos against the cache: hits
reconstruct match rows directly from the payload (NO search
round-trips — preserving the reference's API-cost property), misses
run the engine; the union feeds the normal assembly, and the new
cache is the old one plus the misses' results.  Keyed by video_id:
the same video in two playlists is one cache entry, exactly one
search — playlist-dependent fields (log_id, status, membership) are
recomputed at assembly, never cached.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from musicflow_spark.matching.engine import MatchEngine, MatchResult

#: the per-video payload serialized into cache JSON — everything in a
#: match row except the per-library-row keys (log_id,
#: user_playlist_id), which are run-dependent
PAYLOAD_FIELDS = [
    "search_type_id", "q", "spotify_uri", "album_uri", "item_title",
    "item_artists_s", "item_duration_ms", "difference_ms", "track_match",
    "total_tracks", "children", "found_on_try", "kind",
]

PAYLOAD_SCHEMA = (
    "search_type_id bigint, q string, spotify_uri string, album_uri string, "
    "item_title string, item_artists_s string, item_duration_ms bigint, "
    "difference_ms bigint, track_match bigint, total_tracks bigint, "
    "children array<struct<track_uri:string,track_title:string,duration_ms:bigint,"
    "track_artists:string,album_uri:string>>, "
    "found_on_try bigint, kind string"
)

#: one store, two key namespaces — video_id for the video pass and
#: youtube_playlist_id for the other-playlists pass, exactly like the
#: reference's shared Redis db (spotify_elt.py:772,863)
CACHE_SCHEMA = "video_id string, payload string"


def empty_cache(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], CACHE_SCHEMA)


def load_cache(spark: SparkSession, path: str) -> DataFrame:
    """Parquet-backed cache; missing path = cold cache (first run)."""
    if not os.path.exists(path):
        return empty_cache(spark)
    return spark.read.parquet(path)


def save_cache(cache: DataFrame, path: str) -> None:
    """The reference flushes Redis at run end (spotify_elt.py:1210);
    here the flush is one parquet overwrite of the merged cache."""
    tmp = f"{path}.__tmp__"
    cache.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def cache_entries(matches: DataFrame, videos: DataFrame) -> DataFrame:
    """Match rows -> cache rows: one entry per searched VIDEO.

    Matched videos store the JSON payload (lowest log_id wins when
    the video sits in several playlists — payloads are identical by
    construction).  Videos the search did NOT match are cached with a
    null payload: the reference re-searches misses on every restart
    (Redis only memoizes hits, spotify_elt.py:772-797); caching the
    negative verdict is a deliberate improvement that makes warm
    reruns zero-API-call — flagged here because it diverges."""
    keyed = videos.select("log_id", "video_id").join(
        matches, "log_id", "left"
    )
    return (
        keyed.withColumn(
            "__rn__",
            F.row_number().over(
                Window.partitionBy("video_id").orderBy(
                    F.col("kind").isNull().cast("int"), "log_id"
                )
            ),
        )
        .filter(F.col("__rn__") == 1)
        .select(
            "video_id",
            F.when(
                F.col("kind").isNotNull(),
                F.to_json(F.struct(*[F.col(c) for c in PAYLOAD_FIELDS])),
            ).alias("payload"),
        )
    )


def match_with_cache(
    engine: MatchEngine,
    videos: DataFrame,
    playlist_map: DataFrame,
    cache: DataFrame | None = None,
    liked_tracks: DataFrame | None = None,
    liked_albums: DataFrame | None = None,
    grouped_others: DataFrame | None = None,
) -> tuple[MatchResult, DataFrame]:
    """Cache-aware matching: returns (result, merged_cache).

    Cache hits never reach the CandidateSource; only miss videos run
    the search cascade.  Assembly sees hits and misses together, so
    statuses / guarded upserts / side-effect sets behave exactly as a
    cold run over the same videos.

    ``grouped_others`` (extract_other_playlists grouping) runs the
    second pass the same way, cached under the youtube_playlist_id
    key — the reference memoizes that pass per playlist id in the
    same Redis db (spotify_elt.py:863-884)."""
    spark = videos.sparkSession
    cache = cache if cache is not None else empty_cache(spark)

    hits = videos.join(cache, "video_id", "inner")
    misses = videos.join(cache.select("video_id"), "video_id", "left_anti")

    hit_matches = (
        hits.filter(F.col("payload").isNotNull())  # negative entries: known not-found
        .join(F.broadcast(playlist_map), "youtube_playlist_id", "left")
        .withColumn("user_playlist_id", F.coalesce("user_playlist_id", F.lit("LM")))
        .withColumn("__m__", F.from_json("payload", PAYLOAD_SCHEMA))
        .select(
            "log_id",
            "user_playlist_id",
            *[F.col(f"__m__.{c}").alias(c) for c in PAYLOAD_FIELDS],
            F.lit(None).cast("array<bigint>").alias("log_ids"),
            F.lit(0).alias("pass_no"),
        )
    )
    if misses.isEmpty():
        # fully-warm cache: zero search calls, zero engine stages
        miss_matches = spark.createDataFrame([], MatchEngine._match_schema())
    else:
        miss_matches = engine.compute_matches(misses, playlist_map)
    all_matches = hit_matches.unionByName(miss_matches.select(*hit_matches.columns))

    new_entries = cache_entries(miss_matches, misses)

    if grouped_others is not None:
        g_keyed = grouped_others.withColumn("log_id", F.element_at("log_ids", 1))
        g_hits = g_keyed.join(
            cache.withColumnRenamed("video_id", "youtube_playlist_id"),
            "youtube_playlist_id",
            "inner",
        )
        g_misses = g_keyed.drop("log_id").join(
            cache.select(F.col("video_id").alias("youtube_playlist_id")),
            "youtube_playlist_id",
            "left_anti",
        )
        g_hit_matches = (
            g_hits.filter(F.col("payload").isNotNull())
            .withColumn("__m__", F.from_json("payload", PAYLOAD_SCHEMA))
            .select(
                "log_id",
                F.lit("LM").alias("user_playlist_id"),
                *[F.col(f"__m__.{c}").alias(c) for c in PAYLOAD_FIELDS],
                F.col("log_ids"),
                F.lit(1).alias("pass_no"),
            )
        )
        g_miss_matches = engine.compute_matches_others(g_misses)
        all_matches = all_matches.unionByName(g_hit_matches).unionByName(
            g_miss_matches.select(*hit_matches.columns)
        )
        # group entries reuse the video cache shape with the playlist
        # id in the key column
        g_new = cache_entries(
            g_miss_matches,
            g_misses.select(
                F.element_at("log_ids", 1).alias("log_id"),
                F.col("youtube_playlist_id").alias("video_id"),
            ),
        )
        new_entries = new_entries.unionByName(g_new)

    result = engine.assemble(all_matches, liked_tracks, liked_albums)
    # misses are disjoint from the cache by construction; keep the
    # merge an explicit prefer-new anti-join rather than an arbitrary
    # dropDuplicates so re-merging the same run is idempotent
    merged = cache.join(new_entries.select("video_id"), "video_id", "left_anti").unionByName(
        new_entries
    )
    return result, merged
