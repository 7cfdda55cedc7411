"""Explicit StructType schemas for every warehouse table.

The reference declares explicit BigQuery schemas for tables whose
all-null columns would mis-infer (reference:
dags/scripts/spotify_elt.py:1170-1200, youtube_elt.py:379-417) and
lets pandas inference handle the rest; dbt then re-verifies types
column-by-column. Here every table is explicit — inference never runs.

Type mapping per SURVEY §1.2: STRING->StringType, INT64->LongType,
FLOAT64->DoubleType; BigQuery TIME has no Spark equivalent and is
rendered as an ``HH:mm:ss`` string (see functions/timeutils.py).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.StringType(), nullable)


def _l(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.LongType(), nullable)


def _d(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.DoubleType(), nullable)


# ---------------------------------------------------------------- sources
# (reference: youtube_elt.py:379-387)
YOUTUBE_PLAYLISTS = T.StructType(
    [
        _s("youtube_playlist_id", False),
        _s("type", False),
        _s("title", False),
        _s("author", True),  # null only for the 'LM' pseudo-playlist
        _l("year", True),
    ]
)

# (reference: youtube_elt.py:399-405)
YOUTUBE_VIDEOS = T.StructType(
    [
        _s("video_id", False),
        _s("type", False),
        _s("title", False),
        _s("author", False),
        _s("description", False),
        _l("duration_ms", False),
    ]
)

# (reference: youtube_elt.py:411-417)
YOUTUBE_LIBRARY = T.StructType(
    [
        _l("id", False),
        _s("youtube_playlist_id", False),
        _s("video_id", False),
    ]
)

# static 7-row dimension (reference: spotify_elt.py:1064-1079)
SEARCH_TYPES = T.StructType([_l("search_type_id", False), _s("search_type_name", False)])

SEARCH_TYPE_ROWS = [
    (0, "colons (title and artist)"),
    (1, "colons (year)"),
    (2, "title (fixed)"),
    (3, "title (raw)"),
    (4, "keyword and title in quotes (fixed)"),
    (5, "keyword and title in quotes (raw)"),
    (6, "artist and title (fixed)"),
]

# (reference: spotify_elt.py:1170-1177 and dbt staging column tests)
SPOTIFY_ALBUMS = T.StructType(
    [
        _s("album_uri", False),
        _s("album_title", False),
        _s("album_artists", False),
        _l("duration_ms", False),
        _l("total_tracks", False),
    ]
)

SPOTIFY_PLAYLISTS_OTHERS = T.StructType(
    [
        _s("playlist_uri", False),
        _s("playlist_title", False),
        _s("playlist_owner", False),
        _l("duration_ms", False),
        _l("total_tracks", False),
    ]
)

SPOTIFY_TRACKS = T.StructType(
    [
        _s("track_uri", True),
        _s("album_uri", True),  # null allowed for spotify:local: tracks
        _s("playlist_uri", True),
        _s("track_title", False),
        _s("track_artists", False),
        _l("duration_ms", False),
    ]
)

SPOTIFY_PLAYLISTS = T.StructType([_s("spotify_playlist_id", False), _s("title", False)])

PLAYLIST_IDS = T.StructType(
    [
        _l("id", False),
        _s("youtube_playlist_id", False),
        _s("spotify_playlist_id", False),
    ]
)

# fact/log table (reference: spotify_elt.py:1026-1061,1188-1200)
SPOTIFY_LOG = T.StructType(
    [
        _l("log_id", False),
        _s("album_uri", True),
        _s("playlist_uri", True),
        _s("track_uri", True),
        _l("found_on_try", False),
        _l("difference_ms", False),
        _l("track_match", False),
        _l("total_tracks", False),
        _s("q", False),
        _l("search_type_id", False),
        _s("status", False),
    ]
)

#: dbt accepted_values for spotify_log.status
#: (reference: dbt/models/staging/_staging__models.yml:183-184)
LOG_STATUSES = (
    "saved",
    "skipped (saved before the run)",
    "skipped (saved during the run)",
)

#: dbt accepted_values for youtube_playlists.type (_staging__models.yml:356-357)
PLAYLIST_TYPES = ("Playlist", "Album", "EP")

#: dbt accepted_values for youtube_videos.type (_staging__models.yml:393-394)
VIDEO_TYPES = (
    "MUSIC_VIDEO_TYPE_ATV",
    "MUSIC_VIDEO_TYPE_OMV",
    "MUSIC_VIDEO_TYPE_UGC",
    "MUSIC_VIDEO_TYPE_OFFICIAL_SOURCE_MUSIC",
)

MUSICFLOW_SCHEMAS: dict[str, T.StructType] = {
    "youtube_playlists": YOUTUBE_PLAYLISTS,
    "youtube_videos": YOUTUBE_VIDEOS,
    "youtube_library": YOUTUBE_LIBRARY,
    "search_types": SEARCH_TYPES,
    "spotify_albums": SPOTIFY_ALBUMS,
    "spotify_playlists_others": SPOTIFY_PLAYLISTS_OTHERS,
    "spotify_tracks": SPOTIFY_TRACKS,
    "spotify_playlists": SPOTIFY_PLAYLISTS,
    "playlist_ids": PLAYLIST_IDS,
    "spotify_log": SPOTIFY_LOG,
}
