"""Time/duration expressions.

BigQuery's TIME type has no Spark equivalent (SURVEY §1.2); the
reference renders track durations as clock time via
``time(timestamp_seconds(div(duration_ms, 1000)))`` (reference:
dbt/models/intermediate/int_join_spotify_uris.sql:130-131,
dbt/models/marts/log_for_tableau.sql:28,61). We standardize on an
``HH:mm:ss`` string, computed with pure integer arithmetic so the
result is engine-portable (identical in Spark and the DuckDB oracle)
and safe for durations >= 24h (a timestamp-based format would wrap).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ms_to_clock(ms: Column | str) -> Column:
    """milliseconds -> 'HH:mm:ss' string (floor seconds).

    format_string, not lpad: SQL lpad TRUNCATES strings longer than
    the pad width, silently corrupting durations >= 100 hours
    ('100:00:00' -> '10:00:00') — caught by the hypothesis property
    test; %02d pads without ever truncating."""
    c = F.col(ms) if isinstance(ms, str) else ms
    total_s = F.floor(c / F.lit(1000)).cast("long")
    h = F.floor(total_s / 3600).cast("long")
    m = F.floor((total_s % 3600) / 60).cast("long")
    s = (total_s % 60).cast("long")
    # format_string renders null args as the literal string 'null'
    # ('null:null:null'); BigQuery's time() and DuckDB's printf
    # propagate NULL — guard explicitly for parity.
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.format_string("%02d:%02d:%02d", h, m, s)
    )


def iso8601_duration_to_ms(duration: Column | str) -> Column:
    """Parse ISO-8601 durations like ``PT1H2M3S`` to milliseconds.

    The reference parses these with the aniso8601 library per row
    (reference: dags/scripts/youtube_elt.py:223-226,273-276); here it
    is three regexp_extracts + arithmetic, fully native.  Handles the
    H/M/S components the YouTube API emits (days never appear).
    """
    c = F.col(duration) if isinstance(duration, str) else duration

    def _part(unit: str) -> Column:
        v = F.regexp_extract(c, rf"(\d+){unit}", 1)
        return F.when(v == "", F.lit(0)).otherwise(v.cast("long"))

    hours = _part("H")
    minutes = _part("M")
    seconds = _part("S")
    return ((hours * 3600 + minutes * 60 + seconds) * 1000).cast("long")
