"""The fuzzy match engine, set-oriented.

The reference walks videos one at a time through a Python strategy
cascade with per-row API calls (dags/scripts/spotify_elt.py:1135-1143
df.apply of prepare_videos).  Here the cascade is DATA: each video
emits its applicable (priority, search_type_id, q) strategy rows; a
pluggable CandidateSource resolves queries to candidate items
set-at-a-time; scoring and accept predicates are native columns; the
'first hit wins' rule is a window rank; skip-statuses are windows +
anti-join sets; the guarded dict-upsert is a prefer-non-null window.
"""

from musicflow_spark.matching.cache import (  # noqa: F401
    load_cache,
    match_with_cache,
    save_cache,
)
from musicflow_spark.matching.candidates import CatalogCandidateSource  # noqa: F401
from musicflow_spark.matching.engine import MatchEngine, MatchResult  # noqa: F401
