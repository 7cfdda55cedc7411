"""The dbt DAG as plain call order (SURVEY §3.3): sources -> staging
-> intermediates -> marts -> analyses.  Returns every model keyed by
its reference name; callers persist ('table') or register views
('view') as they choose — materialization is a deployment decision,
not a model property."""

from __future__ import annotations

from pyspark.sql import DataFrame

from musicflow_spark.config import PipelineConfig
from musicflow_spark.plans import analyses, intermediate, marts
from musicflow_spark.plans.staging import stage


def build_all(
    sources: dict[str, DataFrame], cfg: PipelineConfig | None = None
) -> dict[str, DataFrame]:
    cfg = cfg or PipelineConfig()
    stg = stage(sources)
    out: dict[str, DataFrame] = {f"stg__{k}": v for k, v in stg.items()}

    int_join = intermediate.int_join_spotify_uris(stg)
    int_useful = intermediate.int_useful_youtube_library(stg, cfg)
    out["int_join_spotify_uris"] = int_join
    out["int_useful_youtube_library"] = int_useful

    out["log_found_videos"] = marts.log_found_videos(int_join)
    out["log_not_found_videos"] = marts.log_not_found_videos(
        int_useful, stg["spotify_log"]
    )
    out["log_for_tableau"] = marts.log_for_tableau(stg, cfg)

    out["most_saved_channels"] = analyses.most_saved_channels(stg["youtube_videos"])
    out["youtube_statistics"] = analyses.youtube_statistics(int_useful)
    out["videos_saved_more_than_once"] = analyses.videos_saved_more_than_once(int_useful)
    out["found_by_statistics"] = analyses.found_by_statistics(int_join)
    out["found_on_try_statistics"] = analyses.found_on_try_statistics(int_join)
    out["skipped_during_the_run"] = analyses.skipped_during_the_run(int_join)
    out["ratio_of_found_by_playlists"] = analyses.ratio_of_found_by_playlists(stg)
    return out
