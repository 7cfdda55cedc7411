"""The reference's dbt model DAG as pure DataFrame -> DataFrame
functions (SURVEY §3.3): staging views, ephemeral intermediates,
marts, analyses.  'Ephemeral' needs no machinery — Catalyst inlines
un-persisted frames exactly like dbt inlines ephemeral CTEs."""

from musicflow_spark.plans.pipeline import build_all  # noqa: F401
