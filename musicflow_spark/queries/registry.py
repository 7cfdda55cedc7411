"""Registry plumbing for driver-facing queries."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One driver-checkable query.

    name:   stable key (appears in CORRECTNESS_r{N}.json)
    survey: SURVEY.md §2 operator ids this query exercises
    spark:  (spark, sf_dir) -> DataFrame — the engine under test
    oracle: DuckDB-runnable ANSI SQL over the pre-registered views,
            or None for non-SQL-expressible operators
    bench:  include in bench.py headline timings
    """

    name: str
    survey: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False


def get_queries() -> list[Query]:
    """All registered queries (import-time side-effect free)."""
    from musicflow_spark.queries import approx as _approx
    from musicflow_spark.queries import cleanse as _cleanse
    from musicflow_spark.queries import events as _events
    from musicflow_spark.queries import multimodal as _multimodal
    from musicflow_spark.queries import relational as _relational
    from musicflow_spark.queries import sampling as _sampling
    from musicflow_spark.queries import textops as _textops
    from musicflow_spark.queries import timeseries as _timeseries
    from musicflow_spark.queries import vectors as _vectors
    from musicflow_spark.queries import warehouse as _warehouse

    out: list[Query] = []
    for mod in (
        _relational,
        _events,
        _timeseries,
        _textops,
        _sampling,
        _cleanse,
        _vectors,
        _multimodal,
        _warehouse,
        _approx,
    ):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names: {dupes}")
    return out


ALL_QUERIES = get_queries
