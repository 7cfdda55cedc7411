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


def _green_rounds() -> dict[str, int]:
    """name → LAST round with a green driver row, parsed live from the
    committed ``CORRECTNESS_r{N}.json`` records at the repo root.

    This replaces the hand-rotated ``_DRIVER_PROVEN`` tuple + stride
    machinery (VERDICT r12 item 2): the driver correctness-checks only
    the FIRST 50 registry entries per round, so ``get_queries`` orders
    never-proven queries first (new work is always driver-checked the
    round it lands) and then the proven tier OLDEST-GREEN-FIRST — each
    round re-certifies the 50 stalest entries, and when the driver
    commits this round's CORRECTNESS file those become the freshest
    and the window advances to the next-stalest cohort by itself.  A
    green row = rows+schema matched, no error, and the value hash
    matched when one was computed (rows-only checks count, flagged as
    such in the record the judge reads).

    Missing/unparseable files degrade to ``{}`` — module order, the
    round-1 behavior — never an import failure."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def get_queries() -> list[Query]:
    """All registered queries: never-driver-proven first (module
    order), then the proven tier oldest-green-first (see
    ``_green_rounds``; module order breaks ties within a cohort)."""
    from musicflow_spark.queries import approx as _approx
    from musicflow_spark.queries import classic as _classic
    from musicflow_spark.queries import cleanse as _cleanse
    from musicflow_spark.queries import events as _events
    from musicflow_spark.queries import graph as _graph
    from musicflow_spark.queries import matchflow as _matchflow
    from musicflow_spark.queries import multimodal as _multimodal
    from musicflow_spark.queries import relational as _relational
    from musicflow_spark.queries import sampling as _sampling
    from musicflow_spark.queries import streamtwins as _streamtwins
    from musicflow_spark.queries import textops as _textops
    from musicflow_spark.queries import timeseries as _timeseries
    from musicflow_spark.queries import vectors as _vectors
    from musicflow_spark.queries import warehouse as _warehouse

    out: list[Query] = []
    for mod in (
        _relational,
        _matchflow,
        _classic,
        _events,
        _streamtwins,
        _timeseries,
        _textops,
        _sampling,
        _cleanse,
        _vectors,
        _multimodal,
        _warehouse,
        _approx,
        _graph,
    ):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate query names: {dupes}")
    green = _green_rounds()
    module_pos = {n: i for i, n in enumerate(names)}
    # tier 0: never driver-proven — always inside the first-50 driver
    # window, so new work is checked the round it lands; tier 1:
    # proven, STALEST green first — each round the window fill
    # re-certifies the 50 entries the driver has not confirmed for
    # the longest (VERDICT r12 item 2), advancing by itself as new
    # CORRECTNESS files are committed.
    def _key(q: Query) -> tuple[int, int, int]:
        if q.name in green:
            return (1, green[q.name], module_pos[q.name])
        return (0, 0, module_pos[q.name])

    out.sort(key=_key)
    return out


ALL_QUERIES = get_queries
