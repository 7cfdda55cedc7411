"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over musicflow_spark.queries — the driver runs
``entry(spark)`` as a smoke check, each ``queries()[name]`` at sf=0.01
against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the snowflake-flatten
    wide denormalizing join (SURVEY §2.3 J1-J5 + §2.8 F16/F17)."""
    from musicflow_spark.queries.relational import snowflake_flatten

    return snowflake_flatten(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    from musicflow_spark.queries import get_queries

    return {q.name: q.spark for q in get_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    from musicflow_spark.queries import get_queries

    return {q.name: q.oracle for q in get_queries() if q.oracle is not None}
