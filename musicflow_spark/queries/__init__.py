"""Query registry — the driver-facing catalog of every implemented
operator (SURVEY.md §2) plus the beyond-reference training-data ops.

Each :class:`Query` pairs a Spark DataFrame program with the ANSI-SQL
oracle the DuckDB harness runs side-by-side.  Column names are aliased
identically on both sides (the driver sorts columns by name before
value-hashing).  Queries whose semantics are not SQL-expressible
(MinHash-LSH banding, SimHash, streaming state) carry ``oracle=None``
and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from musicflow_spark.queries.registry import ALL_QUERIES, Query, get_queries  # noqa: F401
