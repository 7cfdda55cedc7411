"""Query registry — the driver-facing catalog of every implemented
operator (SURVEY.md §2) plus the beyond-reference training-data ops.

Each :class:`Query` pairs a Spark DataFrame program with the ANSI-SQL
oracle the DuckDB harness runs side-by-side.  Column names are aliased
identically on both sides (the driver sorts columns by name before
value-hashing).  As of round 2 EVERY registered query carries a full
oracle — sketch/ANN pipelines are seeded-deterministic and their
oracles replicate them end to end (portable hashes, plane literals,
stride-seeded centroids), the LSH-recall-dependent minhash query uses
the exact predicate as a soundness+completeness oracle, and the
iterative clustering operator is checked against a recursive CTE.
"""

from __future__ import annotations

from musicflow_spark.queries.registry import ALL_QUERIES, Query, get_queries  # noqa: F401
