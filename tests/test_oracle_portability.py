"""Oracle-SQL portability gates (no Spark session needed — pure DuckDB).

The driver hashes query results WITH their pandas dtype, so a DuckDB
output type that pandas widens differently than Spark's (HUGEINT →
float64 vs Spark's int64) fails `hash_match` even when every value is
identical — exactly the round-2 red board.  These tests DESCRIBE every
registered oracle and reject the non-portable output types up front, so
a new oracle can't reintroduce the class.
"""

from __future__ import annotations

import duckdb
import pytest

from musicflow_spark.queries import get_queries
from musicflow_spark.sources.catalog import TESTDATA_TABLES

# DuckDB types that pandas materializes with a dtype Spark never emits:
#   HUGEINT/UHUGEINT -> float64 (Spark: int64)
#   UBIGINT          -> uint64  (Spark: int64)
# DECIMAL is allowed only when the Spark side is decimal too — no current
# query uses it, so reject it as well until one does deliberately.
_NON_PORTABLE = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "DECIMAL")


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.slow
def test_no_oracle_emits_non_portable_dtypes(oracle_con):
    offenders: dict[str, list[tuple[str, str]]] = {}
    n_sql = 0
    for q in get_queries():
        if q.oracle is None:
            continue
        n_sql += 1
        desc = oracle_con.execute(f"DESCRIBE ({q.oracle})").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if any(t in typ.upper() for t in _NON_PORTABLE)
        ]
        if bad:
            offenders[q.name] = bad
    assert not offenders, (
        "oracles emit driver-hash-hostile dtypes (wrap the aggregate in "
        f"CAST(... AS BIGINT)): {offenders}"
    )
    assert n_sql >= 90  # the sweep actually covered the registry


def test_dtype_class_gate_catches_int_vs_float():
    """The local comparator must flag an int64-vs-float64 column pair
    BEFORE its float coercion — the exact shape that masked round 2's
    HUGEINT reds (values equal, driver hash different)."""
    import pandas as pd

    from tools.check_oracle import compare

    s = pd.DataFrame({"k": [1, 2], "v": pd.Series([10, 20], dtype="int64")})
    o = pd.DataFrame({"k": [1, 2], "v": pd.Series([10.0, 20.0], dtype="float64")})
    problems = compare("t", s, o)
    assert any("dtype-class mismatch" in p for p in problems)
    # identical dtypes stay green
    assert compare("t", s, s.copy()) == []
