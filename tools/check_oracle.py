"""Local stand-in for the driver's t2 correctness harness.

Runs every registered query on Spark AND its DuckDB oracle over the
same parquet tables, then compares row count, column-name set, and
values (columns sorted by name, rows sorted) — strictly: exact match
for non-floats, bit-exactness reported for floats.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    s, o = canon(sdf), canon(odf)
    if len(s) != len(o):
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Dtype-class gate: the driver hashes values WITH their dtype, so an
        # integer column on one side vs float on the other (the DuckDB
        # HUGEINT→float64 path) is a hash mismatch even when values agree.
        # Fail here, BEFORE the float coercion below masks it.
        s_int = pd.api.types.is_integer_dtype(sv)
        o_int = pd.api.types.is_integer_dtype(ov)
        s_flt = pd.api.types.is_float_dtype(sv)
        o_flt = pd.api.types.is_float_dtype(ov)
        if (s_int and o_flt) or (s_flt and o_int):
            problems.append(
                f"col {c}: dtype-class mismatch spark={sv.dtype} oracle={ov.dtype}"
                " (driver hash would differ; CAST the oracle aggregate)"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype(float).to_numpy()
            oa = ov.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                with np.errstate(invalid="ignore"):
                    md = np.nanmax(np.abs(sa - oa))
                problems.append(f"col {c}: {bad} float mismatches, maxdiff={md:.3e}")
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches, first: spark={sv[idx]!r} oracle={ov[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from musicflow_spark.queries import get_queries
    from musicflow_spark.session import get_spark
    from musicflow_spark.sources.catalog import TESTDATA_TABLES

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_fail = 0
    for q in get_queries():
        if only and q.name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {q.name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if q.oracle is None:
            print(f"ok   {q.name}: rows-only ({len(sdf)} rows, {dt:.1f}s)")
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {q.name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(q.name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {q.name} ({len(sdf)} rows, {dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {q.name} ({len(sdf)} rows, {dt:.1f}s)")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
