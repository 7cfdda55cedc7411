"""Driver-session simulation: run EVERY registered query on a bare
``SparkSession.builder`` session (NOT our session factory).

The driver builds its own session, so nothing may rely on confs that
only ``musicflow_spark.session.get_spark`` sets (Spark-4 NTZ parquet
reads, ANSI toggles, shuffle-partition counts) — each read path must
set what it needs.  An oracle-green sweep through tools/check_oracle.py
does NOT prove this (it uses get_spark); this loop does.

Usage: python tools/plain_session_smoke.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plain_session_smoke")
        .getOrCreate()
    )

    only = set(sys.argv[2:])
    n_fail = 0
    entry_rows = mod.entry(spark).count()
    print(f"ok   entry ({entry_rows} rows)")
    for name, fn in mod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        print(f"ok   {name} ({n} rows, {time.time() - t0:.1f}s)")
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
