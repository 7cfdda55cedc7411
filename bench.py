"""Headline benchmark: runs the bench-flagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is executed twice: a warm-up run (JIT, code-gen, file
listing) and a timed run; the timed number is what the driver records
against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from musicflow_spark.queries import get_queries
    from musicflow_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    bench_queries = [q for q in get_queries() if q.bench]
    timings: dict[str, float] = {}
    for q in bench_queries:
        # warm-up: build + run the plan once (not timed)
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[q.name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
