"""Per-query profiler for the optimization rounds (guide §1).

Runs each named query with the noop sink (warm-up + timed min-of-3),
captures .explain("formatted") to plans/<tag>/<name>_<suffix>.txt, and
— with the UI enabled in this session — pulls per-stage metrics from
the local REST API so the slow stage is identified, not guessed.

Usage:
  python tools/profile_query.py [--sf DIR] [--tag r13] [--suffix before]
                                [--runs 3] [--no-plans] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--stages", type=int, default=8,
                    help="top-N slowest stages to print per query")
    args = ap.parse_args()

    from musicflow_spark.queries import get_queries
    from musicflow_spark.session import get_spark

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    by_name = {q.name: q for q in get_queries()}

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(plan_dir, exist_ok=True)

    def stages_snapshot() -> dict[int, dict]:
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            ) as r:
                data = json.load(r)
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"  [stage API unavailable: {e}]")
            return {}
        return {s["stageId"]: s for s in data}

    results = {}
    for name in args.queries:
        q = by_name[name]
        if not args.no_plans:
            df = q.spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        # warm-up
        sc.setJobDescription(f"{name}: warmup")
        q.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
        before = set(stages_snapshot())
        best = float("inf")
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: timed {i}")
            t0 = time.time()
            q.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        sc.setJobDescription(None)
        after = stages_snapshot()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        results[name] = round(best, 3)
        print(f"\n=== {name}: min {best:.3f}s over {args.runs} runs "
              f"({len(new)} stages across runs) ===")
        for s in new[: args.stages]:
            rt = (s.get("executorRunTime") or 0) / 1000.0
            srm = (s.get("shuffleReadBytes") or 0) / 1e6
            swm = (s.get("shuffleWriteBytes") or 0) / 1e6
            inm = (s.get("inputBytes") or 0) / 1e6
            nm = (s.get("name") or "")[:60]
            print(
                f"  stage {s['stageId']:>4} tasks={s.get('numCompleteTasks', 0):>3}"
                f" run={rt:7.2f}s in={inm:8.1f}MB sr={srm:8.1f}MB"
                f" sw={swm:8.1f}MB  {nm}"
            )
        import gc

        gc.collect()
        spark._jvm.System.gc()

    print("\n" + json.dumps(results))


if __name__ == "__main__":
    main()
