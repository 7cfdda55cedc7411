"""`dbt test` parity: run the ported assertion suite against the
model layer and print one line per check.

By default builds the models from the deterministic fixture sources
(tests/fixtures.py); pass a warehouse directory produced by
plans/dag.py::musicflow_pipeline to check real pipeline output
instead.

Usage:
  python tools/run_checks.py              # fixture sources
  python tools/run_checks.py /path/to/wh  # pipeline warehouse
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from musicflow_spark.checks import reference_suite
    from musicflow_spark.config import PipelineConfig
    from musicflow_spark.plans.pipeline import build_all
    from musicflow_spark.schemas import MUSICFLOW_SCHEMAS
    from musicflow_spark.session import get_spark

    spark = get_spark("run_checks", cpus=8)
    cfg = PipelineConfig()

    if len(sys.argv) > 1:
        wh = sys.argv[1]
        sources = {
            name: spark.read.schema(schema).parquet(os.path.join(wh, name))
            for name, schema in MUSICFLOW_SCHEMAS.items()
            if os.path.exists(os.path.join(wh, name))
        }
        missing = set(MUSICFLOW_SCHEMAS) - set(sources)
        if missing:
            print(f"warehouse {wh} missing tables: {sorted(missing)}", file=sys.stderr)
            return 2
    else:
        from tests.fixtures import build_sources

        sources = build_sources(spark)

    models = build_all(sources, cfg)
    suite = reference_suite(models)
    results = suite.run()
    failed = 0
    for r in results:
        print(r)
        failed += 0 if r.passed else 1
    print(f"\n{len(results) - failed}/{len(results)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
