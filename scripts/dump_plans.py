"""Dump ``explain("formatted")`` for bench queries to plans/r<N>/.

Usage: python scripts/dump_plans.py <suffix> [query ...]
  suffix: e.g. "before" or "after" -> plans/r15/<query>_<suffix>.txt

Captures the physical plan the bench actually times (same SF dir, same
session config) so plan claims in OPTIMIZATION_r*.md are checkable
without running Spark.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r15")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from etl_router_spark.queries import all_queries
    from etl_router_spark.session import get_spark

    names = sys.argv[2:] or bench.BENCH_QUERIES
    spark = get_spark("etl_router_spark_plans")
    queries = dict(all_queries())
    queries["graph_degrees_op"] = bench._graph_degrees_op

    out_dir = Path(__file__).resolve().parent.parent / "plans" / ROUND
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
