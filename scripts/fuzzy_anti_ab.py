"""Interleaved A/B: decontaminate_fuzzy anti-join WITH the round-robin
stage boundary on the matched-id set (HEAD — lets AQE convert the anti
join to broadcast when the hit set measures small) vs WITHOUT (the
pre-r15 shape — build side unmaterialized, SMJ kept regardless).

Median of 3 alternating reps per arm, noop sink, clearCache between
reps. Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path
from unittest import mock

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from etl_router_spark.queries import all_queries
    from etl_router_spark.session import get_spark
    import pyspark.sql.dataframe as df_mod

    spark = get_spark("fuzzy_anti_ab")
    q = dict(all_queries())["corpus_decontaminate_fuzzy"]

    real_repartition = df_mod.DataFrame.repartition

    def run(arm: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        if arm == "without":
            with mock.patch.object(
                    df_mod.DataFrame, "repartition",
                    lambda self, *a, **k: self):
                df = q(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
        else:
            df = q(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both arms once
    run("with"), run("without")
    walls = {"with": [], "without": []}
    for _ in range(REPS):
        walls["with"].append(run("with"))
        walls["without"].append(run("without"))
    out = {
        "exp": "fuzzy_anti_join_stage_boundary",
        "sf": sf_dir.rsplit("/", 1)[-1],
        "with_boundary_med": round(statistics.median(walls["with"]), 3),
        "without_boundary_med": round(statistics.median(walls["without"]), 3),
        "with_reps": [round(w, 3) for w in walls["with"]],
        "without_reps": [round(w, 3) for w in walls["without"]],
    }
    print(json.dumps(out))
    assert df_mod.DataFrame.repartition is real_repartition


if __name__ == "__main__":
    main()
