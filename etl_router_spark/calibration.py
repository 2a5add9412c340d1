"""The pinned calibration workload shared by bench.py and
scripts/scale_sweep.py.

One scan+aggregate over lineitem whose code never changes
round-to-round: timed with the same min-of-N/noop-sink protocol as the
headline queries, it measures the machine's per-job overhead + scan
throughput of the day, so cross-round per-query deltas can be
normalized against drift. Living in ONE place keeps the bench's
``calibration`` field and the sweep's ``calibration_scan_agg`` row the
same workload by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def calibration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             F.sum("l_extendedprice").alias("s"),
             F.avg("l_discount").alias("a"))
    )
