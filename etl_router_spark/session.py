"""SparkSession factory tuned for this engine.

Local test runs use ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster (AQE on, adaptive coalescing, skew-join
handling, Arrow for the Pandas-UDF slow path). Shuffle partitions default
low for local mode; on a real cluster AQE coalescing makes the initial
number mostly irrelevant as long as it is high enough.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_router_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE is enabled so that at scale Spark re-plans joins (broadcast
    promotion, skew splitting) and coalesces post-shuffle partitions at
    runtime; these matter far more at 100 TB than any static setting.
    """
    # Python workers (pandas UDFs / mapInPandas) import this package by
    # module name; make sure they inherit its location even when the
    # driver script runs from elsewhere. On a real cluster this is the
    # job of --py-files / the image; locally PYTHONPATH covers it.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(int(cpus) if cpus.isdigit() else 32, 8)))
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default-false for compat only: with it off, AQE may not touch
        # the output partitioning of a cached subtree, so every persist()
        # in the engine (DSIR's pinned bucket counts, the minhash index,
        # the connected-components and pagerank loop frames, shared-scan
        # fan-out) keeps shuffle.partitions-many reduce tasks no matter
        # how few bytes it holds. Letting AQE size cached output from
        # measured bytes is the same adaptivity the uncached paths
        # already get (interleaved A/B on select_dsir_topk: ~x0.6)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        # and convert in-plan (see etl_router_spark.io.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ungrouped MIN/MAX/COUNT answered from parquet footer stats
        # instead of scanning row data (exact — footer stats are)
        .config("spark.sql.parquet.aggregatePushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate() silently reuses a live session WITHOUT the builder
    # confs above; re-apply the runtime-settable SQLConfs so a reused
    # session still gets engine semantics (r15 ADVICE). Static confs
    # (master, memory, UI) can't change on a live session — skipped.
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        **(extra_conf or {}),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on a reused session: builder value rules
    spark.sparkContext.setLogLevel("WARN")
    return spark
