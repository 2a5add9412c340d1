"""Canonical table loading for the synthetic test fixtures.

``/root/testdata/sf*/`` parquet files mostly use µs/ms timestamps, but
``events.ts`` is TIMESTAMP(NANOS) which Spark's vectorized parquet reader
rejects. With ``spark.sql.legacy.parquet.nanosAsLong=true`` the column
arrives as BIGINT nanoseconds; ``load_table`` converts it back to a
proper TimestampType in-plan (``timestamp_micros(ns div 1000)``) —
distributed, no driver materialization, floor semantics identical to
DuckDB's ns->µs cast so oracle comparisons stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# columns known to be event-time nanos in the fixtures
_NANO_TS_COLUMNS = {"events": ["ts"]}


# (application id, sf_dir, table) -> DataFrame. DataFrames are
# immutable plan handles, so sharing one per table is safe; the win is
# skipping the per-read parquet footer/schema job that every query
# otherwise pays at plan-construction time. Keyed by applicationId so
# a restarted session never sees plans bound to a dead context.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, []):
        field = df.schema[col] if col in df.columns else None
        if field is not None and isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    _TABLE_CACHE[key] = df
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str] | None = None,
    buckets: int = 8,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a catalog table, optionally hash-bucketed on join keys.

    Bucketing is the repeat-join answer at 100 TB: two tables bucketed
    on the same keys with the same bucket count join with **zero
    exchange** — the shuffle is paid once at write time and amortized
    over every subsequent join/aggregation on those keys. ``sort_by``
    (defaults to the bucket keys) additionally pre-sorts each bucket
    so sort-merge joins skip their per-task sort.

    ``path`` makes the table external (data at ``path``, metadata in
    the catalog); without it the data lands in the warehouse dir.
    """
    writer = df.write.format(fmt).mode(mode)
    if path:
        writer = writer.option("path", path)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        writer = writer.bucketBy(buckets, *bucket_by)
        writer = writer.sortBy(*(sort_by or bucket_by))
    writer.saveAsTable(table)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
