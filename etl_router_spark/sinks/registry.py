"""Sink registry: file/parquet sinks, console, memory, kafka, jdbc.

The reference types only one sink config (gRPC, ``types.rs:703-720``)
plus named sink manifests (e.g. the S3 parquet archive,
``examples/manifests/sinks/s3-archive.yaml``). Our engine exposes Spark's
writer surface under the same config shape. Delivery guarantees
(``proto/sink.proto:26-30``): batch parquet writes are atomic per job;
streaming exactly-once comes from checkpoint + idempotent epoch handling
in ``foreachBatch`` (see streaming module).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def _upsert_file_sink(df: DataFrame, cfg: dict[str, Any], fmt: str, path: str) -> None:
    """mode=upsert: merge ``df`` into the dataset at ``path`` keyed on
    ``merge_keys`` (latest-by-``order_by`` wins; optional ``op_col``
    tombstones deletes), then atomically swap the rewrite in.

    Single-writer assumption: the rename swap serializes readers
    against ONE writer; concurrent upserts to the same path race
    (last swap wins, the loser's merge is lost). Coordinate writers
    externally, or use a table format (Delta/Iceberg MERGE) where
    optimistic concurrency is required."""
    spark = df.sparkSession
    merge_keys = cfg.get("merge_keys")
    order_by = cfg.get("order_by")
    if not merge_keys or not order_by:
        raise ValueError("mode=upsert requires merge_keys and order_by")
    from etl_router_spark.functions.cdc import cdc_snapshot_merge

    jvm = spark._jvm
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(fs_path):
        # bootstrap: apply the batch against an empty target — latest
        # per key, deletes tombstoned; target schema excludes op_col
        from etl_router_spark.functions.cdc import cdc_apply

        df_out = cdc_apply(
            df, list(merge_keys), list(order_by), op_col=cfg.get("op_col")
        )
        if cfg.get("op_col"):
            df_out = df_out.drop(cfg["op_col"])
        df_out.write.format(fmt).save(path)
        return
    existing = spark.read.format(fmt).load(path)
    merged = cdc_snapshot_merge(
        existing,
        df.select(*existing.columns,
                  *([cfg["op_col"]] if cfg.get("op_col")
                    and cfg["op_col"] not in existing.columns else [])),
        key_cols=list(merge_keys),
        order_cols=list(order_by),
        op_col=cfg.get("op_col"),
    )
    # atomic swap (same discipline as compact_files): write sibling tmp,
    # move old aside, move new in, delete old; rollback on failure
    tmp = path.rstrip("/") + ".__upsert_tmp"
    old = path.rstrip("/") + ".__upsert_old"
    merged.write.format(fmt).mode("overwrite").save(tmp)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if not fs.rename(fs_path, jold):
        raise IOError(f"upsert: could not move {path} aside")
    if not fs.rename(jtmp, fs_path):
        fs.rename(jold, fs_path)
        raise IOError(f"upsert: could not move merged data into {path}")
    fs.delete(jold, True)


def write_sink(df: DataFrame, cfg: dict[str, Any]) -> None:
    """Batch write dispatch on sink_type/format."""
    stype = (cfg.get("sink_type") or cfg.get("type") or "file").lower()
    if stype in ("file", "s3", "gcs"):
        path = cfg.get("path")
        if stype == "s3":
            path = f"s3a://{cfg['bucket']}/{cfg.get('prefix', '').lstrip('/')}"
        elif stype == "gcs":
            path = f"gs://{cfg['bucket']}/{cfg.get('prefix', '').lstrip('/')}"
        fmt = (cfg.get("format") or "parquet").lower()
        if fmt == "lines":  # reference's line-delimited text (types.rs:280)
            fmt = "text"
        if (cfg.get("mode") or "").lower() == "upsert":
            # MERGE-without-a-table-format: latest state per merge_key
            # wins over the existing dataset (order_by breaks ties, an
            # op column tombstones). Changed keys cost one left_anti
            # join keyed on merge_keys; the rewrite swaps in atomically
            # like compact_files. On object stores / with partial-key
            # updates, prefer a table format's MERGE INTO — this is
            # the whole-dataset-rewrite fallback.
            _upsert_file_sink(df, cfg, fmt, path)
            return
        writer = df.write.format(fmt).mode(cfg.get("mode", "append"))
        # scale: partition the sink by natural keys -> partition pruning
        # for downstream readers
        if cfg.get("partition_by"):
            writer = writer.partitionBy(*cfg["partition_by"])
            # backfill surface: overwrite ONLY the partitions present in
            # this batch (per-writer option — no session conf mutation);
            # static overwrite would drop every other partition
            if (cfg.get("partition_overwrite") or "").lower() == "dynamic":
                writer = writer.option("partitionOverwriteMode", "dynamic")
        if fmt == "csv":
            writer = writer.option("header", "true")
        if cfg.get("compression"):
            writer = writer.option("compression", cfg["compression"])
        writer.save(path)
        return
    if stype == "console":
        df.show(int(cfg.get("num_rows", 20)), truncate=False)
        return
    if stype == "noop":
        df.write.format("noop").mode("overwrite").save()
        return
    if stype == "jdbc":
        writer = (
            df.write.format("jdbc")
            .option("url", cfg["url"])
            .option("dbtable", cfg["table"])
            .mode(cfg.get("mode", "append"))
        )
        for k in ("user", "password", "driver"):
            if cfg.get(k):
                writer = writer.option(k, cfg[k])
        writer.save()
        return
    if stype == "table":
        from etl_router_spark.io import write_bucketed

        write_bucketed(
            df,
            cfg["table"],
            bucket_by=cfg.get("bucket_by"),
            buckets=int(cfg.get("buckets", 8)),
            sort_by=cfg.get("sort_by"),
            partition_by=cfg.get("partition_by"),
            path=cfg.get("path"),
            fmt=cfg.get("format", "parquet"),
            mode=cfg.get("mode", "overwrite"),
        )
        return
    if stype == "grpc":
        # the reference's only TYPED sink (types.rs:703-759): endpoint +
        # retry policy. Executor-parallel: each partition opens one
        # HTTP/2 connection and streams its batches as unary gRPC
        # calls; per-call exponential backoff per the retry config;
        # exhausted retries fail the task (at-least-once via task
        # retry, the reference's default delivery guarantee).
        import json

        from etl_router_spark.sinks.grpc_client import send_rows_partition

        host, port = cfg["endpoint"].rsplit(":", 1)
        path = cfg.get("path", "/conveyor.etl.Ingest/Push")
        batch_size = int(cfg.get("batch_size", 500))
        retry = cfg.get("retry") or {}
        max_retries = int(retry.get("max_retries", 3))
        initial_ms = int(retry.get("initial_backoff_ms", 100))
        mult = float(retry.get("backoff_multiplier", 2.0))
        max_ms = int(retry.get("max_backoff_ms", 30_000))
        columns = df.columns

        def _part(rows):
            send_rows_partition(
                rows, host, int(port), path, batch_size,
                lambda r: json.dumps(dict(zip(columns, r)), default=str),
                max_retries=max_retries, initial_backoff_ms=initial_ms,
                backoff_multiplier=mult, max_backoff_ms=max_ms,
            )

        df.foreachPartition(_part)
        return
    if stype == "warc":
        # Corpus export as WET archives (one per partition, atomic
        # publish) — the inverse of the warc source; see sources/warc.py
        from etl_router_spark.sources.warc import register

        register(df.sparkSession)
        writer = df.write.format("warc").option("path", cfg["path"])
        for k in ("url_field", "payload_field"):
            if cfg.get(k):
                writer = writer.option(k, cfg[k])
        if cfg.get("gzip") is not None:
            writer = writer.option("gzip", str(bool(cfg["gzip"])).lower())
        writer.mode("append").save()
        return
    if stype == "kafka":
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", cfg["brokers"])
            .option("topic", cfg["topic"])
            .save()
        )
        return
    raise ValueError(f"unknown sink_type: {stype!r}")
