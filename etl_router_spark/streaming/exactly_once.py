"""Exactly-once delivery for the foreachBatch sink path.

Spark's native file sink is exactly-once via its manifest log, but
``foreachBatch`` (the fan-out / jdbc / custom-sink path) only guarantees
at-least-once: after a failure the epoch whose writes completed but
whose checkpoint commit didn't is REPLAYED. The reference solves this
with commit markers + idempotency acks (``proto/sink.proto:26-30,
67-70``, ack ``DUPLICATE`` ``source.proto:43-48``); the same idea here:

- ``idempotent_writer(cfg, marker_dir)`` wraps a batch sink write with a
  per-epoch commit marker. A replayed epoch finds its marker and is
  skipped — write-once per epoch id, because Structured Streaming
  guarantees epoch ids are stable across replays of the same data.
- ``dedupe_idempotency(df, key)`` drops replayed records by
  idempotency key inside the stream (the record-level guard, e.g. after
  ``envelope.from_kafka`` which builds topic:partition:offset keys).

Markers are one empty file per epoch in ``marker_dir`` — same
durability class as the sink itself (put it next to the sink path so
both survive or vanish together).
"""

from __future__ import annotations

import os
from typing import Any, Callable

from pyspark.sql import DataFrame

from etl_router_spark.sinks.registry import write_sink


def epoch_committed(marker_dir: str, epoch_id: int) -> bool:
    """A marker counts ONLY if it is complete: it must exist under its
    final name (tmp files never match — rename is the commit point)
    and carry the expected content. A corrupt/empty marker (crash
    mid-write with a non-atomic writer, disk-full truncation) is
    treated as NOT committed — the epoch re-runs, which at-least-once
    sinks tolerate, instead of silently dropping an epoch's data."""
    path = os.path.join(marker_dir, f"epoch-{epoch_id}")
    try:
        with open(path) as fh:
            return fh.read() == f"committed epoch {epoch_id}\n"
    except OSError:
        return False


def mark_epoch(marker_dir: str, epoch_id: int) -> None:
    """Crash-atomic marker write: content to a dot-tmp name, fsync the
    file, rename onto the final name, fsync the directory. A crash at
    any point leaves either no final-name marker or a complete one —
    a torn marker can never be observed under the committed name."""
    os.makedirs(marker_dir, exist_ok=True)
    final = os.path.join(marker_dir, f"epoch-{epoch_id}")
    tmp = os.path.join(marker_dir, f".epoch-{epoch_id}.tmp")
    fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
    try:
        os.write(fd, f"committed epoch {epoch_id}\n".encode())
        os.fsync(fd)
    finally:
        os.close(fd)
    os.rename(tmp, final)
    dfd = os.open(marker_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def idempotent_writer(
    cfg: dict[str, Any], marker_dir: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function with per-epoch commit markers.

    Write happens before the marker: a crash between them re-runs the
    write on replay (the write itself must tolerate that — parquet
    append duplicates are then bounded to ONE epoch, or use an
    overwrite-by-epoch partition layout for true idempotence, see
    ``epoch_partitioned_writer``).
    """

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_committed(marker_dir, epoch_id):
            return  # replayed epoch: sink ack DUPLICATE
        write_sink(batch_df, cfg)
        mark_epoch(marker_dir, epoch_id)

    return write_epoch


def epoch_partitioned_writer(
    path: str, fmt: str = "parquet"
) -> Callable[[DataFrame, int], None]:
    """Truly idempotent file writes: each epoch overwrites its OWN
    partition directory (``.../_epoch=<id>/``), so replaying an epoch
    rewrites identical data in place instead of appending duplicates —
    the overwrite-by-epoch pattern."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.format(fmt)
            .mode("overwrite")
            .save(f"{path}/_epoch={epoch_id}")
        )

    return write_epoch


def dedupe_idempotency(df: DataFrame, key: str = "idempotency_key",
                       within_watermark: bool = False) -> DataFrame:
    """Record-level replay guard: first occurrence of each idempotency
    key wins (``common.proto:12`` + ack DUPLICATE semantics). Use
    ``within_watermark=True`` on watermarked streams so key state is
    evicted instead of growing forever."""
    if df.isStreaming and within_watermark:
        return df.dropDuplicatesWithinWatermark([key])
    return df.dropDuplicates([key])
