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
    return os.path.exists(os.path.join(marker_dir, f"epoch-{epoch_id}"))


def mark_epoch(marker_dir: str, epoch_id: int) -> None:
    os.makedirs(marker_dir, exist_ok=True)
    with open(os.path.join(marker_dir, f"epoch-{epoch_id}"), "w"):
        pass


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
