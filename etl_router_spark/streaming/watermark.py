"""Per-source watermark tracking for fan-in streams.

Mirrors the reference's watermark tracker semantics
(``conveyor-etl-routing/src/watermark.rs:49-147``):

- every source carries its own monotonically-advancing watermark
  (``update`` ignores regressions, watermark.rs:84-98);
- the combined watermark of a fan-in is the MINIMUM over its sources
  (watermark.rs:100-107) — one stalled input holds everything back;
- a source with an ``idle_timeout`` that has not produced for that long
  gets its watermark promoted to processing time
  (``advance_idle_sources``, watermark.rs:130-147), so an idle input
  cannot stall the combined minimum forever;
- ``is_late`` = event_time < combined - allowed_lateness
  (watermark.rs:121-128), never late while no watermark exists.

Two implementations, same semantics:

``SourceWatermarkTracker``
    Driver-side tracker for the micro-batch fan-in path (the runner's
    ``foreachBatch`` epoch loop) — per epoch, per-source max event
    times update it; late rows are routed using ``is_late``. This is
    the execution-model match: the reference's tracker is also a
    single coordinator object fed by source progress messages.

``track_source_watermarks``
    Distributed stateful variant (``applyInPandasWithState`` keyed by
    source id, processing-time timeout = the timer): each key's state
    holds that source's watermark; a timeout fires when the source goes
    idle and promotes the watermark to processing time. Emits one row
    per watermark change — the progress stream a downstream min-
    aggregation turns into the combined watermark.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

_NEG_INF = float("-inf")


@dataclass
class _SourceState:
    watermark: float = _NEG_INF  # event-time seconds
    last_update: float = 0.0     # processing-time (monotonic) seconds
    idle_timeout: float | None = None


class SourceWatermarkTracker:
    """Reference-semantics watermark tracker (watermark.rs:49-147).

    ``clock`` is injectable so idle promotion is deterministic in
    tests; defaults to ``time.monotonic``.
    """

    def __init__(
        self,
        source_ids: list[str],
        allowed_lateness: float = 0.0,
        clock=time.monotonic,
    ) -> None:
        self._clock = clock
        now = clock()
        self._sources: dict[str, _SourceState] = {
            sid: _SourceState(last_update=now) for sid in source_ids
        }
        self.allowed_lateness = float(allowed_lateness)

    def set_idle_timeout(self, source_id: str, timeout: float) -> None:
        self._sources[source_id].idle_timeout = float(timeout)

    def update(self, source_id: str, event_time: float) -> None:
        """Advance a source's watermark; regressions are ignored
        (watermark.rs:84-98 — watermarks only move forward)."""
        state = self._sources.get(source_id)
        if state is None:
            return
        if event_time > state.watermark:
            state.watermark = event_time
            state.last_update = self._clock()

    def combined_watermark(self) -> float:
        """Minimum over all sources (watermark.rs:100-107)."""
        if not self._sources:
            return _NEG_INF
        return min(s.watermark for s in self._sources.values())

    def advance_idle_sources(self, processing_time: float) -> None:
        """Promote watermarks of idle sources to processing time
        (watermark.rs:130-147): a source that declared an idle_timeout
        and has been silent for at least that long follows the clock so
        it cannot stall the combined minimum."""
        now = self._clock()
        for state in self._sources.values():
            if state.idle_timeout is None:
                continue
            if now - state.last_update >= state.idle_timeout:
                if processing_time > state.watermark:
                    state.watermark = processing_time
                    state.last_update = now

    def is_late(self, event_time: float) -> bool:
        """watermark.rs:121-128: nothing is late before any watermark
        exists; otherwise late = older than combined - lateness."""
        combined = self.combined_watermark()
        if combined == _NEG_INF:
            return False
        return event_time < combined - self.allowed_lateness

    def source_watermark(self, source_id: str) -> float | None:
        state = self._sources.get(source_id)
        return None if state is None else state.watermark

    # -- epoch helpers for the runner's foreachBatch fan-in path ---------
    def observe_batch(self, batch_df: DataFrame, source_field: str, ts_field: str) -> None:
        """Update from a micro-batch: one aggregate job computing each
        source's max event time (tiny result — one row per source)."""
        rows = (
            batch_df.groupBy(source_field)
            .agg(F.max(F.col(ts_field).cast("double")).alias("__max_ts"))
            .collect()
        )
        for r in rows:
            if r["__max_ts"] is not None:
                self.update(r[source_field], float(r["__max_ts"]))
        self.advance_idle_sources(time.time())

    def split_late(
        self, batch_df: DataFrame, ts_field: str
    ) -> tuple[DataFrame, DataFrame]:
        """(on_time, late) according to the current combined watermark."""
        combined = self.combined_watermark()
        if combined == _NEG_INF:
            return batch_df, batch_df.limit(0)
        cutoff = combined - self.allowed_lateness
        ts = F.col(ts_field).cast("double")
        return batch_df.filter(ts >= cutoff), batch_df.filter(ts < cutoff)


def track_source_watermarks(
    df: DataFrame,
    source_field: str = "source_id",
    ts_field: str = "event_time",
    idle_timeout: str | None = None,
    promotion_clock=None,
) -> DataFrame:
    """Stateful per-source watermark stream (the timer variant).

    Keyed by ``source_field``; state = that source's watermark (a
    single long — bounded by #sources, the same footprint as the
    reference's tracker map). Data advances the watermark to the
    batch's max event time; a ProcessingTimeTimeout firing after
    ``idle_timeout`` of silence promotes it to processing time
    (watermark.rs:130-147). Spark runs no-data micro-batches by
    default, so timers fire even when every source is quiet.

    Emits ``(source_id, watermark timestamp, idle flag)`` on every
    change; ``min(watermark) over sources`` downstream of this stream
    is the reference's combined watermark.

    ``promotion_clock``: seconds-returning callable used as the
    processing-time source for idle promotion (default wall clock).
    Injectable so the ``stream_idle_source_promotion`` oracle gate can
    pin a deterministic promoted watermark — the reference tracker's
    clock is injected the same way in its tests (watermark.rs:130-147).
    """
    from etl_router_spark.model.parser import parse_duration

    idle_s = parse_duration(idle_timeout) if idle_timeout else None

    out_schema = T.StructType([
        T.StructField(source_field, T.StringType()),
        T.StructField("watermark", T.TimestampType()),
        T.StructField("idle", T.BooleanType()),
    ])
    state_schema = T.StructType([T.StructField("wm_us", T.LongType())])

    def track(key, pdfs, state):
        (sid,) = key
        (wm_us,) = state.get if state.exists else (None,)
        if state.hasTimedOut:
            # idle promotion: watermark follows processing time
            now_s = promotion_clock() if promotion_clock is not None else time.time()
            now_us = int(now_s * 1_000_000)
            promoted = wm_us is None or now_us > wm_us
            if promoted:
                wm_us = now_us
                state.update((wm_us,))
                yield pd.DataFrame({
                    source_field: [sid],
                    "watermark": [pd.Timestamp(wm_us, unit="us")],
                    "idle": [True],
                })
            # Re-arm rules: after an advance (wall-clock runs keep
            # promoting while idle — the reference tracker's repeated
            # advance_idle_sources) AND when the clock is still BEHIND
            # the watermark (future-dated events: the timer must stay
            # alive so promotion resumes once the clock catches up —
            # disarming here would stall this source's watermark until
            # new data arrived). Disarm ONLY at now == previous wm:
            # that value can only be our own last promotion under a
            # frozen clock, where re-arming would schedule no-data
            # micro-batches forever and an availableNow drain could
            # never terminate.
            if idle_s is not None and (promoted or now_us < wm_us):
                state.setTimeoutDuration(int(idle_s * 1000))
            return
        batch_max = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["__ts_us"].max()
                batch_max = m if batch_max is None else max(batch_max, m)
        if batch_max is not None and (wm_us is None or batch_max > wm_us):
            wm_us = int(batch_max)
            state.update((wm_us,))
            yield pd.DataFrame({
                source_field: [sid],
                "watermark": [pd.Timestamp(wm_us, unit="us")],
                "idle": [False],
            })
        if idle_s is not None:
            state.setTimeoutDuration(int(idle_s * 1000))

    prepared = df.select(
        F.col(source_field).cast("string").alias(source_field),
        (F.col(ts_field).cast("double") * 1_000_000).cast("long").alias("__ts_us"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy(source_field).applyInPandasWithState(
        track, out_schema, state_schema, "append", timeout
    )
