"""Fan-in watermark tracking vs the reference's tracker semantics
(``conveyor-etl-routing/src/watermark.rs``): the unit tests mirror
watermark.rs:163-247 (min combination, advance, only-forward, lateness,
many sources) plus idle promotion (watermark.rs:130-147); the streaming
tests run the stateful ``applyInPandasWithState`` variant end-to-end,
including the processing-time timer that promotes an idle source."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from etl_router_spark.streaming.watermark import (
    SourceWatermarkTracker,
    track_source_watermarks,
)


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t


# -- unit: reference tracker semantics (watermark.rs:163-247) -----------
def test_combined_watermark_minimum():
    tr = SourceWatermarkTracker(["s1", "s2"])
    tr.update("s1", 1000)
    tr.update("s2", 500)
    assert tr.combined_watermark() == 500


def test_combined_watermark_advances():
    tr = SourceWatermarkTracker(["s1", "s2"])
    tr.update("s1", 1000)
    tr.update("s2", 500)
    assert tr.combined_watermark() == 500
    tr.update("s2", 1500)
    assert tr.combined_watermark() == 1000


def test_watermark_only_advances():
    tr = SourceWatermarkTracker(["s1"])
    tr.update("s1", 1000)
    tr.update("s1", 500)
    assert tr.combined_watermark() == 1000


def test_is_late_with_lateness():
    tr = SourceWatermarkTracker(["s1"], allowed_lateness=100)
    tr.update("s1", 1000)
    assert not tr.is_late(950)
    assert not tr.is_late(900)
    assert tr.is_late(899)


def test_not_late_before_any_watermark():
    tr = SourceWatermarkTracker(["s1", "s2"])
    assert not tr.is_late(-(10**12))


def test_many_sources():
    ids = [f"source{i}" for i in range(100)]
    tr = SourceWatermarkTracker(ids)
    for i, sid in enumerate(ids):
        tr.update(sid, i * 100)
    assert tr.combined_watermark() == 0
    tr.update("source0", 5000)
    assert tr.combined_watermark() == 100


def test_idle_source_promoted_to_processing_time():
    clock = FakeClock()
    tr = SourceWatermarkTracker(["active", "idle"], clock=clock)
    tr.set_idle_timeout("idle", 10.0)
    tr.update("active", 1000)
    tr.update("idle", 50)
    assert tr.combined_watermark() == 50  # idle source holds the min

    clock.t = 5.0
    tr.advance_idle_sources(processing_time=2000)
    assert tr.combined_watermark() == 50  # not idle long enough

    clock.t = 20.0
    tr.advance_idle_sources(processing_time=2000)
    # idle source promoted past the active one; combined follows active
    assert tr.source_watermark("idle") == 2000
    assert tr.combined_watermark() == 1000

    # promotion never regresses a watermark (processing_time below it)
    tr.update("idle", 5000)
    clock.t = 40.0
    tr.advance_idle_sources(processing_time=3000)
    assert tr.source_watermark("idle") == 5000


def test_sources_without_timeout_never_promoted():
    clock = FakeClock()
    tr = SourceWatermarkTracker(["s1"], clock=clock)
    tr.update("s1", 100)
    clock.t = 10_000.0
    tr.advance_idle_sources(processing_time=99_999)
    assert tr.combined_watermark() == 100


# -- streaming: stateful per-source watermark op ------------------------
def _write_sources(spark, path, rows):
    spark.createDataFrame(
        rows, "source_id string, event_time timestamp"
    ).write.mode("append").parquet(path)


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_track_source_watermarks_stream(spark, tmp_path):
    """Data path: each source's emitted watermark is its max event
    time; min over sources = the reference's combined watermark."""
    import datetime as dt

    src = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_sources(spark, src, [
        ("a", t0), ("a", t0 + dt.timedelta(seconds=100)),
        ("b", t0 + dt.timedelta(seconds=40)),
    ])
    out = str(tmp_path / "out")
    tracked = track_source_watermarks(_read_stream(spark, src),
                                      source_field="source_id",
                                      ts_field="event_time")
    q = (tracked.writeStream.format("parquet")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .option("path", out)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.source_id: r for r in spark.read.parquet(out).collect()}
    assert got["a"].watermark == t0 + dt.timedelta(seconds=100)
    assert got["b"].watermark == t0 + dt.timedelta(seconds=40)
    assert not got["a"].idle and not got["b"].idle
    combined = min(r.watermark for r in got.values())
    assert combined == t0 + dt.timedelta(seconds=40)


def test_fanin_late_policy_routes_to_dlq(spark, tmp_path):
    """Runner integration: a fan-in with late_policy=route tracks
    per-source watermarks (combined = min over sources,
    watermark.rs:100-107) and routes rows older than
    combined - allowed_lateness to the DLQ (is_late,
    watermark.rs:121-128)."""
    import datetime as dt

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict
    from etl_router_spark.streaming import run_streaming

    t0 = dt.datetime(2024, 1, 1)
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    # source a: fresh rows up to +100s, plus one LATE row at +10s;
    # source b: watermark +40s -> combined = 40, lateness 10 -> cutoff 30
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=100)), (2, t0 + dt.timedelta(seconds=10))],
        "event_id bigint, ts timestamp").write.parquet(a_path)
    spark.createDataFrame(
        [(3, t0 + dt.timedelta(seconds=40))],
        "event_id bigint, ts timestamp").write.parquet(b_path)

    out, dlq = str(tmp_path / "out"), str(tmp_path / "dlq")
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "fanin-late"},
        "spec": {
            "dlq": {"sink_type": "file", "format": "parquet", "path": dlq, "mode": "append"},
            "stages": [
                {"id": "a", "type": "source",
                 "config": {"source_type": "file", "format": "parquet", "path": a_path}},
                {"id": "b", "type": "source",
                 "config": {"source_type": "file", "format": "parquet", "path": b_path}},
                {"id": "both", "type": "fan_in",
                 "config": {"late_policy": "route", "allowed_lateness": "10s",
                            "inputs": [
                                {"watermark": {"event_time_field": "ts"}},
                                {"watermark": {"event_time_field": "ts"}},
                            ]}},
                {"id": "out", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet", "path": out,
                            "mode": "append"}},
            ],
            "edges": [
                {"from": "a", "to": "both"},
                {"from": "b", "to": "both"},
                {"from": "both", "to": "out"},
            ],
        },
    })
    compiled = compile_pipeline(spark, pipeline, streaming=True)
    execution = run_streaming(
        compiled, checkpoint_root=str(tmp_path / "ck"),
        trigger={"availableNow": True})
    for q in execution.queries.values():
        q.awaitTermination(120)

    on_time = {r.event_id for r in spark.read.parquet(out).collect()}
    assert on_time == {1, 3}
    late = spark.read.parquet(dlq).collect()
    assert {r.event_id for r in late} == {2}
    # DLQ envelope attributes the failure to the fan-in stage
    assert all(r["_dlq_failed_stage"] == "both" for r in late)


def test_track_source_watermarks_idle_promotion(spark, tmp_path):
    """Timer path: a source silent for idle_timeout gets promoted to
    processing time (no-data micro-batches fire the timeout)."""
    import datetime as dt

    src = str(tmp_path / "in")
    t0 = dt.datetime(2020, 1, 1)  # far in the past vs processing time
    _write_sources(spark, src, [("a", t0), ("b", t0)])
    out = str(tmp_path / "out")
    tracked = track_source_watermarks(_read_stream(spark, src),
                                      source_field="source_id",
                                      ts_field="event_time",
                                      idle_timeout="1s")
    q = (tracked.writeStream.format("parquet")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .option("path", out)
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 60
        promoted = []
        while time.time() < deadline:
            try:
                promoted = [r for r in spark.read.parquet(out).collect() if r.idle]
            except Exception:
                promoted = []
            if len({r.source_id for r in promoted}) == 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert {r.source_id for r in promoted} == {"a", "b"}
    # promoted watermark is processing time — far past the event times
    for r in promoted:
        assert r.watermark > t0 + dt.timedelta(days=365)
