"""Streaming execution: compiled pipeline -> StreamingQuery set.

Maps the reference's streaming control plane onto Structured Streaming:

- offsets/watermarks/checkpoints (``proto/checkpoint.proto``,
  ``raft/src/router_state.rs:40-46``) -> ``checkpointLocation`` (offset
  log + state store + commit log, already replicated/fault-tolerant);
- aggregate emit modes (``types.rs:634-641``) -> output modes: append
  (= on_window_close), update (= on_update); periodic -> update + a
  processing-time trigger;
- fan-out shared scan (``optimizer.rs:57-237``,
  ``engine.rs:324-352``) -> ONE ``foreachBatch`` per fan-out stage that
  replays the sub-DAG below it on the per-epoch batch and writes every
  sink — the source is read once per epoch, exactly like the
  reference's shared-source optimization;
- DLQ side-outputs (``dlq/src/record.rs:96-180``) -> separate streams
  enriched with ``_dlq_*`` columns;
- backpressure credits (``buffer/src/backpressure.rs``) -> source-side
  pacing (maxFilesPerTrigger / maxOffsetsPerTrigger), configured on the
  source, not here — Spark's pull model needs no credit protocol.

Delivery: native file sinks are exactly-once (file-sink manifest log);
foreachBatch fan-out is at-least-once per epoch — pair with idempotent
sinks or dedupe on ``idempotency_key`` downstream
(``proto/sink.proto:26-30`` semantics).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from etl_router_spark.compile.pipeline import CompiledPipeline, compile_stages
from etl_router_spark.model.manifest import Pipeline, StageType
from etl_router_spark.sinks.registry import write_sink

DEFAULT_TRIGGER: dict[str, Any] = {"availableNow": True}

# emit modes that require re-emitting updated rows (types.rs:634-641
# aggregate; types.rs:690-697 sessionize)
_UPDATE_EMITS = {"on_update", "periodic", "on_event", "both"}


def infer_output_mode(pipeline: Pipeline, sink_id: str) -> str:
    """Walk the sink's ancestors; stateful stages decide the mode.

    ``on_window_close``/``on_close`` -> append (rows final once the
    watermark closes the window); ``on_update``-family -> update;
    keep-last dedupe is a running aggregate -> update; stateless
    pipelines -> append.
    """
    mode = "append"
    seen: set[str] = set()
    frontier = [sink_id]
    while frontier:
        sid = frontier.pop()
        if sid in seen:
            continue
        seen.add(sid)
        stage = pipeline.stages[sid]
        if stage.stage_type == StageType.TRANSFORM:
            tt = stage.transform_type
            if tt in ("aggregate", "sessionize"):
                emit = stage.config.get("emit") or "on_window_close"
                if emit in _UPDATE_EMITS:
                    mode = "update"
            elif tt == "dedupe" and stage.config.get("keep") == "last":
                mode = "update"
        frontier.extend(e.from_stage for e in pipeline.incoming(sid))
    return mode


class StreamingExecution:
    """Handle on the started queries of one pipeline."""

    def __init__(self, queries: dict[str, StreamingQuery]):
        self.queries = queries

    def await_termination(self, timeout: float | None = None) -> None:
        for q in self.queries.values():
            q.awaitTermination(timeout)

    def process_all_available(self) -> None:
        for q in self.queries.values():
            q.processAllAvailable()

    def stop(self) -> None:
        for q in self.queries.values():
            if q.isActive:
                q.stop()

    @property
    def any_active(self) -> bool:
        return any(q.isActive for q in self.queries.values())


def _fanout_groups(pipeline: Pipeline) -> dict[str, list[str]]:
    """fan-out stage id -> sink ids reachable from it."""
    groups: dict[str, list[str]] = {}
    for stage in pipeline.stages.values():
        if stage.stage_type != StageType.FAN_OUT:
            continue
        reach: set[str] = set()
        frontier = [e.to_stage for e in pipeline.outgoing(stage.id)]
        while frontier:
            sid = frontier.pop()
            if sid in reach:
                continue
            reach.add(sid)
            frontier.extend(e.to_stage for e in pipeline.outgoing(sid))
        sinks = [s for s in reach if pipeline.stages[s].stage_type == StageType.SINK]
        if len(sinks) >= 2:
            groups[stage.id] = sorted(sinks)
    return groups


def _descendant_order(pipeline: Pipeline, root: str) -> list[str]:
    reach: set[str] = set()
    frontier = [e.to_stage for e in pipeline.outgoing(root)]
    while frontier:
        sid = frontier.pop()
        if sid in reach:
            continue
        reach.add(sid)
        frontier.extend(e.to_stage for e in pipeline.outgoing(sid))
    return [s for s in pipeline.topological_order() if s in reach]


def _start_sink_query(
    df: DataFrame,
    cfg: dict[str, Any],
    mode: str,
    checkpoint: str,
    trigger: dict[str, Any],
    name: str | None = None,
) -> StreamingQuery:
    """One sink -> one StreamingQuery.

    Append-mode file sinks use Spark's native exactly-once file sink;
    everything else (update mode, jdbc/kafka/console/custom) goes
    through foreachBatch -> the batch sink registry.
    """
    stype = (cfg.get("sink_type") or cfg.get("type") or "file").lower()
    writer = df.writeStream.option("checkpointLocation", checkpoint).trigger(**trigger)
    qname = cfg.get("name") or name  # memory sink: queryName == table name
    if qname:
        writer = writer.queryName(qname)

    if stype == "memory":
        # memory sink supports append/complete; update-shaped results
        # are materialized via complete so tests can read final state
        mem_mode = "complete" if mode == "update" else mode
        return writer.format("memory").outputMode(mem_mode).start()
    if stype == "console":
        return writer.format("console").outputMode(mode).start()
    if stype in ("file", "s3", "gcs") and mode == "append":
        path = cfg.get("path")
        if stype == "s3":
            path = f"s3a://{cfg['bucket']}/{cfg.get('prefix', '').lstrip('/')}"
        elif stype == "gcs":
            path = f"gs://{cfg['bucket']}/{cfg.get('prefix', '').lstrip('/')}"
        fmt = (cfg.get("format") or "parquet").lower()
        w = writer.format(fmt).option("path", path).outputMode("append")
        if cfg.get("partition_by"):
            w = w.partitionBy(*cfg["partition_by"])
        return w.start()

    # general path: per-epoch batch write through the sink registry
    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        write_sink(batch_df, cfg)

    return writer.foreachBatch(write_epoch).outputMode(mode).start()


def _derive_trigger(pipeline: Pipeline) -> dict[str, Any] | None:
    """``emit: periodic`` (types.rs:634-641 AggregateEmit::Periodic) is
    a timer-driven emit of current aggregate state: map it to a
    processing-time trigger — each tick re-emits updated groups in
    update mode. The period is the stage's ``emit_interval`` (engine
    knob; the reference enum carries no interval)."""
    from etl_router_spark.model.parser import duration_to_interval

    for stage in pipeline.stages.values():
        if (
            stage.stage_type == StageType.TRANSFORM
            and stage.transform_type in ("aggregate", "sessionize")
            and stage.config.get("emit") == "periodic"
        ):
            return {
                "processingTime": duration_to_interval(
                    stage.config.get("emit_interval", "10s")
                )
            }
    return None


def run_streaming(
    compiled: CompiledPipeline,
    checkpoint_root: str,
    trigger: dict[str, Any] | None = None,
    shared_fanout: bool = True,
    dlq_sink: dict[str, Any] | None = None,
    exactly_once: bool = False,
) -> StreamingExecution:
    """Start every sink of a streaming-compiled pipeline.

    ``shared_fanout=True``: sinks below a fan-out stage share ONE query
    and one upstream scan per epoch (foreachBatch replays the sub-DAG on
    the persisted batch). Each query checkpoints independently under
    ``checkpoint_root``.

    ``exactly_once=True``: fan-out epochs commit a marker after writing
    all sinks (``streaming.exactly_once``); a replayed epoch that
    already carries a marker is skipped — CommitMarker semantics
    (``proto/sink.proto:67-70``).
    """
    if not compiled.streaming:
        raise ValueError("pipeline was compiled with streaming=False")
    pipeline = compiled.pipeline
    spark = compiled.spark
    trig = trigger or _derive_trigger(pipeline) or dict(DEFAULT_TRIGGER)

    # idle-source handling (watermark.rs:130-147): the reference advances
    # an idle source's watermark to processing time so it can't stall the
    # combined minimum. Two mechanisms here: multipleWatermarkPolicy=max
    # lets Spark-native stateful operators follow the most advanced
    # input, and streaming.watermark provides the reference-exact
    # tracker (SourceWatermarkTracker for foreachBatch epochs;
    # track_source_watermarks = the applyInPandasWithState timer
    # variant whose ProcessingTimeTimeout promotes idle sources).
    for stage in pipeline.stages.values():
        if stage.stage_type == StageType.FAN_IN and any(
            (i.get("watermark") or {}).get("idle_timeout")
            for i in stage.config.get("inputs") or []
        ):
            spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
            break
    queries: dict[str, StreamingQuery] = {}
    handled: set[str] = set()

    # fan-in stages with a declared late_policy get the reference's
    # per-source watermark semantics (watermark.rs:84-147): each epoch
    # updates a SourceWatermarkTracker from per-source max event times
    # (+ idle promotion), then routes rows older than
    # combined - allowed_lateness per the policy (route -> DLQ,
    # drop -> discard, tag -> boolean column).
    for fid, stage in pipeline.stages.items():
        policy = (
            stage.config.get("late_policy")
            if stage.stage_type == StageType.FAN_IN
            else None
        )
        if policy not in ("route", "drop", "tag"):
            continue
        from etl_router_spark.compile.fan import apply_fan_in
        from etl_router_spark.model.manifest import FieldMapping
        from etl_router_spark.model.parser import parse_duration
        from etl_router_spark.streaming.watermark import SourceWatermarkTracker

        in_edges = pipeline.incoming(fid)
        per_input = stage.config.get("inputs") or [{}] * len(in_edges)
        source_ids = [e.from_stage for e in in_edges]
        maps = [
            [FieldMapping.from_dict(m) for m in (i.get("mappings") or [])] or None
            for i in per_input
        ]
        tagged = apply_fan_in(
            [compiled.stage_frames[s] for s in source_ids], maps, tags=source_ids
        )
        ts_field = next(
            (
                (i.get("watermark") or {}).get("event_time_field")
                for i in per_input
                if (i.get("watermark") or {}).get("event_time_field")
            ),
            "event_time",
        )
        lateness = parse_duration(stage.config.get("allowed_lateness") or "0s")
        tracker = SourceWatermarkTracker(source_ids, allowed_lateness=lateness)
        for sid_, icfg in zip(source_ids, per_input):
            idle = (icfg.get("watermark") or {}).get("idle_timeout")
            if idle:
                tracker.set_idle_timeout(sid_, parse_duration(idle))

        order = _descendant_order(pipeline, fid)
        sink_ids = [
            s for s in order if pipeline.stages[s].stage_type == StageType.SINK
        ]
        dlq_cfg_fanin = dlq_sink or pipeline.dlq

        def make_fanin_writer(fid, order, sink_ids, tracker, ts_field, policy, dlq_cfg_fanin):
            def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
                batch_df.persist()
                try:
                    tracker.observe_batch(batch_df, "__source_id", ts_field)
                    on_time, late = tracker.split_late(batch_df, ts_field)
                    if policy == "tag":
                        import pyspark.sql.functions as F

                        combined = tracker.combined_watermark()
                        on_time = batch_df.withColumn(
                            "late",
                            F.lit(False) if combined == float("-inf")
                            else F.col(ts_field).cast("double")
                            < F.lit(combined - tracker.allowed_lateness),
                        )
                    seed = on_time.drop("__source_id")
                    sinks2, _ = compile_stages(
                        compiled.spark, pipeline, order, {fid: seed}, streaming=False
                    )
                    for s in sink_ids:
                        write_sink(sinks2[s], pipeline.stages[s].config)
                    if policy == "route" and dlq_cfg_fanin is not None:
                        from etl_router_spark.sinks.dlq import to_dlq

                        late_rows = late.drop("__source_id")
                        write_sink(
                            to_dlq(late_rows, failed_stage=fid, pipeline=pipeline.name),
                            dlq_cfg_fanin,
                        )
                finally:
                    batch_df.unpersist()

            return write_epoch

        q = (
            tagged.writeStream.foreachBatch(
                make_fanin_writer(fid, order, sink_ids, tracker, ts_field, policy, dlq_cfg_fanin)
            )
            .option("checkpointLocation", f"{checkpoint_root}/fanin_{fid}")
            .trigger(**trig)
            .queryName(f"{pipeline.name}.fanin.{fid}")
            .start()
        )
        queries[f"fanin:{fid}"] = q
        handled.update(sink_ids)

    if shared_fanout:
        for fid, sink_ids in _fanout_groups(pipeline).items():
            order = _descendant_order(pipeline, fid)
            src_df = compiled.stage_frames[fid]

            def make_writer(fid: str, order: list[str], sink_ids: list[str]):
                marker_dir = f"{checkpoint_root}/markers_{fid}"

                def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
                    if exactly_once:
                        from etl_router_spark.streaming.exactly_once import (
                            epoch_committed,
                            mark_epoch,
                        )

                        if epoch_committed(marker_dir, epoch_id):
                            return
                    batch_df.persist()
                    try:
                        sinks, dlqs = compile_stages(
                            spark, pipeline, order, {fid: batch_df}, streaming=False
                        )
                        for sid in sink_ids:
                            write_sink(sinks[sid], pipeline.stages[sid].config)
                        dlq_cfg = dlq_sink or pipeline.dlq
                        if dlq_cfg:
                            from etl_router_spark.sinks.dlq import to_dlq

                            for sid, ddf in dlqs.items():
                                write_sink(
                                    to_dlq(ddf, failed_stage=sid, pipeline=pipeline.name),
                                    dlq_cfg,
                                )
                    finally:
                        batch_df.unpersist()
                    if exactly_once:
                        mark_epoch(marker_dir, epoch_id)

                return write_epoch

            q = (
                src_df.writeStream.foreachBatch(make_writer(fid, order, sink_ids))
                .option("checkpointLocation", f"{checkpoint_root}/fanout_{fid}")
                .trigger(**trig)
                .queryName(f"{pipeline.name}.fanout.{fid}")
                .start()
            )
            queries[f"fanout:{fid}"] = q
            handled.update(sink_ids)

    for sid, df in compiled.sink_frames.items():
        if sid in handled:
            continue
        cfg = pipeline.stages[sid].config
        mode = infer_output_mode(pipeline, sid)
        queries[sid] = _start_sink_query(
            df, cfg, mode, f"{checkpoint_root}/{sid}", trig,
            name=f"{pipeline.name}_{sid}".replace("-", "_"),
        )

    dlq_cfg = dlq_sink or pipeline.dlq
    if dlq_cfg:
        from etl_router_spark.sinks.dlq import to_dlq

        for sid, df in compiled.dlq_frames.items():
            if df.isStreaming:
                queries[f"dlq:{sid}"] = _start_sink_query(
                    to_dlq(df, failed_stage=sid, pipeline=pipeline.name),
                    dlq_cfg, "append", f"{checkpoint_root}/dlq_{sid}", trig,
                    name=f"{pipeline.name}_dlq_{sid}".replace("-", "_"),
                )

    return StreamingExecution(queries)
