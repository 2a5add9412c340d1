"""Cross-pipeline shared-prefix execution for STREAMING pipelines.

The reference's shared-prefix optimizer groups pipelines by source
regardless of mode (``dsl/src/optimizer.rs:57-107`` groups before the
runtime picks an engine); ``compile_group``'s batch mechanism — a
``persist`` of the shared frame — has no streaming analog, so streaming
groups here get the intra-pipeline fan-out treatment
(``engine.rs:324-352``) lifted ACROSS pipelines: ONE streaming query
reads the group's source, and each epoch's ``foreachBatch`` computes
the shared stateless prefix once on the batch, persists it for the
epoch, then replays every member pipeline's tail and writes its sinks.
The source is scanned once per epoch for N pipelines — the same
N-scans-to-one win the batch path measures (AB_MEASURES_r11.jsonl
``shared_scan``), applied to the streaming half.

Semantics and caveats, deliberately matching the fan-out writer in
``streaming.runner``:

- The prefix whitelist is stateless-only (``optimizer.rs:223-237``),
  so per-epoch replay is semantics-preserving: no state crosses epochs
  through a shared stage. Stateful tails (aggregate/sessionize) would
  need their own watermark state and are exactly what keeps a pipeline
  OUT of the shared prefix, never the tail replay — tails run as
  per-epoch batch plans, so a stateful tail stage sees one epoch at a
  time (the fan-out writer's long-standing contract; run pipelines
  needing cross-epoch state individually).
- Delivery is at-least-once per epoch (a retried epoch rewrites every
  member's sinks); ``exactly_once=True`` adds the CommitMarker skip
  (``proto/sink.proto:67-70``) shared with the fan-out path.
- A route-mode validate inside the shared prefix propagates its DLQ
  side to EVERY member, keyed by the member's own stage id — the same
  contract ``compile_group`` enforces in batch (r11 fix, commit
  3517453).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_router_spark.compile.optimizer import OptimizedGroup, optimize
from etl_router_spark.compile.pipeline import compile_pipeline, compile_stages
from etl_router_spark.model.manifest import Pipeline
from etl_router_spark.sinks.registry import write_sink
from etl_router_spark.streaming.runner import (
    DEFAULT_TRIGGER,
    StreamingExecution,
    run_streaming,
)


def _make_group_writer(
    spark: SparkSession,
    g: OptimizedGroup,
    dlq_sink: dict[str, Any] | None,
    exactly_once: bool,
    marker_dir: str,
):
    """The per-epoch replay: shared prefix once, then every tail."""
    rep = g.pipelines[0]
    rep_chain = g.chains[rep.id]
    src_id = rep_chain[0]
    prefix_ids = rep_chain[1: 1 + g.prefix_len]
    rep_prefix = g.prefix_stage_ids(rep.id)

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
            shared_outputs: dict[str, DataFrame] = {src_id: batch_df}
            _, shared_dlq = compile_stages(
                spark, rep, prefix_ids, shared_outputs, streaming=False)
            shared_df = shared_outputs[
                prefix_ids[-1] if prefix_ids else src_id]
            if prefix_ids:
                shared_df.persist()
            try:
                for p in g.pipelines:
                    chain = g.chains[p.id]
                    seed_id = chain[g.prefix_len]
                    outputs = {seed_id: shared_df}
                    tail_ids = chain[1 + g.prefix_len:]
                    sink_frames, dlq_frames = compile_stages(
                        spark, p, tail_ids, outputs, streaming=False)
                    if shared_dlq:
                        p_prefix = g.prefix_stage_ids(p.id)
                        mapped = {
                            p_prefix[rep_prefix.index(rid)]: frame
                            for rid, frame in shared_dlq.items()
                        }
                        dlq_frames = {**mapped, **dlq_frames}
                    for sid, df in sink_frames.items():
                        write_sink(df, p.stages[sid].config)
                    dlq_cfg = dlq_sink or p.dlq
                    if dlq_cfg:
                        from etl_router_spark.sinks.dlq import to_dlq

                        for sid, ddf in dlq_frames.items():
                            stage = p.stages[sid]
                            write_sink(
                                to_dlq(ddf, failed_stage=sid,
                                       failed_stage_type=stage.transform_type
                                       or "transform",
                                       pipeline=p.name),
                                dlq_cfg,
                            )
            finally:
                if prefix_ids:
                    shared_df.unpersist()
        finally:
            batch_df.unpersist()
        if exactly_once:
            mark_epoch(marker_dir, epoch_id)

    return write_epoch


def run_streaming_group(
    spark: SparkSession,
    pipelines: list[Pipeline],
    checkpoint_root: str,
    trigger: dict[str, Any] | None = None,
    source_overrides: dict[str, DataFrame] | None = None,
    dlq_sink: dict[str, Any] | None = None,
    exactly_once: bool = False,
) -> StreamingExecution:
    """Start every pipeline streaming, with shared-prefix groups fused
    into ONE query per group (one source scan + one prefix compute per
    epoch for all members). Ungroupable pipelines (singleton groups,
    non-linear DAGs) start individually through ``run_streaming`` —
    identical behavior to running them one by one.

    Returns one ``StreamingExecution`` over all started queries; group
    queries are keyed ``group:<n>:<source_label>``, individual queries
    ``<pipeline_id>:<sink_or_role>``.
    """
    dag = optimize(pipelines)
    trig = trigger or dict(DEFAULT_TRIGGER)
    queries = {}
    for gi, g in enumerate(dag.groups):
        if len(g.pipelines) < 2:
            for p in g.pipelines:
                compiled = compile_pipeline(
                    spark, p, streaming=True,
                    source_overrides=source_overrides)
                ex = run_streaming(
                    compiled, f"{checkpoint_root}/{p.id}", trigger=trigger,
                    dlq_sink=dlq_sink, exactly_once=exactly_once)
                queries.update(
                    {f"{p.id}:{k}": q for k, q in ex.queries.items()})
            continue
        rep = g.pipelines[0]
        src_id = g.chains[rep.id][0]
        src_outputs: dict[str, DataFrame] = {}
        compile_stages(spark, rep, [src_id], src_outputs, streaming=True,
                       source_overrides=source_overrides)
        writer = _make_group_writer(
            spark, g, dlq_sink, exactly_once,
            f"{checkpoint_root}/group_{gi}_markers")
        q = (
            src_outputs[src_id].writeStream
            .foreachBatch(writer)
            .option("checkpointLocation", f"{checkpoint_root}/group_{gi}")
            .trigger(**trig)
            .queryName(f"group.{g.source_label}")
            .start()
        )
        queries[f"group:{gi}:{g.source_label}"] = q
    return StreamingExecution(queries)
