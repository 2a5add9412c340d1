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
  through a shared stage. Tails replay as per-epoch batch plans, so a
  member whose tail contains a STATEFUL stage (aggregate/sessionize/
  dedupe/ratelimit) is ENFORCED out of fusion by
  ``run_streaming_group`` (r12 verdict/advice): it starts individually
  through ``run_streaming`` — genuine cross-epoch streaming state —
  with a warning naming the stage, and fusion proceeds for the
  remaining stateless-tail members.
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


# Transform types whose STREAMING compile keeps state across epochs
# (aggregate/sessionize watermark state, dedupe's dropDuplicates /
# running max_by, ratelimit's applyInPandasWithState counters). A
# fused tail replays as a per-epoch BATCH plan, which would silently
# reset that state every epoch — types.rs:634-641,690-697 emit modes
# are cross-epoch semantics, so these members must run individually.
_STATEFUL_TAIL_TYPES = frozenset(
    {"aggregate", "sessionize", "dedupe", "ratelimit"}
)


def _stateful_tail_stage(pipeline: Pipeline, chain: list[str],
                         prefix_len: int) -> str | None:
    """First stateful stage id in the member's post-prefix tail, or
    None — the ancestor-walk rule ``infer_output_mode`` applies per
    sink, specialized to a linear chain (every tail stage is an
    ancestor of the sink)."""
    from etl_router_spark.model.manifest import StageType

    for sid in chain[1 + prefix_len:]:
        stage = pipeline.stages[sid]
        if (stage.stage_type == StageType.TRANSFORM
                and stage.transform_type in _STATEFUL_TAIL_TYPES):
            return sid
    return None


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

    Members whose TAIL contains a stateful stage
    (``_STATEFUL_TAIL_TYPES``) are routed out of fusion and started
    individually — per-epoch tail replay would give them per-epoch
    state where ``run_streaming`` gives genuine cross-epoch streaming
    state (watermarked aggregates, dropDuplicates, ratelimit counters),
    a silent semantics change. The fusion win is kept for the
    remaining stateless-tail members when >= 2 remain. This also keeps
    the trigger contract intact: ``emit: periodic`` stages (the one
    case ``_derive_trigger`` maps to a processingTime trigger) are
    stateful, so every fused member uses the group trigger and every
    trigger-deriving member goes through ``run_streaming``'s
    ``trigger or _derive_trigger or DEFAULT_TRIGGER`` chain.

    Returns one ``StreamingExecution`` over all started queries; group
    queries are keyed ``group:<n>:<source_label>``, individual queries
    ``<pipeline_id>:<sink_or_role>``.
    """
    import warnings

    dag = optimize(pipelines)
    trig = trigger or dict(DEFAULT_TRIGGER)
    queries = {}

    def run_individually(p: Pipeline) -> None:
        compiled = compile_pipeline(
            spark, p, streaming=True, source_overrides=source_overrides)
        ex = run_streaming(
            compiled, f"{checkpoint_root}/{p.id}", trigger=trigger,
            dlq_sink=dlq_sink, exactly_once=exactly_once)
        queries.update({f"{p.id}:{k}": q for k, q in ex.queries.items()})

    for gi, g in enumerate(dag.groups):
        fuse = g.pipelines
        if len(g.pipelines) >= 2:
            fuse = []
            for p in g.pipelines:
                sid = _stateful_tail_stage(p, g.chains[p.id], g.prefix_len)
                if sid is None:
                    fuse.append(p)
                    continue
                warnings.warn(
                    f"run_streaming_group: pipeline {p.id!r} excluded "
                    f"from shared-prefix fusion — tail stage {sid!r} "
                    f"({p.stages[sid].transform_type}) is stateful and "
                    "per-epoch replay would reset its state each epoch; "
                    "running it individually with full streaming "
                    "semantics")
                run_individually(p)
        if len(fuse) < 2:
            for p in fuse:
                run_individually(p)
            continue
        if fuse is not g.pipelines:
            g = OptimizedGroup(
                source_key=g.source_key, source_label=g.source_label,
                pipelines=fuse,
                chains={p.id: g.chains[p.id] for p in fuse},
                prefix_len=g.prefix_len)
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
