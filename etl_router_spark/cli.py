"""CLI: apply / get / describe / delete / validate / graph / run / backup.

Mirrors ``conveyor-etl-cli`` (``cli/src/commands/*.rs``) over a local
file registry instead of a gRPC control plane: ``apply`` stores the
manifest, ``run`` compiles it to Spark and executes (batch or
streaming), ``graph`` renders the shared-prefix-optimized DAG,
``backup`` snapshots checkpoint state (``backup.rs`` +
``proto/backup.proto`` semantics — Spark's checkpointLocation IS the
offset/watermark/state store, so backup = copy the directory tree).

Usage: ``python -m etl_router_spark.cli <command> [args]``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

from etl_router_spark.model.parser import parse_manifest, parse_manifests
from etl_router_spark.model.validation import ValidationError, validate_pipeline

DEFAULT_REGISTRY = os.environ.get("ETL_ROUTER_SPARK_REGISTRY", ".etl_registry")


def _registry(args) -> Path:
    p = Path(args.registry)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _load_registry(reg: Path):
    out = []
    for f in sorted(reg.glob("*.yaml")):
        out.extend(parse_manifests(f.read_text()))
    return out


def cmd_apply(args) -> int:
    text = Path(args.file).read_text()
    pipelines = parse_manifests(text)
    for p in pipelines:
        validate_pipeline(p)
    reg = _registry(args)
    for p, doc in zip(pipelines, text.split("\n---")):
        (reg / f"{p.id}.yaml").write_text(doc.strip() + "\n")
        print(f"pipeline/{p.id} applied")
    return 0


def cmd_get(args) -> int:
    for p in _load_registry(_registry(args)):
        status = "enabled" if p.enabled else "disabled"
        print(f"{p.id}\t{len(p.stages)} stages\t{len(p.edges)} edges\t{status}")
    return 0


def cmd_describe(args) -> int:
    for p in _load_registry(_registry(args)):
        if p.id != args.name:
            continue
        print(f"Pipeline: {p.id}  ({'enabled' if p.enabled else 'disabled'})")
        if p.description:
            print(f"  {p.description}")
        print("Stages:")
        for s in p.stages.values():
            extra = s.transform_type or s.source_type or s.config.get("sink_type") or ""
            print(f"  {s.id:<24} {s.stage_type.value:<10} {extra}")
        print("Edges:")
        for e in p.edges:
            cond = f"  [when {e.condition.to_dict()}]" if e.condition else ""
            print(f"  {e.from_stage} -> {e.to_stage}{cond}")
        if p.dlq:
            print(f"DLQ: {p.dlq}")
        return 0
    print(f"pipeline {args.name!r} not found", file=sys.stderr)
    return 1


def cmd_delete(args) -> int:
    f = _registry(args) / f"{args.name}.yaml"
    if not f.exists():
        print(f"pipeline {args.name!r} not found", file=sys.stderr)
        return 1
    f.unlink()
    print(f"pipeline/{args.name} deleted")
    return 0


def cmd_validate(args) -> int:
    text = Path(args.file).read_text()
    rc = 0
    for p in parse_manifests(text):
        try:
            validate_pipeline(p)
            print(f"{p.id}: OK")
        except ValidationError as e:
            print(f"{p.id}: INVALID — {e}")
            rc = 1
    return rc


def cmd_graph(args) -> int:
    from etl_router_spark.compile.optimizer import render_ascii, render_dot

    if args.file:
        pipelines = parse_manifests(Path(args.file).read_text())
    else:
        pipelines = _load_registry(_registry(args))
    print(render_dot(pipelines) if args.format == "dot" else render_ascii(pipelines))
    return 0


def cmd_run(args) -> int:
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.session import get_spark

    pipeline = parse_manifest(Path(args.file).read_text())
    spark = get_spark(f"etl_router_spark.{pipeline.id}")
    compiled = compile_pipeline(spark, pipeline, streaming=args.streaming)
    if args.streaming:
        from etl_router_spark.streaming import run_streaming

        execu = run_streaming(compiled, args.checkpoint or f"/tmp/etl_ckpt/{pipeline.id}")
        if args.once:
            execu.await_termination()
        else:  # run until interrupted
            spark.streams.awaitAnyTermination()
    else:
        compiled.run()
    print(f"pipeline/{pipeline.id} finished")
    return 0


def cmd_backup(args) -> int:
    src = Path(args.checkpoint)
    if not src.exists():
        print(f"checkpoint dir {src} not found", file=sys.stderr)
        return 1
    dest = Path(args.output or f"{src}.backup.{int(time.time())}")
    shutil.copytree(src, dest, dirs_exist_ok=True)
    print(f"checkpoint snapshot: {dest}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="etl-router-spark")
    ap.add_argument("--registry", default=DEFAULT_REGISTRY,
                    help="local manifest registry dir")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("apply", help="validate + store manifest(s)")
    p.add_argument("-f", "--file", required=True)
    p.set_defaults(fn=cmd_apply)

    p = sub.add_parser("get", help="list registered pipelines")
    p.set_defaults(fn=cmd_get)

    p = sub.add_parser("describe", help="show stages/edges of a pipeline")
    p.add_argument("name")
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser("delete", help="remove a pipeline")
    p.add_argument("name")
    p.set_defaults(fn=cmd_delete)

    p = sub.add_parser("validate", help="parse + validate manifest(s)")
    p.add_argument("-f", "--file", required=True)
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("graph", help="render the optimized DAG")
    p.add_argument("-f", "--file")
    p.add_argument("--format", choices=("ascii", "dot"), default="ascii")
    p.set_defaults(fn=cmd_graph)

    p = sub.add_parser("run", help="compile + execute a manifest")
    p.add_argument("-f", "--file", required=True)
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--once", action="store_true",
                   help="streaming: availableNow then exit")
    p.add_argument("--checkpoint")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("backup", help="snapshot a checkpoint dir")
    p.add_argument("checkpoint")
    p.add_argument("-o", "--output")
    p.set_defaults(fn=cmd_backup)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
