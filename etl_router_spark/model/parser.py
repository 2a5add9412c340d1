"""YAML manifest -> Pipeline parser.

Accepts both reference dialects (``dsl/src/parser.rs:7-29`` gates on
apiVersion/kind; ``dsl/src/convert.rs:16-106`` turns the DSL into the
runtime DAG — we parse straight to the DAG since there is no gRPC hop).

Stage-list dialect::

    apiVersion: etl.dev/v1
    kind: Pipeline
    metadata: {name: user-analytics}
    spec:
      stages:
        - id: events
          type: source
          config: {source_type: file, path: ..., format: parquet}
        - id: only-active
          type: transform
          config:
            transform_type: filter
            condition: {type: metadata_equals, key: status, value: active}
        - id: archive
          type: sink
          config: {sink_type: file, path: ..., format: parquet}
      edges:                       # optional; default = linear chain
        - {from: events, to: only-active}
        - from: only-active
          to: archive
          condition: {type: record_type, value: user.event}

Durations accept the reference grammar ``100ms|30s|5m|2h``
(``convert.rs:212-239``).
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

from etl_router_spark.model.conditions import Condition
from etl_router_spark.model.manifest import Edge, Pipeline, Stage, StageType

SUPPORTED_API_VERSIONS = {"etl.dev/v1", "conveyor.etl/v1"}

_DURATION_RE = re.compile(r"^(\d+)(ms|s|m|h|d)$")
_UNIT_SECONDS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def parse_duration(s: str | int | float) -> float:
    """Duration string -> seconds (convert.rs:212-239 grammar)."""
    if isinstance(s, (int, float)):
        return float(s)
    m = _DURATION_RE.match(s.strip())
    if not m:
        raise ValueError(f"invalid duration: {s!r} (expected e.g. 100ms/30s/5m/2h)")
    return int(m.group(1)) * _UNIT_SECONDS[m.group(2)]


_INTERVAL_RE = re.compile(
    r"^\d+\s+(millisecond|second|minute|hour|day|week)s?$", re.IGNORECASE
)


def duration_to_interval(s: str | int | float) -> str:
    """Duration -> Spark interval string ('30 seconds') for window/watermark.

    Accepts both the reference grammar (``30s``/``5m``/``2h``,
    convert.rs:212-239) and already-valid Spark interval strings.
    """
    if isinstance(s, str) and _INTERVAL_RE.match(s.strip()):
        return s.strip()
    secs = parse_duration(s)
    if secs < 1:
        return f"{int(secs * 1000)} milliseconds"
    if secs % 3600 == 0:
        return f"{int(secs // 3600)} hours"
    if secs % 60 == 0:
        return f"{int(secs // 60)} minutes"
    return f"{int(secs)} seconds"


_ENV_PATTERN = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}")


def interpolate_env(value: Any) -> Any:
    """Resolve ``${VAR}`` / ``${VAR:-default}`` in string config values
    (recursively through dicts/lists) — how credentials reach JDBC/
    Kafka/SASL configs without living in the manifest file. A reference
    to an unset variable without a default raises, so a missing secret
    fails at parse time, not as a cryptic auth error mid-run.
    ``$${`` escapes a literal ``${``.
    """
    if isinstance(value, str):
        def sub(m: re.Match) -> str:
            var, default = m.group(1), m.group(2)
            val = os.environ.get(var, default)
            if val is None:
                raise ValueError(
                    f"manifest references unset environment variable ${{{var}}}"
                )
            return val

        return _ENV_PATTERN.sub(sub, value.replace("$${", "\x00")).replace("\x00", "${")
    if isinstance(value, dict):
        return {k: interpolate_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate_env(v) for v in value]
    return value


def parse_manifest(text: str) -> Pipeline:
    """Parse one YAML document into a runtime Pipeline DAG."""
    doc = yaml.safe_load(text)
    return parse_manifest_dict(doc)


def parse_manifest_dict(doc: dict[str, Any]) -> Pipeline:
    api = doc.get("apiVersion")
    if api not in SUPPORTED_API_VERSIONS:
        raise ValueError(f"unsupported apiVersion: {api!r}")
    kind = doc.get("kind")
    if kind != "Pipeline":
        raise ValueError(f"unsupported kind: {kind!r} (expected Pipeline)")

    meta = doc.get("metadata") or {}
    spec = interpolate_env(doc.get("spec") or {})
    name = meta.get("name") or ""
    pipeline = Pipeline(
        id=meta.get("id") or name,
        name=name,
        description=meta.get("description", ""),
        enabled=spec.get("enabled", True),
        metadata={k: str(v) for k, v in (meta.get("labels") or {}).items()},
        dlq=spec.get("dlq"),
        limits=dict(spec.get("limits") or {}),
    )

    raw_stages = spec.get("stages") or []
    prev_id: str | None = None
    explicit_edges = spec.get("edges")
    # Edge derivation, in priority order: an explicit spec.edges list
    # wins outright; otherwise, a manifest that declares `depends_on`
    # on ANY stage is depends_on-style — each stage's edges come from
    # its own declaration and stages without one (sources) are roots;
    # otherwise stages chain sequentially. depends_on used to be
    # silently IGNORED (edges always chained), which mis-wired every
    # fan-out declared that way — dedup-at-scale.yaml's LSH branch ran
    # over the semantic branch's survivors instead of the corpus.
    uses_depends = explicit_edges is None and any(
        raw.get("depends_on") for raw in raw_stages)
    for raw in raw_stages:
        stage = _parse_stage(raw)
        if stage.id in pipeline.stages:
            raise ValueError(f"duplicate stage id: {stage.id!r}")
        pipeline.stages[stage.id] = stage
        if explicit_edges is None:
            deps = raw.get("depends_on")
            if deps:
                if isinstance(deps, str):
                    deps = [deps]
                for d in deps:
                    pipeline.edges.append(Edge(d, stage.id))
            elif uses_depends and stage.stage_type != StageType.SOURCE:
                # a depends_on-style manifest with a non-source stage
                # that forgot its declaration would silently become a
                # DAG root and only surface later as a confusing
                # "not on a source->sink path" validation error (or
                # worse, validate); name the stage at parse time
                raise ValueError(
                    f"stage {stage.id!r} has no depends_on, but this "
                    "manifest declares edges via depends_on (only "
                    "source stages may omit it — add depends_on to "
                    f"{stage.id!r} or declare spec.edges explicitly)")
            elif not uses_depends and prev_id is not None:
                pipeline.edges.append(Edge(prev_id, stage.id))
        prev_id = stage.id

    for raw in explicit_edges or []:
        cond = raw.get("condition")
        pipeline.edges.append(
            Edge(
                from_stage=raw.get("from") or raw["from_stage"],
                to_stage=raw.get("to") or raw["to_stage"],
                condition=Condition.from_dict(cond) if cond else None,
            )
        )
    return pipeline


def _parse_stage(raw: dict[str, Any]) -> Stage:
    stype = StageType((raw.get("type") or raw.get("stage_type")).lower())
    config = dict(raw.get("config") or {})
    # allow inline transform_type/source_type at the stage level
    for key in ("transform_type", "source_type", "sink_type"):
        if key in raw and key not in config:
            config[key] = raw[key]
    if "condition" in config and isinstance(config["condition"], dict):
        config["condition"] = Condition.from_dict(config["condition"])
    return Stage(
        id=raw["id"],
        stage_type=stype,
        config=config,
        name=raw.get("name"),
        parallelism=int(raw.get("parallelism", 1)),
    )


def parse_manifests(text: str) -> list[Pipeline]:
    """Parse a multi-document YAML stream of Pipeline manifests."""
    return [parse_manifest_dict(doc) for doc in yaml.safe_load_all(text) if doc]
