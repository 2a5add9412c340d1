"""Named-resource manifest dialect + registry
(``conveyor-etl-dsl/src/manifest.rs:105-149``, ``registry.rs:114-151``).

Source/Transform/Sink resources are registered by (namespace, name);
a Pipeline references them: ``spec.source`` / ``spec.steps[]`` /
``spec.sink`` / ``spec.dlq.sink``. ``resolve`` inlines the referenced
configs into the runtime ``Pipeline`` DAG, so both dialects compile
through the same back-end.

Config fidelity: the reference serializes configs camelCase
(``consumerGroup``); our operator configs are snake_case — keys are
normalized on resolve. The reference's ``spec.grpc`` endpoint (the
external executor service) has no Spark equivalent: the engine IS the
executor; the field is retained in the resource for API fidelity but
unused.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from etl_router_spark.model.manifest import Edge, Pipeline, Stage, StageType

NAMED_API_VERSIONS = {"conveyor.etl/v1", "conveyor.router/v1"}
RESOURCE_KINDS = {"Source", "Transform", "Sink", "Pipeline"}

_CAMEL = re.compile(r"(?<=[a-z0-9])([A-Z])")


def _snake(key: str) -> str:
    return _CAMEL.sub(lambda m: "_" + m.group(1), key).lower()


def normalize_config(cfg: Any) -> Any:
    """camelCase keys -> snake_case, recursively."""
    if isinstance(cfg, dict):
        return {_snake(k): normalize_config(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [normalize_config(v) for v in cfg]
    return cfg


@dataclass
class Resource:
    kind: str
    name: str
    namespace: str = "default"
    config: dict[str, Any] = field(default_factory=dict)
    labels: dict[str, str] = field(default_factory=dict)
    grpc: dict[str, Any] | None = None  # retained for API fidelity
    spec: dict[str, Any] = field(default_factory=dict)


class RegistryError(ValueError):
    """Unresolvable resource reference (registry.rs:114-151)."""


class Registry:
    """In-memory resource store keyed by (kind, namespace, name)."""

    def __init__(self) -> None:
        self._store: dict[tuple[str, str, str], Resource] = {}

    def apply(self, res: Resource) -> None:
        self._store[(res.kind, res.namespace, res.name)] = res

    def get(self, kind: str, name: str, namespace: str = "default") -> Resource:
        try:
            return self._store[(kind, namespace, name)]
        except KeyError:
            raise RegistryError(
                f"{kind} {name!r} not found in namespace {namespace!r}"
            ) from None

    def delete(self, kind: str, name: str, namespace: str = "default") -> None:
        self._store.pop((kind, namespace, name), None)

    def list(self, kind: str | None = None, namespace: str | None = None) -> list[Resource]:
        return [
            r for r in self._store.values()
            if (kind is None or r.kind == kind)
            and (namespace is None or r.namespace == namespace)
        ]


def parse_resource(doc: dict[str, Any]) -> Resource:
    """One named-resource YAML document -> Resource."""
    api = doc.get("apiVersion")
    if api not in NAMED_API_VERSIONS:
        raise ValueError(f"unsupported apiVersion for named resources: {api!r}")
    kind = doc.get("kind")
    if kind not in RESOURCE_KINDS:
        raise ValueError(f"unsupported kind: {kind!r}")
    meta = doc.get("metadata") or {}
    spec = doc.get("spec") or {}
    return Resource(
        kind=kind,
        name=meta.get("name") or "",
        namespace=meta.get("namespace", "default"),
        config=normalize_config(spec.get("config") or {}),
        labels={k: str(v) for k, v in (meta.get("labels") or {}).items()},
        grpc=spec.get("grpc"),
        spec=normalize_config({k: v for k, v in spec.items() if k not in ("config", "grpc")}),
    )


# source configs rarely carry an explicit type in the reference (the
# gRPC service knows); infer from shape when absent
_SOURCE_TYPE_HINTS: list[tuple[str, str]] = [
    ("brokers", "kafka"),
    ("topic", "kafka"),
    ("bucket", "s3"),
    ("path", "file"),
    ("queue_url", "sqs"),
    ("stream", "kinesis"),
    ("url", "jdbc"),
    ("collection", "mongodb"),
]


def _infer_source_type(cfg: dict[str, Any]) -> str | None:
    for key, stype in _SOURCE_TYPE_HINTS:
        if key in cfg:
            return stype
    return None


def resolve(registry: Registry, pipeline_res: Resource) -> Pipeline:
    """Pipeline resource -> runtime DAG with resolved inline configs.

    Cross-resource validation: every referenced name must exist in the
    same namespace (namespace isolation, ``registry.rs`` tests).
    """
    ns = pipeline_res.namespace
    spec = pipeline_res.spec
    src_name = spec.get("source")
    sink_name = spec.get("sink")
    if not src_name or not sink_name:
        raise RegistryError("pipeline spec requires source and sink references")

    p = Pipeline(
        id=pipeline_res.name, name=pipeline_res.name,
        enabled=bool(spec.get("enabled", True)), metadata=dict(pipeline_res.labels),
        limits=dict(spec.get("limits") or {}),
    )

    src = registry.get("Source", src_name, ns)
    src_cfg = dict(src.config)
    if "source_type" not in src_cfg and "type" not in src_cfg:
        inferred = _infer_source_type(src_cfg)
        if inferred:
            src_cfg["source_type"] = inferred
    p.stages[src_name] = Stage(id=src_name, stage_type=StageType.SOURCE, config=src_cfg)
    prev = src_name

    for step_name in spec.get("steps") or []:
        t = registry.get("Transform", step_name, ns)
        t_cfg = dict(t.config)
        if "transform_type" not in t_cfg and "type" in t_cfg:
            t_cfg["transform_type"] = t_cfg.pop("type")
        from etl_router_spark.model.conditions import Condition

        if isinstance(t_cfg.get("condition"), dict):
            t_cfg["condition"] = Condition.from_dict(_named_condition(t_cfg["condition"]))
        p.stages[step_name] = Stage(id=step_name, stage_type=StageType.TRANSFORM, config=t_cfg)
        p.edges.append(Edge(prev, step_name))
        prev = step_name

    sink = registry.get("Sink", sink_name, ns)
    sink_cfg = dict(sink.config)
    if "sink_type" not in sink_cfg:
        if "bucket" in sink_cfg:
            sink_cfg["sink_type"] = "s3"
        elif "path" in sink_cfg:
            sink_cfg["sink_type"] = "file"
    p.stages[sink_name] = Stage(id=sink_name, stage_type=StageType.SINK, config=sink_cfg)
    p.edges.append(Edge(prev, sink_name))

    dlq_spec = spec.get("dlq")
    if dlq_spec:
        dlq_sink = registry.get("Sink", dlq_spec["sink"], ns)
        p.dlq = dict(dlq_sink.config)
        if "sink_type" not in p.dlq and "path" in p.dlq:
            p.dlq["sink_type"] = "file"
        # retry policy knobs (manifest.rs DlqConfig defaults 3/100ms/30s)
        p.dlq["max_retries"] = int(dlq_spec.get("max_retries", 3))
        p.dlq["retry_backoff_ms"] = int(dlq_spec.get("retry_backoff_ms", 100))
        p.dlq["max_retry_backoff_ms"] = int(dlq_spec.get("max_retry_backoff_ms", 30_000))
    return p


def _named_condition(d: dict[str, Any]) -> dict[str, Any]:
    """The named dialect nests conditions as ``{metadataEquals: {...}}``
    (one-key maps, serde externally-tagged) — convert to the
    ``{type: ...}`` shape our Condition codec reads."""
    if "type" in d:
        return d
    if len(d) == 1:
        (tag, body), = d.items()
        tag_snake = _snake(tag)
        if tag_snake in ("and", "or"):
            return {"type": tag_snake,
                    "conditions": [_named_condition(c) for c in body]}
        if tag_snake == "not":
            return {"type": "not", "condition": _named_condition(body)}
        if isinstance(body, dict):
            return {"type": tag_snake, **normalize_config(body)}
        return {"type": tag_snake, "value": body}
    return d


def load_documents(docs: list[dict[str, Any]], registry: Registry) -> list[Resource]:
    """Apply a stream of named-resource documents; returns pipelines last
    so single-file apply order doesn't matter."""
    resources = [parse_resource(d) for d in docs if d]
    for r in resources:
        registry.apply(r)
    return resources
