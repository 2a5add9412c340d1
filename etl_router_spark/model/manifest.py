"""Pipeline / stage / edge data model.

Mirrors the reference's two manifest dialects at the semantic level:

- stage-list dialect ``etl.dev/v1`` (``conveyor-etl-dsl/src/types.rs:4-60``):
  a pipeline with an ordered ``stages:`` list, inline configs;
- named-resource dialect ``conveyor.etl/v1``
  (``conveyor-etl-dsl/src/manifest.rs:105-149``): Source/Transform/Sink
  resources registered by name, a Pipeline that references them.

Both parse into the same runtime ``Pipeline`` DAG (stages + conditional
edges), the analog of ``conveyor-etl-routing/src/dag.rs:17-26``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from etl_router_spark.model.conditions import Condition


class StageType(str, Enum):
    SOURCE = "source"
    TRANSFORM = "transform"
    LOOKUP = "lookup"
    FAN_IN = "fan_in"
    FAN_OUT = "fan_out"
    SINK = "sink"


# Scalar type system of the reference DSL (types.rs:454-467) -> Spark DDL.
FIELD_TYPES: dict[str, str] = {
    "string": "string",
    "int": "int",
    "int64": "bigint",
    "float": "float",
    "float64": "double",
    "bool": "boolean",
    "timestamp": "timestamp",
    "date": "date",
    "json": "string",  # json payloads stay strings unless a schema is declared
    "bytes": "binary",
}


@dataclass
class FieldMapping:
    """One field mapping (fan-in/fan-out/map transform).

    Runtime precedence in the reference (``routing/src/engine.rs:289-322``):
    literal > source_field > default; unmapped fields are dropped when the
    mapping set is authoritative.
    """

    target: str
    source: str | None = None
    expression: str | None = None  # Spark SQL expression
    literal: Any = None
    default: Any = None
    cast: str | None = None  # FIELD_TYPES key

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "FieldMapping":
        return FieldMapping(
            target=d.get("target") or d.get("target_field") or d["field"],
            source=d.get("source") or d.get("source_field"),
            expression=d.get("expression"),
            literal=d.get("literal"),
            default=d.get("default"),
            cast=d.get("cast"),
        )


@dataclass
class Stage:
    """A DAG node (dag.rs:28-38): id + type + config.

    ``config`` holds the transform/source/sink specific keys; transform
    configs carry ``transform_type`` (types.rs:389-408), source configs
    ``source_type`` (types.rs:143-162).
    """

    id: str
    stage_type: StageType
    config: dict[str, Any] = field(default_factory=dict)
    name: str | None = None
    parallelism: int = 1

    @property
    def transform_type(self) -> str | None:
        return self.config.get("transform_type") or self.config.get("type")

    @property
    def source_type(self) -> str | None:
        return self.config.get("source_type") or self.config.get("type")


@dataclass
class Edge:
    """Directed edge with an optional routing condition (dag.rs:165-170).

    Routing is broadcast, not first-match: a record flows down *every*
    edge whose condition matches (``routing/src/engine.rs:79-95``).
    """

    from_stage: str
    to_stage: str
    condition: Condition | None = None


@dataclass
class Pipeline:
    """The runtime DAG (dag.rs:17-26)."""

    id: str
    name: str
    stages: dict[str, Stage] = field(default_factory=dict)
    edges: list[Edge] = field(default_factory=list)
    description: str = ""
    enabled: bool = True
    metadata: dict[str, str] = field(default_factory=dict)
    # pipeline-level dead-letter sink config (named-resource dialect's
    # dlq reference, manifest.rs:105-149); failed/invalid side-outputs
    # are enriched with _dlq_* columns and written here
    dlq: dict[str, Any] | None = None
    # pipeline-level declarative capacity limits (the reference makes
    # every capacity knob declarative config, settings.rs:24-29 — here
    # the Spark-scale equivalents): defaults inherited by every stage
    # whose operator accepts the knob, overridable per stage. Keys:
    # max_candidates (pair-generation pre-flight budget — exceeded ⇒
    # CandidateBudgetExceeded before any quadratic shuffle), max_df
    # (absolute posting-list document-frequency cap), salt_cap
    # (hot-bucket salting threshold), max_postings (inverted-index
    # posting-list truncation)
    limits: dict[str, Any] = field(default_factory=dict)

    # -- graph helpers (dag.rs:234-375 equivalents) -------------------
    def outgoing(self, stage_id: str) -> list[Edge]:
        return [e for e in self.edges if e.from_stage == stage_id]

    def incoming(self, stage_id: str) -> list[Edge]:
        return [e for e in self.edges if e.to_stage == stage_id]

    def sources(self) -> list[Stage]:
        return [s for s in self.stages.values() if s.stage_type == StageType.SOURCE]

    def sinks(self) -> list[Stage]:
        return [s for s in self.stages.values() if s.stage_type == StageType.SINK]

    def detect_cycle(self) -> list[str] | None:
        """DFS cycle detection (dag.rs:310-375). Returns a cycle path or None."""
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {sid: WHITE for sid in self.stages}
        path: list[str] = []

        def dfs(sid: str) -> list[str] | None:
            color[sid] = GRAY
            path.append(sid)
            for e in self.outgoing(sid):
                nxt = e.to_stage
                if color.get(nxt) == GRAY:
                    return path[path.index(nxt):] + [nxt]
                if color.get(nxt) == WHITE:
                    cyc = dfs(nxt)
                    if cyc:
                        return cyc
            color[sid] = BLACK
            path.pop()
            return None

        for sid in self.stages:
            if color[sid] == WHITE:
                cyc = dfs(sid)
                if cyc:
                    return cyc
        return None

    def unreachable_stages(self) -> set[str]:
        """Stages not on any source→sink path (dag.rs:264-301)."""
        fwd: set[str] = set()
        frontier = [s.id for s in self.sources()]
        while frontier:
            sid = frontier.pop()
            if sid in fwd:
                continue
            fwd.add(sid)
            frontier.extend(e.to_stage for e in self.outgoing(sid))
        bwd: set[str] = set()
        frontier = [s.id for s in self.sinks()]
        while frontier:
            sid = frontier.pop()
            if sid in bwd:
                continue
            bwd.add(sid)
            frontier.extend(e.from_stage for e in self.incoming(sid))
        return set(self.stages) - (fwd & bwd)

    def topological_order(self) -> list[str]:
        indeg = {sid: 0 for sid in self.stages}
        for e in self.edges:
            indeg[e.to_stage] += 1
        frontier = sorted(sid for sid, d in indeg.items() if d == 0)
        out: list[str] = []
        while frontier:
            sid = frontier.pop(0)
            out.append(sid)
            for e in self.outgoing(sid):
                indeg[e.to_stage] -= 1
                if indeg[e.to_stage] == 0:
                    frontier.append(e.to_stage)
        if len(out) != len(self.stages):
            raise ValueError("pipeline DAG has a cycle")
        return out
