"""Condition AST — the engine's routing/filter predicate language.

Semantics follow the reference's runtime matcher
(``crates/conveyor-etl-routing/src/matcher.rs:24-82``) and DSL AST
(``crates/conveyor-etl-dsl/src/types.rs:100-128``):

- ``record_type`` equality,
- ``metadata`` key existence / equality / regex / numeric comparisons
  (values parsed as float; unparsable or missing => False),
- ``and`` / ``or`` / ``not`` combinators, ``always`` / ``never``,
- plus a free-form ``expression`` condition (reserved in the reference's
  ``proto/router.proto:76-85``) which we define as Spark SQL syntax.

The reference evaluates two-valued logic: a comparison on a missing
metadata key is *false*, so ``Not(...)`` of it is *true*. Spark's
three-valued null logic would make that null; the compiler in
``etl_router_spark.compile.conditions`` inserts the coalesce fix.

Conditions are plain frozen dataclasses so manifests, tests and the
optimizer can hash/compare them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Condition:
    """One node of the condition tree.

    ``kind`` is one of: ``record_type, metadata_exists, metadata_equals,
    metadata_match, metadata_gt, metadata_lt, metadata_gte, metadata_lte,
    field_equals, field_gt, field_lt, field_gte, field_lte, field_in,
    field_null, and, or, not, always, never, expression``.

    The ``field_*`` kinds are our typed-column extension: the reference
    predicates only address the string-typed metadata map, but our engine
    promotes payloads to typed columns (SURVEY §1.5), so predicates over
    real columns are first-class.
    """

    kind: str
    key: str | None = None  # metadata key / column name
    value: Any = None  # comparison value / regex pattern / SQL string
    children: tuple["Condition", ...] = field(default=())

    # -- constructors ------------------------------------------------
    @staticmethod
    def record_type(value: str) -> "Condition":
        return Condition("record_type", value=value)

    @staticmethod
    def metadata_exists(key: str) -> "Condition":
        return Condition("metadata_exists", key=key)

    @staticmethod
    def metadata_equals(key: str, value: str) -> "Condition":
        return Condition("metadata_equals", key=key, value=value)

    @staticmethod
    def metadata_match(key: str, pattern: str) -> "Condition":
        return Condition("metadata_match", key=key, value=pattern)

    @staticmethod
    def metadata_gt(key: str, value: float) -> "Condition":
        return Condition("metadata_gt", key=key, value=value)

    @staticmethod
    def metadata_lt(key: str, value: float) -> "Condition":
        return Condition("metadata_lt", key=key, value=value)

    @staticmethod
    def metadata_gte(key: str, value: float) -> "Condition":
        return Condition("metadata_gte", key=key, value=value)

    @staticmethod
    def metadata_lte(key: str, value: float) -> "Condition":
        return Condition("metadata_lte", key=key, value=value)

    @staticmethod
    def field_equals(key: str, value: Any) -> "Condition":
        return Condition("field_equals", key=key, value=value)

    @staticmethod
    def field_in(key: str, values: list[Any]) -> "Condition":
        return Condition("field_in", key=key, value=tuple(values))

    @staticmethod
    def field_null(key: str) -> "Condition":
        return Condition("field_null", key=key)

    @staticmethod
    def expression(sql: str) -> "Condition":
        return Condition("expression", value=sql)

    @staticmethod
    def and_(*children: "Condition") -> "Condition":
        return Condition("and", children=tuple(children))

    @staticmethod
    def or_(*children: "Condition") -> "Condition":
        return Condition("or", children=tuple(children))

    @staticmethod
    def not_(child: "Condition") -> "Condition":
        return Condition("not", children=(child,))

    @staticmethod
    def always() -> "Condition":
        return Condition("always")

    @staticmethod
    def never() -> "Condition":
        return Condition("never")

    # -- YAML/dict codec ----------------------------------------------
    @staticmethod
    def from_dict(d: dict[str, Any]) -> "Condition":
        """Parse the manifest YAML condition shape.

        Mirrors the serde(tag="type") layout of the reference DSL, e.g.::

            {type: and, conditions: [{type: metadata_equals, key: k, value: v}, ...]}
            {type: not, condition: {...}}
            {type: record_type, value: user.event}
            {type: expression, expression: "value > 10"}
        """
        kind = d["type"].lower()
        if kind in ("and", "or"):
            kids = tuple(Condition.from_dict(c) for c in d.get("conditions", []))
            return Condition(kind, children=kids)
        if kind == "not":
            return Condition("not", children=(Condition.from_dict(d["condition"]),))
        if kind in ("always", "never"):
            return Condition(kind)
        if kind == "expression":
            return Condition("expression", value=d.get("expression") or d.get("value"))
        if kind == "record_type":
            return Condition("record_type", value=d["value"])
        if kind == "field_in":
            return Condition("field_in", key=d["key"], value=tuple(d["values"]))
        numeric = {
            "metadata_greater_than": "metadata_gt",
            "metadata_less_than": "metadata_lt",
            "metadata_greater_than_or_equal": "metadata_gte",
            "metadata_less_than_or_equal": "metadata_lte",
        }
        kind = numeric.get(kind, kind)
        if kind == "metadata_exists" or kind == "field_null":
            return Condition(kind, key=d["key"])
        if kind == "metadata_match":
            return Condition(kind, key=d["key"], value=d.get("pattern") or d.get("value"))
        return Condition(kind, key=d["key"], value=d.get("value"))

    def to_dict(self) -> dict[str, Any]:
        if self.kind in ("and", "or"):
            return {"type": self.kind, "conditions": [c.to_dict() for c in self.children]}
        if self.kind == "not":
            return {"type": "not", "condition": self.children[0].to_dict()}
        if self.kind in ("always", "never"):
            return {"type": self.kind}
        if self.kind == "expression":
            return {"type": "expression", "expression": self.value}
        if self.kind == "record_type":
            return {"type": "record_type", "value": self.value}
        if self.kind in ("metadata_exists", "field_null"):
            return {"type": self.kind, "key": self.key}
        if self.kind == "field_in":
            return {"type": self.kind, "key": self.key, "values": list(self.value)}
        return {"type": self.kind, "key": self.key, "value": self.value}
