"""Property suite for manifest edge derivation (model layer, no Spark).

The r11 parser fix changed edge semantics from "always chain
sequentially" to "honor depends_on when any stage declares it".
These properties pin the contract over arbitrary DAG shapes so a
future refactor cannot silently re-introduce the mis-wiring:

1. declared-style: parsed edges == exactly the declared (dep, stage)
   pairs — nothing added, nothing dropped, no implicit chaining.
2. undeclared-style: edges == the sequential chain, unchanged
   behavior for every pre-r11 manifest.
3. explicit spec.edges wins over depends_on outright.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_router_spark.model.parser import parse_manifest_dict


def _doc(stages, edges=None):
    spec = {"stages": stages}
    if edges is not None:
        spec["edges"] = edges
    return {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
            "metadata": {"name": "prop"}, "spec": spec}


def _stage(i, n, deps):
    if i == 0:
        return {"id": f"s{i}", "type": "source",
                "config": {"source_type": "memory"}}
    body = {"id": f"s{i}",
            "type": "sink" if i == n - 1 else "transform",
            "config": ({"sink_type": "file", "format": "parquet",
                        "path": "/tmp/x"}
                       if i == n - 1 else
                       {"transform_type": "filter",
                        "condition": {"type": "expression",
                                      "expression": "1=1"}})}
    if deps is not None:
        body["depends_on"] = deps
    return body


@st.composite
def declared_dags(draw):
    """n stages; every non-source stage declares 1..3 deps among
    earlier stages (acyclic by construction)."""
    n = draw(st.integers(min_value=2, max_value=8))
    stages, declared = [], set()
    for i in range(n):
        if i == 0:
            stages.append(_stage(0, n, None))
            continue
        deps = draw(st.lists(
            st.integers(min_value=0, max_value=i - 1),
            min_size=1, max_size=3, unique=True))
        stages.append(_stage(i, n, [f"s{d}" for d in deps]))
        declared |= {(f"s{d}", f"s{i}") for d in deps}
    return stages, declared


@given(declared_dags())
@settings(max_examples=200, deadline=None)
def test_declared_edges_are_exactly_the_parsed_edges(dag):
    stages, declared = dag
    p = parse_manifest_dict(_doc(stages))
    assert {(e.from_stage, e.to_stage) for e in p.edges} == declared


@given(st.integers(min_value=2, max_value=10))
@settings(max_examples=50, deadline=None)
def test_undeclared_manifests_keep_the_sequential_chain(n):
    stages = [_stage(i, n, None) for i in range(n)]
    p = parse_manifest_dict(_doc(stages))
    assert {(e.from_stage, e.to_stage) for e in p.edges} == {
        (f"s{i}", f"s{i + 1}") for i in range(n - 1)}


@given(declared_dags())
@settings(max_examples=50, deadline=None)
def test_explicit_edges_override_depends_on(dag):
    stages, _ = dag
    n = len(stages)
    explicit = [{"from": f"s{i}", "to": f"s{i + 1}"} for i in range(n - 1)]
    p = parse_manifest_dict(_doc(stages, edges=explicit))
    assert {(e.from_stage, e.to_stage) for e in p.edges} == {
        (f"s{i}", f"s{i + 1}") for i in range(n - 1)}


@given(declared_dags(), st.data())
@settings(max_examples=100, deadline=None)
def test_missing_depends_on_raises_at_parse_naming_the_stage(dag, data):
    """A depends_on-style manifest where a NON-SOURCE stage omits its
    declaration fails at parse time, naming the stage (r11 advisor —
    it used to silently become a DAG root and surface only as a
    confusing validation error, if at all)."""
    import pytest

    stages, _ = dag
    victims = [s for s in stages if s.get("depends_on")]
    if not victims:
        return
    victim = data.draw(st.sampled_from(victims))
    del victim["depends_on"]
    if not any(s.get("depends_on") for s in stages):
        return  # no longer depends_on-style: sequential chain applies
    with pytest.raises(ValueError, match=victim["id"]):
        parse_manifest_dict(_doc(stages))


@given(declared_dags())
@settings(max_examples=50, deadline=None)
def test_parse_is_deterministic(dag):
    stages, _ = dag
    a = parse_manifest_dict(_doc(stages))
    b = parse_manifest_dict(_doc(stages))
    assert [(e.from_stage, e.to_stage) for e in a.edges] == \
           [(e.from_stage, e.to_stage) for e in b.edges]
