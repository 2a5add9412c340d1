"""Property test for the routing core: randomized DAGs with
conditional edges, compiled to DataFrames, against a direct Python
simulator of the reference routing engine
(``routing/src/engine.rs:55-104``): per record, evaluate every
outgoing edge's condition and send the record down EVERY matching edge
(broadcast routing, engine.rs:79-95) — records can reach several sinks
or none.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.test_condition_property import KEYS, RTYPES, VALUES, eval_ref, make_records


def _leaf(rng: random.Random):
    from etl_router_spark.model.conditions import Condition as C

    return rng.choice([
        lambda: C.record_type(rng.choice(RTYPES)),
        lambda: C.metadata_exists(rng.choice(KEYS)),
        lambda: C.metadata_equals(rng.choice(KEYS), rng.choice(VALUES)),
        lambda: C.metadata_gt(rng.choice(KEYS), rng.choice([0.0, 3.0])),
        lambda: C.always(),
    ])()


def _cond(rng: random.Random):
    from etl_router_spark.model.conditions import Condition as C

    r = rng.random()
    if r < 0.5:
        return _leaf(rng)
    if r < 0.75:
        return C.and_(_leaf(rng), _leaf(rng))
    return C.or_(_leaf(rng), C.not_(_leaf(rng)))


def test_conditional_edge_routing_matches_reference(spark, tmp_path):
    """20 random diamond DAGs: source -> (optional shared filter) ->
    3 sinks behind conditional edges. Per-sink record sets must equal
    the Python reference simulation exactly."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    rng = random.Random(4242)
    records = make_records(rng, n=80)
    df = spark.createDataFrame(
        records, "id long, record_type string, metadata map<string,string>"
    )

    for trial in range(20):
        shared = _cond(rng) if rng.random() < 0.5 else None
        edge_conds = [_cond(rng) for _ in range(3)]
        stages = [
            {"id": "src", "type": "source",
             "config": {"source_type": "memory", "rows": []}},
        ]
        edges = []
        upstream = "src"
        if shared is not None:
            stages.append({"id": "flt", "type": "transform",
                           "config": {"transform_type": "filter",
                                      "condition": shared.to_dict()}})
            edges.append({"from": "src", "to": "flt"})
            upstream = "flt"
        for i, _c in enumerate(edge_conds):
            stages.append({"id": f"sink{i}", "type": "sink",
                           "config": {"sink_type": "file", "format": "parquet",
                                      "path": str(tmp_path / f"t{trial}_s{i}")}})
            edges.append({"from": upstream, "to": f"sink{i}",
                          "condition": edge_conds[i].to_dict()})
        doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
               "metadata": {"name": f"route-{trial}"},
               "spec": {"stages": stages, "edges": edges}}
        compiled = compile_pipeline(spark, parse_manifest_dict(doc),
                                    source_overrides={"src": df})

        # reference simulation
        want: dict[str, set[int]] = {f"sink{i}": set() for i in range(3)}
        for rid, rtype, meta in records:
            if shared is not None and not eval_ref(shared, rtype, meta):
                continue
            for i, c in enumerate(edge_conds):
                if eval_ref(c, rtype, meta):
                    want[f"sink{i}"].add(rid)

        for i in range(3):
            got = {r.id for r in compiled.sink_frames[f"sink{i}"].select("id").collect()}
            assert got == want[f"sink{i}"], (
                trial, i, shared, edge_conds[i],
                sorted(got ^ want[f"sink{i}"])[:5],
            )
