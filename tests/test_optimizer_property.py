"""Property suite for the shared-prefix group compiler.

Both r11 wiring bugs (ignored depends_on, dropped group DLQ sides)
lived in the compile layer between the manifest and the frames, where
operator-level gates cannot see them. These properties pin the
optimizer's core CONTRACT over randomized group shapes: for every
pipeline, compiling through ``compile_group`` (one scan + persisted
shared prefix + tails) produces exactly the rows and DLQ sides that
compiling it alone does — sharing is an execution strategy, never a
semantics change (``dsl/src/optimizer.rs:57-237``).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_router_spark.compile.optimizer import compile_group, optimize
from etl_router_spark.compile.pipeline import compile_pipeline
from etl_router_spark.model.parser import parse_manifest_dict

SF_DIR = "/root/testdata/sf0.001"

# stateless stage configs eligible for prefix sharing; each entry is
# (id-suffix, config) — configs chosen to keep nullable/typed columns
# exercised (props json, value double, event_type string)
PREFIX_POOL = [
    ("fil", {"transform_type": "filter",
             "condition": {"type": "expression",
                           "expression": "value >= 50"}}),
    ("msk", {"transform_type": "mask",
             "rules": [{"field": "props", "strategy": "hash"}]}),
    ("ren", {"transform_type": "rename",
             "renames": {"event_type": "etype"}}),
    ("val", {"transform_type": "validate", "on_invalid": "route",
             "rules": [{"field": "value", "required": True,
                        "min": 0, "max": 120}]}),
]
# divergent tails (first divergent stage ends the shared prefix)
TAIL_POOL = [
    {"transform_type": "project", "fields": ["event_id", "user_id"]},
    {"transform_type": "project", "fields": ["event_id", "value"]},
    {"transform_type": "filter",
     "condition": {"type": "expression", "expression": "value >= 100"}},
    {"transform_type": "dedupe", "key_fields": ["user_id"],
     "keep": "first", "order_field": "ts",
     "tiebreak_fields": ["event_id"]},
]


def _pipe(name: str, prefix: list, tail_cfg: dict):
    stages = [{"id": "src", "type": "source",
               "config": {"source_type": "file", "format": "parquet",
                          "path": f"{SF_DIR}/events.parquet"}}]
    for suffix, cfg in prefix:
        stages.append({"id": f"p_{suffix}", "type": "transform",
                       "config": cfg})
    stages.append({"id": "tail", "type": "transform", "config": tail_cfg})
    stages.append({"id": "out", "type": "sink",
                   "config": {"sink_type": "file", "format": "parquet",
                              "path": f"/tmp/etl_out/prop_{name}"}})
    return parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": name},
        "spec": {"stages": stages}})


@st.composite
def group_shapes(draw):
    depth = draw(st.integers(min_value=0, max_value=3))
    prefix = draw(st.lists(st.sampled_from(PREFIX_POOL), min_size=depth,
                           max_size=depth, unique_by=lambda t: t[0]))
    n = draw(st.integers(min_value=2, max_value=3))
    tails = draw(st.lists(st.sampled_from(TAIL_POOL), min_size=n,
                          max_size=n))
    return prefix, tails


@pytest.mark.usefixtures("spark")
@given(group_shapes())
@settings(max_examples=8, deadline=None)
def test_group_compile_equals_independent_compile(spark, shape):
    prefix, tails = shape
    pipelines = [_pipe(f"gp{i}", prefix, t) for i, t in enumerate(tails)]
    dag = optimize(pipelines)
    # sanity: prefixes group (coinciding stateless tails may extend
    # the shared depth by one); dedupe never joins the prefix
    # (stateful, not whitelisted)
    grp = next(g for g in dag.groups if len(g.pipelines) >= 1)
    assert grp.prefix_len <= len(prefix) + 1
    for p in grp.pipelines[:1]:
        for sid in grp.prefix_stage_ids(p.id):
            assert p.stages[sid].transform_type != "dedupe"
    compiled = compile_group(spark, pipelines)
    try:
        for p in pipelines:
            solo = compile_pipeline(spark, p)
            got = sorted(
                tuple(r) for r in compiled[p.id]
                .sink_frames["out"].collect())
            want = sorted(
                tuple(r) for r in solo.sink_frames["out"].collect())
            assert got == want, p.id
            # DLQ contract: same side frames, same rows — whether the
            # route-validate sat inside the shared prefix or not
            assert set(compiled[p.id].dlq_frames) == set(solo.dlq_frames)
            for sid in solo.dlq_frames:
                assert (compiled[p.id].dlq_frames[sid].count()
                        == solo.dlq_frames[sid].count()), (p.id, sid)
    finally:
        for c in compiled.values():
            c.release_shared()
