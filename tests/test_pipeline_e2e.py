"""Manifest -> parse -> validate -> compile -> execute, end to end.

Models the reference's flagship example
(``examples/manifests/pipelines/user-analytics.yaml``): source ->
filter -> validate(route to DLQ) -> mask -> sink, plus fan-out and
conditional-edge routing shapes.
"""

from __future__ import annotations

import pytest

from etl_router_spark.compile.pipeline import compile_pipeline
from etl_router_spark.model.parser import parse_manifest, parse_duration
from etl_router_spark.model.validation import ValidationError, validate_pipeline

FLAGSHIP = """
apiVersion: etl.dev/v1
kind: Pipeline
metadata:
  name: user-analytics
spec:
  stages:
    - id: user-events
      type: source
      config:
        source_type: file
        path: "{sf_dir}/events.parquet"
        format: parquet
    - id: only-purchases
      type: transform
      config:
        transform_type: filter
        condition: {{type: field_in, key: event_type, values: [purchase, signup]}}
    - id: validated
      type: transform
      config:
        transform_type: validate
        on_invalid: route
        rules:
          - {{field: value, required: true, min: 0}}
          - {{field: user_id, required: true}}
    - id: masked
      type: transform
      config:
        transform_type: mask
        rules:
          - {{field: props, strategy: hash}}
    - id: archive
      type: sink
      config: {{sink_type: file, format: parquet, path: "{out}/archive"}}
"""


def test_flagship_pipeline(spark, sf_dir, tmp_path):
    manifest = FLAGSHIP.format(sf_dir=sf_dir, out=tmp_path)
    pipeline = parse_manifest(manifest)
    validate_pipeline(pipeline)
    compiled = compile_pipeline(spark, pipeline)
    assert set(compiled.sink_frames) == {"archive"}
    result = compiled.sink_frames["archive"]
    rows = result.count()
    assert rows > 0
    # all rows are purchases/signups, props hashed to 64-char sha256
    types = {r.event_type for r in result.select("event_type").distinct().collect()}
    assert types <= {"purchase", "signup"}
    assert len(result.first().props) == 64
    # DLQ side captured by the validate route stage
    assert "validated" in compiled.dlq_frames
    # run() writes the parquet sink
    compiled.run()
    assert spark.read.parquet(f"{tmp_path}/archive").count() == rows


def test_split_stage_first_match_with_default(spark, sf_dir, tmp_path):
    """T9 split as a DAG stage: named outputs, first-match exclusivity,
    default_output — rows partition exactly across the three sinks."""
    from etl_router_spark.model.parser import parse_manifest_dict

    doc = {
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "split-stage"},
        "spec": {
            "stages": [
                {"id": "src", "type": "source",
                 "config": {"source_type": "file", "format": "parquet",
                            "path": f"{sf_dir}/events.parquet"}},
                {"id": "route", "type": "transform",
                 "config": {
                     "transform_type": "split",
                     "first_match": True,
                     "outputs": [
                         {"name": "purchases",
                          "condition": {"type": "field_in", "key": "event_type",
                                        "values": ["purchase"]}},
                         {"name": "big",
                          "condition": {"type": "field_gt", "key": "value",
                                        "value": 100}},
                     ],
                     "default_output": "rest",
                 }},
                {"id": "purchases", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet",
                            "path": str(tmp_path / "purchases")}},
                {"id": "big", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet",
                            "path": str(tmp_path / "big")}},
                {"id": "rest", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet",
                            "path": str(tmp_path / "rest")}},
            ],
            "edges": [
                {"from": "src", "to": "route"},
                {"from": "route", "to": "purchases"},
                {"from": "route", "to": "big"},
                {"from": "route", "to": "rest"},
            ],
        },
    }
    pipeline = parse_manifest_dict(doc)
    compiled = compile_pipeline(spark, pipeline)
    n = {k: df.count() for k, df in compiled.sink_frames.items()}
    from etl_router_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    n_purch = ev.filter("event_type = 'purchase'").count()
    n_big = ev.filter("event_type <> 'purchase' AND coalesce(value > 100, false)").count()
    # first-match: exclusive partition, default catches the rest
    assert n["purchases"] == n_purch
    assert n["big"] == n_big
    assert n["purchases"] + n["big"] + n["rest"] == total


CONDITIONAL_EDGES = """
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {name: routed}
spec:
  stages:
    - id: src
      type: source
      config: {source_type: memory, rows: [[1, 'error', 9.0], [2, 'error', 2.0], [3, 'view', 5.0]], schema: 'id bigint, record_type string, sev double'}
    - id: all-sink
      type: sink
      config: {sink_type: noop}
    - id: errors-sink
      type: sink
      config: {sink_type: noop}
    - id: critical-sink
      type: sink
      config: {sink_type: noop}
  edges:
    - {from: src, to: all-sink}
    - from: src
      to: errors-sink
      condition: {type: record_type, value: error}
    - from: src
      to: critical-sink
      condition:
        type: and
        conditions:
          - {type: record_type, value: error}
          - {type: expression, expression: "sev > 5"}
"""


def test_conditional_edge_broadcast_routing(spark):
    # a record goes to EVERY matching edge (engine.rs:79-95; tests.rs:651-738)
    pipeline = parse_manifest(CONDITIONAL_EDGES)
    compiled = compile_pipeline(spark, pipeline)
    counts = {k: df.count() for k, df in compiled.sink_frames.items()}
    assert counts == {"all-sink": 3, "errors-sink": 2, "critical-sink": 1}


FAN_SHAPES = """
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {name: fan}
spec:
  stages:
    - id: a
      type: source
      config: {source_type: memory, rows: [[1, 'x']], schema: 'id bigint, v string'}
    - id: b
      type: source
      config: {source_type: memory, rows: [[2.5, 'y']], schema: 'amount double, v string'}
    - id: merge
      type: fan_in
      config:
        inputs:
          - mappings: [{target: id, source: id}, {target: v, source: v}]
          - mappings: [{target: id, expression: 'cast(amount as bigint)'}, {target: v, source: v}]
    - id: out
      type: sink
      config: {sink_type: noop}
  edges:
    - {from: a, to: merge}
    - {from: b, to: merge}
    - {from: merge, to: out}
"""


def test_fan_in_with_mappings(spark):
    pipeline = parse_manifest(FAN_SHAPES)
    compiled = compile_pipeline(spark, pipeline)
    out = compiled.sink_frames["out"]
    assert out.columns == ["id", "v"]
    assert {r.id for r in out.collect()} == {1, 2}


def test_validation_rejects_bad_shapes():
    bad = parse_manifest(
        """
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {name: broken}
spec:
  stages:
    - id: only-transform
      type: transform
      config: {transform_type: filter, condition: {type: always}}
"""
    )
    with pytest.raises(ValidationError, match="must start with a source"):
        validate_pipeline(bad)


def test_validation_detects_cycle():
    p = parse_manifest(
        """
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {name: cyclic}
spec:
  stages:
    - id: s
      type: source
      config: {source_type: memory, rows: [[1]], schema: 'id bigint'}
    - id: t1
      type: transform
      config: {transform_type: filter, condition: {type: always}}
    - id: t2
      type: transform
      config: {transform_type: filter, condition: {type: always}}
    - id: k
      type: sink
      config: {sink_type: noop}
  edges:
    - {from: s, to: t1}
    - {from: t1, to: t2}
    - {from: t2, to: t1}
    - {from: t2, to: k}
"""
    )
    with pytest.raises(ValidationError, match="cycle"):
        validate_pipeline(p)


def test_parse_duration_grammar():
    assert parse_duration("100ms") == 0.1
    assert parse_duration("30s") == 30
    assert parse_duration("5m") == 300
    assert parse_duration("2h") == 7200
    with pytest.raises(ValueError):
        parse_duration("5 fortnights")


def test_unsupported_api_version():
    with pytest.raises(ValueError, match="apiVersion"):
        parse_manifest("apiVersion: bogus/v9\nkind: Pipeline\nmetadata: {name: x}\nspec: {}")


def test_new_llm_transform_types_dispatch(spark, tmp_path):
    # round-4 transform types reach their operators through the manifest
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "alpha beta gamma shared body " + ("x" if i % 2 else "y"))
         for i in range(12)],
        "doc_id long, text string",
    ).write.parquet(src)

    def run(transform_cfg, out_name):
        out = str(tmp_path / out_name)
        doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
               "metadata": {"name": out_name},
               "spec": {"stages": [
                   {"id": "s", "type": "source",
                    "config": {"source_type": "file", "format": "parquet", "path": src}},
                   {"id": "t", "type": "transform", "config": transform_cfg},
                   {"id": "o", "type": "sink",
                    "config": {"sink_type": "file", "format": "parquet", "path": out}},
               ]}}
        compile_pipeline(spark, parse_manifest_dict(doc)).run()
        return spark.read.parquet(out)

    ng = run({"transform_type": "dedup_ngram", "threshold": 0.5, "pair_chunk": 4},
             "ngram_out")
    assert {"id_a", "id_b", "jaccard"} <= set(ng.columns) and ng.count() > 0

    cnts = run({"transform_type": "ngram_counts", "n": 2, "k": 5}, "cnt_out")
    assert cnts.count() == 5 and set(cnts.columns) == {"ngram", "cnt"}

    ent = run({"transform_type": "char_entropy"}, "ent_out")
    assert "char_entropy" in ent.columns and ent.count() == 12

    cl = run({"transform_type": "dedup_cluster", "method": "minhash",
              "num_hashes": 8, "bands": 4, "threshold": 0.3,
              "cc_algorithm": "star", "emit": "canonical"}, "cl_out")
    assert cl.count() >= 1


def test_round4_transform_types_dispatch(spark, tmp_path):
    # fifth-pass transform types: url_normalize, quality buckets/filter,
    # chunk_sentences, bm25 (query side as a source config), graph ops
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "docs4")
    spark.createDataFrame(
        [(i, f"s{i % 3}",
          "alpha beta gamma. delta epsilon zeta! " * (1 + i % 3),
          f"HTTP://WWW.Ex{i % 2}.com:80/p/?b=2&a=1#f")
         for i in range(12)],
        "doc_id long, source string, text string, url string",
    ).write.parquet(src)

    def run(transform_cfg, out_name):
        out = str(tmp_path / out_name)
        doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
               "metadata": {"name": out_name},
               "spec": {"stages": [
                   {"id": "s", "type": "source",
                    "config": {"source_type": "file", "format": "parquet", "path": src}},
                   {"id": "t", "type": "transform", "config": transform_cfg},
                   {"id": "o", "type": "sink",
                    "config": {"sink_type": "file", "format": "parquet", "path": out}},
               ]}}
        compile_pipeline(spark, parse_manifest_dict(doc)).run()
        return spark.read.parquet(out)

    u = run({"transform_type": "url_normalize"}, "url_out")
    assert u.select("url_norm").distinct().count() == 2  # 2 hosts collapse

    ch = run({"transform_type": "chunk_sentences", "max_chars": 30}, "chunk_out")
    assert {"chunk_id", "chunk_text", "n_sentences"} <= set(ch.columns)

    qb = run({"transform_type": "quality_buckets", "score_field": "doc_id",
              "group_field": "source"}, "qb_out")
    assert set(r["bucket"] for r in qb.collect()) == {"tail", "middle", "head"}

    qf = run({"transform_type": "quality_filter", "score_field": "doc_id",
              "group_field": "source", "quantile": 0.5}, "qf_out")
    assert 0 < qf.count() < 12

    bm = run({"transform_type": "bm25", "k": 3,
              "queries": {"source_type": "memory",
                          "rows": [(1, "alpha beta")],
                          "schema": "query_id long, query_text string"}},
             "bm_out")
    assert bm.count() == 3 and {"query_id", "rank", "doc_id", "score"} == set(bm.columns)

    g = run({"transform_type": "degree_stats", "src_field": "source",
             "dst_field": "url"}, "deg_out")
    assert {"id", "out_degree", "in_degree", "degree"} == set(g.columns)


def test_pipeline_limits_declarative_scale_guards(spark, tmp_path):
    """spec.limits — pipeline-level declarative capacity limits (the
    reference makes every capacity knob declarative config,
    settings.rs:24-29). A pipeline-level max_candidates reaches the
    pair-generation operators as a default, a per-stage value
    overrides it, and unknown/invalid limits fail validation."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.dedup import CandidateBudgetExceeded
    from etl_router_spark.model.parser import parse_manifest_dict
    from etl_router_spark.model.validation import ValidationError, validate_pipeline

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "shared alpha beta gamma delta epsilon") for i in range(10)],
        "doc_id long, text string",
    ).write.parquet(src)

    def doc(limits, transform_cfg, name):
        return {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": name},
                "spec": {"limits": limits, "stages": [
                    {"id": "s", "type": "source",
                     "config": {"source_type": "file", "format": "parquet",
                                "path": src}},
                    {"id": "t", "type": "transform", "config": transform_cfg},
                    {"id": "o", "type": "sink",
                     "config": {"sink_type": "file", "format": "parquet",
                                "path": str(tmp_path / name)}},
                ]}}

    ngram = {"transform_type": "dedup_ngram", "threshold": 0.1}
    # pipeline-level budget: every doc shares every shingle -> the
    # 4 * C(10,2) = 180-candidate estimate trips a limit of 100
    with pytest.raises(CandidateBudgetExceeded):
        compile_pipeline(
            spark, parse_manifest_dict(doc({"max_candidates": 100}, ngram, "a")))
    # per-stage override beats the pipeline default
    compiled = compile_pipeline(
        spark, parse_manifest_dict(
            doc({"max_candidates": 100},
                {**ngram, "max_candidates": 10_000}, "b")))
    compiled.run()
    assert spark.read.parquet(str(tmp_path / "b")).count() > 0
    # pipeline-level max_df as an absolute df-cap default: cap 2 on a
    # corpus where every shingle has df=10 -> no surviving postings
    compiled = compile_pipeline(
        spark, parse_manifest_dict(doc({"max_df": 2}, ngram, "c")))
    compiled.run()
    assert spark.read.parquet(str(tmp_path / "c")).count() == 0
    # unknown / non-positive limits fail validation, not silently no-op
    with pytest.raises(ValidationError, match="unknown limit"):
        validate_pipeline(parse_manifest_dict(
            doc({"max_candidate": 5}, ngram, "d")))
    with pytest.raises(ValidationError, match="positive integer"):
        validate_pipeline(parse_manifest_dict(
            doc({"max_candidates": 0}, ngram, "e")))
    with pytest.raises(ValidationError, match="positive integer"):
        validate_pipeline(parse_manifest_dict(
            doc({"salt_cap": "lots"}, ngram, "f")))


def test_dedup_cluster_inherits_limits(spark, tmp_path):
    """dedup_cluster forwards salt_cap/max_candidates into its pair
    generation (the example manifest sets salt_cap on this stage), and
    the pipeline-level limits reach it like any other guarded type."""
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.functions.dedup import CandidateBudgetExceeded
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "identical text every doc alpha beta") for i in range(12)],
        "doc_id long, text string",
    ).write.parquet(src)
    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "cl"},
           "spec": {"limits": {"max_candidates": 10}, "stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet",
                           "path": src}},
               {"id": "t", "type": "transform",
                "config": {"transform_type": "dedup_cluster",
                           "method": "minhash", "num_hashes": 8,
                           "bands": 4, "threshold": 0.5}},
               {"id": "o", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}},
           ]}}
    with pytest.raises(CandidateBudgetExceeded):
        compile_pipeline(spark, parse_manifest_dict(doc))
    doc["spec"]["limits"]["max_candidates"] = 10**6
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 12


def test_curation_transform_types_dispatch(spark, tmp_path):
    # round-9 second-pass transform types: domain_cap (exact +
    # threshold, incl. an external domain_counts source) and
    # filter_attribution (rules as SQL keep-predicates)
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "docs_cur")
    spark.createDataFrame(
        [(i, f"https://www.h{i % 2}.com:443/p/{i}", f"word {'x ' * (i % 5)}")
         for i in range(12)],
        "doc_id long, url string, text string",
    ).write.parquet(src)

    def run(transform_cfg, out_name):
        out = str(tmp_path / out_name)
        doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
               "metadata": {"name": out_name},
               "spec": {"stages": [
                   {"id": "s", "type": "source",
                    "config": {"source_type": "file", "format": "parquet", "path": src}},
                   {"id": "t", "type": "transform", "config": transform_cfg},
                   {"id": "o", "type": "sink",
                    "config": {"sink_type": "file", "format": "parquet", "path": out}},
               ]}}
        compile_pipeline(spark, parse_manifest_dict(doc)).run()
        return spark.read.parquet(out)

    capped = run({"transform_type": "domain_cap", "cap": 4}, "cap_out")
    assert capped.count() == 8  # 2 hosts x cap 4
    assert set(r["host"] for r in capped.select("host").distinct().collect()) \
        == {"h0.com", "h1.com"}

    thr = run({"transform_type": "domain_cap", "cap": 4,
               "method": "threshold",
               "domain_counts": {
                   "source_type": "memory",
                   "rows": [("h0.com", 6), ("h1.com", 6)],
                   "schema": "host string, __n long"}}, "thr_out")
    assert 0 < thr.count() < 12

    red = run({"transform_type": "redact_spans", "n": 2,
               "benchmark": {"source_type": "memory",
                             "rows": [(99, "word x word x")],
                             "schema": "doc_id long, text string"}},
              "redact_out")
    assert {"clean_text", "n_tokens_redacted", "n_spans"} <= set(red.columns)
    assert red.count() == 12

    # 'ngram' (the sibling decontaminate stages' key) must be honored —
    # a user writing it must not silently get the default size
    red2 = run({"transform_type": "redact_spans", "ngram": 2,
                "benchmark": {"source_type": "memory",
                              "rows": [(99, "word x word x")],
                              "schema": "doc_id long, text string"}},
               "redact_ngram_out")
    a = {r["doc_id"]: r["n_spans"] for r in red.collect()}
    b = {r["doc_id"]: r["n_spans"] for r in red2.collect()}
    assert a == b and any(v > 0 for v in a.values())

    stripped = run({"transform_type": "strip_repeated_lines"}, "strip_out")
    assert {"clean_text", "n_lines", "n_lines_removed"} <= set(stripped.columns)
    assert stripped.count() == 12

    attr = run({"transform_type": "filter_attribution",
                "rules": {"min_words": "size(split(trim(text), '\\\\s+')) >= 3",
                          "has_x": "text LIKE '%x%'"}}, "attr_out")
    rows = {r["rule"]: r for r in attr.collect()}
    assert set(rows) == {"min_words", "has_x", "__dropped__"}
    assert rows["__dropped__"]["n_rows"] == 12

    yc = run({"transform_type": "yield_curve", "score_field": "doc_id",
              "thresholds": [3, 9]}, "yield_out")
    got = {r["threshold"]: r["n_docs_kept"] for r in yc.collect()}
    assert got == {3.0: 9, 9.0: 3}


def test_depends_on_builds_the_declared_dag():
    """depends_on is honored (r11 fix — it used to be silently
    IGNORED: edges always chained sequentially in declaration order,
    mis-wiring every fan-out declared that way, e.g.
    dedup-at-scale.yaml's LSH branch ran over the semantic branch's
    survivors). Declared-style manifests wire from declarations,
    undeclared manifests keep the sequential chain, and an explicit
    spec.edges list still wins over both."""
    from etl_router_spark.model.parser import parse_manifest_dict
    from etl_router_spark.model.validation import (
        ValidationError, validate_pipeline)

    def doc(stages, edges=None):
        spec = {"stages": stages}
        if edges is not None:
            spec["edges"] = edges
        return {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": "dag"}, "spec": spec}

    src = {"id": "src", "type": "source",
           "config": {"source_type": "memory"}}
    tr = lambda i, dep: {"id": i, "type": "transform",
                         "depends_on": dep,
                         "config": {"transform_type": "filter",
                                    "condition": {"type": "expression",
                                                  "expression": "1=1"}}}
    sk = lambda i, dep: {"id": i, "type": "sink", "depends_on": dep,
                         "config": {"sink_type": "file",
                                    "format": "parquet", "path": "/tmp/x"}}

    # two-branch fan-out: both branches hang off the SOURCE
    p = parse_manifest_dict(doc([
        src, tr("a", ["src"]), sk("a_out", ["a"]),
        tr("b", ["src"]), sk("b_out", ["b"])]))
    edges = {(e.from_stage, e.to_stage) for e in p.edges}
    assert edges == {("src", "a"), ("a", "a_out"),
                     ("src", "b"), ("b", "b_out")}
    validate_pipeline(p)
    # string form allowed
    p2 = parse_manifest_dict(doc([src, tr("a", "src"), sk("o", "a")]))
    assert {(e.from_stage, e.to_stage) for e in p2.edges} == {
        ("src", "a"), ("a", "o")}
    # no depends_on anywhere -> the sequential chain, unchanged
    chain = [dict(src), {**tr("a", None)}, {**sk("o", None)}]
    for st in chain:
        st.pop("depends_on", None)
    p3 = parse_manifest_dict(doc(chain))
    assert {(e.from_stage, e.to_stage) for e in p3.edges} == {
        ("src", "a"), ("a", "o")}
    # explicit spec.edges wins over depends_on
    p4 = parse_manifest_dict(doc(
        [src, tr("a", ["src"]), sk("o", ["a"])],
        edges=[{"from": "src", "to": "a"}, {"from": "a", "to": "o"}]))
    assert len(p4.edges) == 2
    # a non-source stage that forgot its depends_on in a declared-style
    # manifest fails AT PARSE, naming the stage (r11 advisor — it used
    # to silently become a DAG root and only surface from
    # validate_pipeline as a confusing "source->sink path" error)
    bad = doc([src, tr("a", ["src"]), sk("o", ["a"]),
               {**tr("stranded", None)}])
    bad["spec"]["stages"][-1].pop("depends_on")
    with pytest.raises(ValueError, match="stranded"):
        parse_manifest_dict(bad)
