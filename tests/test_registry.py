"""Named-resource dialect (``conveyor.etl/v1`` / ``conveyor.router/v1``):
parse, register, cross-resource resolve, namespace isolation
(mirrors ``dsl/src/registry.rs:177-362`` + ``manifest.rs:180-336``)."""

from __future__ import annotations

import pytest
import yaml

from etl_router_spark.compile.pipeline import compile_pipeline
from etl_router_spark.model.registry import (
    Registry,
    RegistryError,
    load_documents,
    parse_resource,
    resolve,
)

DOCS = """
apiVersion: conveyor.router/v1
kind: Source
metadata: {name: file-events, namespace: default}
spec:
  grpc: {endpoint: src-svc:50051}
  config:
    path: "{sf_dir}/events.parquet"
    format: parquet
---
apiVersion: conveyor.router/v1
kind: Transform
metadata: {name: filter-active, namespace: default}
spec:
  grpc: {endpoint: filter-svc:50051}
  config:
    type: filter
    condition:
      fieldIn: {key: event_type, values: [purchase, signup]}
---
apiVersion: conveyor.router/v1
kind: Sink
metadata: {name: archive, namespace: default}
spec:
  grpc: {endpoint: sink-svc:50051}
  config: {path: "{out}/archive", format: parquet}
---
apiVersion: conveyor.router/v1
kind: Sink
metadata: {name: error-handler, namespace: default}
spec:
  config: {path: "{out}/dlq", format: parquet}
---
apiVersion: conveyor.router/v1
kind: Pipeline
metadata:
  name: user-analytics
  namespace: default
  labels: {team: analytics}
spec:
  source: file-events
  steps: [filter-active]
  sink: archive
  dlq: {sink: error-handler, maxRetries: 5}
"""


@pytest.fixture
def loaded(sf_dir, tmp_path):
    text = DOCS.replace("{sf_dir}", sf_dir).replace("{out}", str(tmp_path))
    reg = Registry()
    resources = load_documents(list(yaml.safe_load_all(text)), reg)
    return reg, resources


def test_parse_and_camel_case_normalization():
    res = parse_resource(yaml.safe_load("""
apiVersion: conveyor.router/v1
kind: Source
metadata: {name: k}
spec:
  config: {brokers: [k:9092], topic: t, consumerGroup: g, autoOffsetReset: earliest}
"""))
    assert res.config["consumer_group"] == "g"
    assert res.config["auto_offset_reset"] == "earliest"


def test_resolve_pipeline(loaded):
    reg, resources = loaded
    pl = next(r for r in resources if r.kind == "Pipeline")
    p = resolve(reg, pl)
    assert [s.stage_type.value for s in p.stages.values()] == ["source", "transform", "sink"]
    assert p.stages["file-events"].config["source_type"] == "file"  # inferred
    assert p.stages["filter-active"].transform_type == "filter"
    assert p.dlq["max_retries"] == 5
    assert p.metadata == {"team": "analytics"}


def test_resolved_pipeline_compiles_and_runs(spark, loaded, tmp_path):
    reg, resources = loaded
    pl = next(r for r in resources if r.kind == "Pipeline")
    p = resolve(reg, pl)
    compiled = compile_pipeline(spark, p)
    compiled.run()
    out = spark.read.parquet(str(tmp_path / "archive"))
    types = {r.event_type for r in out.select("event_type").distinct().collect()}
    assert types <= {"purchase", "signup"} and out.count() > 0


def test_missing_reference_errors(loaded):
    reg, resources = loaded
    pl = next(r for r in resources if r.kind == "Pipeline")
    pl.spec = dict(pl.spec, source="nope")
    with pytest.raises(RegistryError, match="Source 'nope' not found"):
        resolve(reg, pl)


def test_namespace_isolation(loaded):
    reg, resources = loaded
    pl = next(r for r in resources if r.kind == "Pipeline")
    pl.namespace = "prod"  # resources live in 'default'
    with pytest.raises(RegistryError, match="namespace 'prod'"):
        resolve(reg, pl)


def test_named_condition_nesting():
    res = parse_resource(yaml.safe_load("""
apiVersion: conveyor.router/v1
kind: Transform
metadata: {name: t}
spec:
  config:
    type: filter
    condition:
      and:
        - metadataEquals: {key: status, value: active}
        - not:
            metadataExists: {key: deleted}
"""))
    from etl_router_spark.model.registry import _named_condition

    d = _named_condition(res.config["condition"])
    assert d["type"] == "and"
    kinds = [c["type"] for c in d["conditions"]]
    assert kinds == ["metadata_equals", "not"]


def test_env_interpolation_in_manifest(monkeypatch):
    from etl_router_spark.model.parser import interpolate_env, parse_manifest_dict

    monkeypatch.setenv("ETL_TEST_PW", "s3cret")
    monkeypatch.delenv("ETL_TEST_MISSING", raising=False)
    assert interpolate_env("pw=${ETL_TEST_PW}") == "pw=s3cret"
    assert interpolate_env("${ETL_TEST_MISSING:-fallback}") == "fallback"
    assert interpolate_env("literal $${ETL_TEST_PW}") == "literal ${ETL_TEST_PW}"
    import pytest

    with pytest.raises(ValueError, match="ETL_TEST_MISSING"):
        interpolate_env("${ETL_TEST_MISSING}")

    doc = {
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "env"},
        "spec": {"stages": [
            {"id": "s", "type": "source",
             "config": {"source_type": "jdbc", "url": "jdbc:postgresql://db/x",
                        "table": "t", "password": "${ETL_TEST_PW}"}},
            {"id": "k", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet", "path": "/tmp/o"}},
        ], "edges": [{"from": "s", "to": "k"}]},
    }
    pipe = parse_manifest_dict(doc)
    assert pipe.stages["s"].config["password"] == "s3cret"
