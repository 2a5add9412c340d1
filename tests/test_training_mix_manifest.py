"""End-to-end run of the training-mix example manifest shape: a DAG
with a TransformService scrub stage, a duplicate-spans audit branch,
and a mix_sample stage — one source scan, two sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_router_spark.functions.transform_service import register_transform


@register_transform("test_scrub_min_chars")
def _scrub(pdf, config):
    # FILTERED: docs shorter than min_chars (emit nothing for them)
    return pdf[pdf["n_chars"] >= int(config.get("min_chars", "0"))]


def test_training_mix_dag(spark, sf_dir, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    docs = f"{sf_dir}/documents.parquet"
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "training-mix-test"},
        "spec": {
            "stages": [
                {"id": "src", "type": "source",
                 "config": {"source_type": "file", "format": "parquet", "path": docs}},
                {"id": "scrub", "type": "transform",
                 "config": {"transform_type": "service",
                            "transform": "test_scrub_min_chars",
                            "output_schema": "doc_id bigint, text string, lang string, "
                                             "source string, n_chars bigint",
                            "transform_config": {"min_chars": "200"},
                            "on_error": "drop"}},
                {"id": "audit", "type": "transform",
                 "config": {"transform_type": "duplicate_spans", "n": 8}},
                {"id": "mix", "type": "transform",
                 "config": {"transform_type": "mix_sample",
                            "weights": {"src13": 0.5, "src8": 0.5},
                            "domain_field": "source", "key_field": "doc_id",
                            "size_field": "n_chars", "salt": "t"}},
                {"id": "audit_out", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet",
                            "path": str(tmp_path / "audit")}},
                {"id": "train_out", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet",
                            "path": str(tmp_path / "train")}},
            ],
            "edges": [
                {"from": "src", "to": "scrub"},
                {"from": "scrub", "to": "audit"},
                {"from": "audit", "to": "audit_out"},
                {"from": "scrub", "to": "mix"},
                {"from": "mix", "to": "train_out"},
            ],
        },
    })
    compiled = compile_pipeline(spark, pipeline)
    assert set(compiled.sink_frames) == {"audit_out", "train_out"}

    train = compiled.sink_frames["train_out"]
    got = {r.source for r in train.select("source").distinct().collect()}
    assert got <= {"src13", "src8"} and got
    assert train.filter(F.col("n_chars") < 200).count() == 0

    audit = compiled.sink_frames["audit_out"]
    assert set(audit.columns) == {"doc_id", "span_start", "span_end", "span_tokens"}


def test_training_mix_example_parses():
    """The shipped examples/manifests/training-mix.yaml passes schema
    validation (paths are illustrative; compile is covered above)."""
    from etl_router_spark.model.parser import parse_manifest
    from etl_router_spark.model.validation import validate_pipeline

    p = parse_manifest(open("examples/manifests/training-mix.yaml").read())
    validate_pipeline(p)
    assert "curated_docs" in p.stages and "train_ready" in p.stages
