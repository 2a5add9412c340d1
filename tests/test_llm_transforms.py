"""The data-pipeline operators as first-class ``transform_type``s in a
manifest (SURVEY §7.3 M6) — a user can declare dedup/similarity/text
stages in YAML exactly like filter/aggregate."""

from __future__ import annotations

import pytest

from etl_router_spark.compile.pipeline import compile_pipeline
from etl_router_spark.model.parser import parse_manifest_dict


def _run(spark, src_path, transform_cfg, out):
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "llm-op"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "file", "format": "parquet", "path": src_path}},
            {"id": "op", "type": "transform", "config": transform_cfg},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet", "path": out}},
        ]},
    })
    return compile_pipeline(spark, pipeline).sink_frames["out"]


def test_dedup_exact_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "dedup_exact"}, str(tmp_path / "o"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < out.count() <= docs.count()
    assert set(out.columns) == set(docs.columns)


def test_dedup_minhash_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/documents.parquet",
               {"transform_type": "dedup_minhash", "num_hashes": 8, "bands": 4,
                "threshold": 0.5}, str(tmp_path / "o"))
    assert {"id_a", "id_b", "est_jaccard"} <= set(out.columns)
    assert out.filter("id_a >= id_b").count() == 0


def test_similarity_topk_manifest(spark, sf_dir, tmp_path):
    out = _run(spark, f"{sf_dir}/embeddings.parquet",
               {"transform_type": "similarity_topk", "k": 3,
                "query_condition": {"type": "field_lt", "key": "vec_id", "value": 5}},
               str(tmp_path / "o"))
    rows = out.collect()
    assert {r.query_id for r in rows} <= set(range(5))
    assert max(r.rank for r in rows) <= 3


def test_text_ops_manifest(spark, sf_dir, tmp_path):
    stats = _run(spark, f"{sf_dir}/documents.parquet",
                 {"transform_type": "text_stats"}, str(tmp_path / "s"))
    assert {"n_words", "stopword_ratio"} <= set(stats.columns)
    lang = _run(spark, f"{sf_dir}/documents.parquet",
                {"transform_type": "langid"}, str(tmp_path / "l"))
    assert "lang_pred" in lang.columns
    fp = _run(spark, f"{sf_dir}/documents.parquet",
              {"transform_type": "fingerprint"}, str(tmp_path / "f"))
    assert "fingerprint" in fp.columns


def test_multimodal_extract_manifest(spark, sf_dir, tmp_path):
    from etl_router_spark.functions.multimodal import attach_fake_media

    docs = attach_fake_media(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50))
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "mm"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "memory", "rows": []}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "multimodal_extract"}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o")}},
        ]},
    })
    compiled = compile_pipeline(spark, pipeline, source_overrides={"src": docs})
    out = compiled.sink_frames["out"]
    assert {"n_bytes", "content_digest", "feature"} <= set(out.columns)
    assert out.count() == 50
