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


def test_multimodal_resize_and_frames(spark, sf_dir):
    from etl_router_spark.functions.multimodal import (
        attach_fake_media,
        resize_images,
        sample_frames,
    )

    docs = attach_fake_media(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20))
    resized = resize_images(docs, width=16, height=8)
    rows = resized.collect()
    assert len(rows) == 20
    assert all(len(r.media) == 16 * 8 for r in rows)
    assert all((r.width, r.height) == (16, 8) for r in rows)
    # deterministic: same input -> same bytes
    again = {r.doc_id: r.media for r in resize_images(docs, 16, 8).collect()}
    assert all(again[r.doc_id] == r.media for r in rows)

    frames = sample_frames(docs, every_n=10, max_frames=4)
    fr = frames.collect()
    assert {r.doc_id for r in fr} <= {r.doc_id for r in rows}
    per_doc = {}
    for r in fr:
        per_doc.setdefault(r.doc_id, []).append(r.frame_index)
    assert all(sorted(v) == list(range(len(v))) and len(v) <= 4 for v in per_doc.values())

    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|real image"):
        resize_images(docs, 4, 4, decoder="real").collect()


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


def test_corpus_stage_manifests(spark, sf_dir, tmp_path):
    """decontaminate / hash_sample / pack_sequences as manifest
    transform_types: the full corpus-prep pipeline is declarable in
    YAML like any filter or aggregate."""
    docs_path = f"{sf_dir}/documents.parquet"
    n_docs = spark.read.parquet(docs_path).count()

    sampled = _run(spark, docs_path,
                   {"transform_type": "hash_sample", "rate": 0.3,
                    "key_field": "doc_id", "salt": "m"},
                   str(tmp_path / "s"))
    assert 0 < sampled.count() < n_docs

    clean = _run(spark, docs_path,
                 {"transform_type": "decontaminate", "ngram": 8,
                  "benchmark": {"source_type": "file", "format": "parquet",
                                "path": docs_path}},
                 str(tmp_path / "d"))
    # benchmark == corpus -> every doc leaks its own 8-grams
    assert clean.count() == 0

    packed = _run(spark, docs_path,
                  {"transform_type": "tokenize"},
                  str(tmp_path / "t"))
    pipeline2 = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "pack"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "memory", "rows": []}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "pack_sequences", "max_tokens": 1024}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "p")}},
        ]},
    })
    compiled = compile_pipeline(
        spark, pipeline2,
        source_overrides={"src": packed.select("doc_id", "n_tokens")})
    out = compiled.sink_frames["out"]
    assert {"seq_index", "seq_offset", "token_start"} <= set(out.columns)
    assert out.count() == n_docs
