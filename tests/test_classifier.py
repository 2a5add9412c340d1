"""Model-based quality classifier (fastText recipe): distributed
training separates labeled corpora; literal-weights apply matches an
independent Python reimplementation and the DuckDB value gate
(``text_quality_classifier``)."""

from __future__ import annotations

import hashlib
import math

import pytest

from etl_router_spark.functions.classifier import (
    deterministic_weights,
    quality_classifier_apply,
    quality_classifier_train,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_score(text: str, ws: list[float], bias: float) -> float:
    toks = [t for t in text.lower().split() if t]
    z = (sum(ws[_h60(t) % len(ws)] for t in toks) / len(toks)) if toks else 0.0
    return round(1.0 / (1.0 + math.exp(-(z + bias))), 6)


def test_apply_matches_python_reference(spark):
    ws, b = deterministic_weights(64)
    rows = [(0, "The quick brown fox jumps over the lazy dog"),
            (1, "click HERE buy now cheap cheap cheap"),
            (2, ""), (3, "   "), (4, "one-token")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.quality_score, r.quality_label)
           for r in quality_classifier_apply(df, ws, b).collect()}
    for i, text in rows:
        want = _py_score(text, ws, b)
        assert got[i][0] == pytest.approx(want, abs=1e-6), (i, text)
        assert got[i][1] == int(want >= 0.5)


def test_train_separates_good_from_bad(spark):
    good = [(i, 1, "the committee published a detailed report on regional "
                   "infrastructure investment and long term planning")
            for i in range(40)]
    bad = [(i + 100, 0, "BUY now CLICK here FREE winner casino bonus "
                        "jackpot lottery prize claim")
           for i in range(40)]
    df = spark.createDataFrame(good + bad, "doc_id long, label int, text string")
    ws, b = quality_classifier_train(df, "label", num_features=128, max_iter=30)
    assert len(ws) == 128
    scored = quality_classifier_apply(df, ws, b)
    acc = (scored.selectExpr(
        "avg(CAST(quality_label = label AS DOUBLE)) AS acc").first().acc)
    assert acc >= 0.95, acc
    # generalization to unseen docs drawn from the same styles
    test = spark.createDataFrame(
        [(0, "the regional committee report published detailed planning"),
         (1, "FREE jackpot winner CLICK casino bonus now")],
        "doc_id long, text string")
    s = {r.doc_id: r.quality_score
         for r in quality_classifier_apply(test, ws, b).collect()}
    assert s[0] > s[1]


def test_quality_filter_threshold_keeps_fraction(spark, sf_dir):
    from etl_router_spark.io import load_table

    ws, b = deterministic_weights(256)
    docs = load_table(spark, sf_dir, "documents")
    scored = quality_classifier_apply(docs, ws, b, threshold=0.5)
    n = docs.count()
    kept = scored.filter("quality_label = 1").count()
    assert 0 < kept < n  # a real split, not all-pass / all-drop


def test_quality_classifier_manifest_transform(spark, sf_dir, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
           "metadata": {"name": "qc"},
           "spec": {"stages": [
               {"id": "s", "type": "source",
                "config": {"source_type": "file", "format": "parquet",
                           "path": f"{sf_dir}/documents.parquet"}},
               {"id": "t", "type": "transform",
                "config": {"transform_type": "quality_classifier",
                           "num_features": 64, "threshold": 0.5}},
               {"id": "o", "type": "sink",
                "config": {"sink_type": "file", "format": "parquet",
                           "path": str(tmp_path / "out")}},
           ]}}
    compile_pipeline(spark, parse_manifest_dict(doc)).run()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert {"quality_score", "quality_label"} <= set(out.columns)
    assert out.filter("quality_score IS NULL").count() == 0
