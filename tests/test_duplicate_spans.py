"""duplicate_ngram_spans / duplicate_span_stats: hand-checkable corpora
pin the span semantics (cross-doc dup, within-doc repeat, interval
merge, gap preservation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.dedup import duplicate_ngram_spans, duplicate_span_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cross_doc_duplicate_span(spark):
    # docs 1 and 2 share the 5-gram "a b c d e"; doc 3 is clean
    df = _docs(spark, [
        (1, "a b c d e x y z w v"),
        (2, "q r a b c d e s t u"),
        (3, "k l m n o p q2 r2 s2 t2"),
    ])
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in duplicate_ngram_spans(df, n=5).collect()}
    assert spans == {(1, 1, 5), (2, 3, 7)}


def test_adjacent_ngrams_merge_into_one_span(spark):
    # shared run of 7 tokens -> three overlapping 5-grams -> ONE span
    df = _docs(spark, [
        (1, "a b c d e f g x1 y1 z1"),
        (2, "p q a b c d e f g w2"),
    ])
    spans = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
             for r in duplicate_ngram_spans(df, n=5).collect()}
    assert spans == {(1, 1, 7, 7), (2, 3, 9, 7)}


def test_gap_splits_spans(spark):
    # two shared 5-gram regions separated by unique middles -> 2 spans each
    df = _docs(spark, [
        (1, "a b c d e m1 n1 o1 v w x y z"),
        (2, "a b c d e m2 n2 o2 v w x y z"),
    ])
    out = duplicate_ngram_spans(df, n=5)
    per_doc = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {1: 2, 2: 2}
    d1 = {(r.span_start, r.span_end) for r in out.filter("doc_id = 1").collect()}
    assert d1 == {(1, 5), (9, 13)}


def test_within_doc_repeat_counts(spark):
    # the same 5-gram twice in ONE doc -> both occurrences are spans
    df = _docs(spark, [
        (1, "a b c d e u1 u2 u3 a b c d e"),
        (2, "completely different words here now ok fine"),
    ])
    spans = {(r.span_start, r.span_end)
             for r in duplicate_ngram_spans(df, n=5).filter("doc_id = 1").collect()}
    assert spans == {(1, 5), (9, 13)}


def test_short_and_clean_docs_emit_nothing(spark):
    df = _docs(spark, [(1, "only four words here"), (2, "all unique tokens in this document right")])
    assert duplicate_ngram_spans(df, n=5).count() == 0


def test_span_stats(spark):
    df = _docs(spark, [
        (1, "a b c d e x y z w v"),   # 10 tokens, 5 dup
        (2, "q r a b c d e s t u"),   # 10 tokens, 5 dup
        (3, "k l m n o p q2 r2 s2 t2"),  # clean
    ])
    stats = {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_fraction)
             for r in duplicate_span_stats(df, n=5).collect()}
    assert stats[1] == (10, 5, 0.5)
    assert stats[2] == (10, 5, 0.5)
    assert stats[3] == (10, 0, 0.0)


def test_min_count_threshold(spark):
    df = _docs(spark, [
        (1, "a b c d e x y z w v"),
        (2, "q r a b c d e s t u"),
    ])
    # min_count=3: the shared gram appears only twice -> no spans
    assert duplicate_ngram_spans(df, n=5, min_count=3).count() == 0
    with pytest.raises(ValueError):
        duplicate_ngram_spans(df, n=0)
    with pytest.raises(ValueError):
        duplicate_ngram_spans(df, min_count=1)


def test_pipeline_duplicate_spans_stage(spark):
    from etl_router_spark.compile.pipeline import apply_transform_stage
    from etl_router_spark.model.manifest import Stage, StageType

    df = _docs(spark, [(1, "a b c d e x y z w v"), (2, "q r a b c d e s t u")])
    stage = Stage(id="ds", stage_type=StageType.TRANSFORM,
                  config={"transform_type": "duplicate_spans", "n": 5})
    assert apply_transform_stage(df, stage, spark).count() == 2
