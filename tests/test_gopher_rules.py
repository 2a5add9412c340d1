"""gopher_rules: each published rule violated by one crafted document,
plus mode semantics and the pipeline stage."""

from __future__ import annotations

import pytest

from etl_router_spark.functions.text import gopher_rules

GOOD = ("the quick brown fox jumps over a lazy dog and then the dog have "
        "to be chased out of town with many more plain words following after that "
        "so it clears thirty words easily right here today")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _row(spark, text, **kw):
    out = gopher_rules(_df(spark, [(1, text)]), min_words=30, **kw)
    return out.collect()[0]


def test_good_doc_passes_all(spark):
    r = _row(spark, GOOD)
    assert r.keep and r.passes_word_count and r.passes_mean_word_len
    assert r.passes_symbol_ratio and r.passes_line_rules
    assert r.passes_alpha_ratio and r.passes_stopwords


def test_word_count_rule(spark):
    r = _row(spark, "too few words here")
    assert not r.passes_word_count and not r.keep


def test_mean_word_length_rule(spark):
    # 30+ one-char words: mean word length 1 < 3
    r = _row(spark, " ".join(["a"] * 35))
    assert not r.passes_mean_word_len


def test_symbol_ratio_rule(spark):
    r = _row(spark, GOOD + " " + "#" * 40)
    assert not r.passes_symbol_ratio
    r2 = _row(spark, GOOD + " " + "... ... ... ... ... ... ... ...")
    assert not r2.passes_symbol_ratio


def test_line_rules(spark):
    bullets = "\n".join(f"- item {i} listed" for i in range(10))
    r = _row(spark, bullets)
    assert not r.passes_line_rules
    ell = "\n".join(f"line {i} trails off..." for i in range(10))
    assert not _row(spark, ell).passes_line_rules


def test_alpha_ratio_rule(spark):
    r = _row(spark, GOOD + " " + " ".join(["123"] * 40))
    assert not r.passes_alpha_ratio


def test_stopword_rule(spark):
    # >= 30 words, realistic lengths, but no English stop words
    text = " ".join(["lorem", "ipsum", "dolor", "sit", "amet"] * 8)
    r = _row(spark, text)
    assert not r.passes_stopwords and not r.keep


def test_drop_mode_and_bad_mode(spark):
    df = _df(spark, [(1, GOOD), (2, "tiny")])
    kept = gopher_rules(df, min_words=30, mode="drop")
    assert [r.doc_id for r in kept.collect()] == [1]
    assert "keep" not in kept.columns and "passes_word_count" not in kept.columns
    with pytest.raises(ValueError):
        gopher_rules(df, mode="wat")


def test_pipeline_gopher_stage(spark):
    from etl_router_spark.compile.pipeline import apply_transform_stage
    from etl_router_spark.model.manifest import Stage, StageType

    df = _df(spark, [(1, GOOD), (2, "tiny")])
    stage = Stage(id="g", stage_type=StageType.TRANSFORM,
                  config={"transform_type": "gopher_filter", "min_words": 30,
                          "mode": "drop"})
    assert apply_transform_stage(df, stage, spark).count() == 1


def test_shuffle_free(spark):
    df = _df(spark, [(1, GOOD)])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
