"""c4_rules: each published rule pinned on crafted documents."""

from __future__ import annotations

import pytest

from etl_router_spark.functions.text import c4_rules

GOOD = ("This is a perfectly fine sentence with plenty of words.\n"
        "Here is another complete sentence that also ends properly!\n"
        "And a third one to clear the sentence minimum?")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _row(spark, text, **kw):
    return c4_rules(_df(spark, [(1, text)]), **kw).collect()[0]


def test_good_doc_kept_intact(spark):
    r = _row(spark, GOOD)
    assert r.keep and r.n_lines == 3 and r.n_lines_kept == 3
    assert r.text_clean == GOOD and r.n_sentences == 3


def test_short_and_unterminated_lines_cut(spark):
    r = _row(spark, GOOD + "\ntoo short.\nthis line has plenty of words but no terminal mark")
    assert r.n_lines == 5 and r.n_lines_kept == 3
    assert "too short" not in r.text_clean
    assert "terminal mark" not in r.text_clean
    assert r.keep  # the three good sentences survive


def test_javascript_line_cut(spark):
    r = _row(spark, GOOD + "\nplease enable Javascript to view this page.")
    assert r.n_lines_kept == 3 and "Javascript" not in r.text_clean


def test_min_sentences_drops_page(spark):
    r = _row(spark, "Only one full sentence lives in this document right here.")
    assert r.n_sentences == 1 and not r.keep


def test_banned_page_substrings(spark):
    assert not _row(spark, GOOD + "\nvar x = { a: 1 };").keep
    assert not _row(spark, GOOD + "\nLorem Ipsum dolor sit amet and more.").keep


def test_drop_mode_replaces_text(spark):
    df = _df(spark, [(1, GOOD + "\nnoise js line no punct"), (2, "Too few sentences here.")])
    out = c4_rules(df, mode="drop")
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].text == GOOD
    assert set(out.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError):
        c4_rules(df, mode="wat")


def test_custom_thresholds(spark):
    # min_words_per_line=3 keeps a 3-word terminated line
    r = _row(spark, "Three word line.\n" + GOOD, min_words_per_line=3)
    assert r.n_lines_kept == 4


def test_pipeline_c4_stage_and_shuffle_free(spark):
    from etl_router_spark.compile.pipeline import apply_transform_stage
    from etl_router_spark.model.manifest import Stage, StageType

    df = _df(spark, [(1, GOOD), (2, "nope")])
    stage = Stage(id="c4", stage_type=StageType.TRANSFORM,
                  config={"transform_type": "c4_filter", "mode": "drop"})
    out = apply_transform_stage(df, stage, spark)
    assert out.count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
