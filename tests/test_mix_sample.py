"""mix_sample (target domain mixture) semantics: achieved proportions,
binding-domain retention, determinism, precomputed-sizes path, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.corpus import mix_sample

WEIGHTS = {"src13": 0.4, "src8": 0.3, "src7": 0.2, "src18": 0.1}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from etl_router_spark.io import load_table

    return load_table(spark, sf_dir, "documents")


def test_binding_domain_keeps_everything(docs):
    out = mix_sample(docs, WEIGHTS, size_col="n_chars", salt="t1", rate_col="r")
    rates = {r.source: r.r for r in out.select("source", "r").distinct().collect()}
    # exactly one domain binds (rate ~1.0); all rates in (0, 1]
    assert all(0 < v <= 1.0 + 1e-12 for v in rates.values())
    assert any(abs(v - 1.0) < 1e-9 for v in rates.values())


def test_achieved_mixture_tracks_target(docs):
    """Char-weighted shares of the kept set approximate the 4:3:2:1
    target (hash sampling is exact only in expectation)."""
    out = mix_sample(docs, WEIGHTS, size_col="n_chars", salt="t1")
    got = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("n")).collect()
    }
    total = sum(got.values())
    wsum = sum(WEIGHTS.values())
    for d, w in WEIGHTS.items():
        assert got.get(d, 0) / total == pytest.approx(w / wsum, abs=0.12)


def test_unlisted_domains_dropped_and_determinism(docs):
    out = mix_sample(docs, WEIGHTS, size_col="n_chars", salt="t1")
    assert out.select("source").distinct().count() <= len(WEIGHTS)
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {r.doc_id for r in mix_sample(docs.repartition(7), WEIGHTS,
                                      size_col="n_chars", salt="t1")
         .select("doc_id").collect()}
    assert a == b  # partitioning-independent


def test_row_count_unit_default(docs):
    """Without size_col the mixture is over row counts."""
    out = mix_sample(docs, {"src13": 0.5, "src8": 0.5}, rate_col="r")
    rates = {r.source: r.r for r in out.select("source", "r").distinct().collect()}
    n = {r.source: r.n for r in docs.filter(F.col("source").isin("src13", "src8"))
         .groupBy("source").agg(F.count("*").alias("n")).collect()}
    binding = min(n, key=lambda d: n[d] / 0.5)
    assert rates[binding] == pytest.approx(1.0)


def test_precomputed_domain_sizes_matches(docs, spark):
    sizes = docs.groupBy("source").agg(F.sum(F.col("n_chars").cast("double")).alias("__n"))
    a = mix_sample(docs, WEIGHTS, size_col="n_chars", salt="t2").count()
    b = mix_sample(docs, WEIGHTS, domain_sizes=sizes, salt="t2").count()
    assert a == b


def test_bad_weights_raise(docs):
    with pytest.raises(ValueError, match="positive"):
        mix_sample(docs, {})
    with pytest.raises(ValueError, match="positive"):
        mix_sample(docs, {"src1": -1.0})


def test_plan_no_corpus_shuffle(docs):
    """The fact side must reach the filter via broadcast join — the only
    exchanges in the plan are for the tiny counts/rates sides."""
    out = mix_sample(docs, WEIGHTS, size_col="n_chars", salt="t1")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no SortMergeJoin anywhere: the corpus-side join never shuffles rows
    assert "SortMergeJoin" not in plan


def test_pipeline_mix_sample_stage(spark, docs):
    from etl_router_spark.compile.pipeline import apply_transform_stage
    from etl_router_spark.model.manifest import Stage, StageType

    stage = Stage(
        id="mix", stage_type=StageType.TRANSFORM,
        config={"transform_type": "mix_sample", "weights": WEIGHTS,
                "size_field": "n_chars", "salt": "t1"},
    )
    out = apply_transform_stage(docs, stage, spark)
    direct = mix_sample(docs, WEIGHTS, size_col="n_chars", salt="t1")
    assert out.count() == direct.count()
