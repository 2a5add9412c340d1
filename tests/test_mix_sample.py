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


class TestTemperatureMix:
    def test_rates_hand_computed(self, spark):
        """alpha=0.5 over sizes (100, 4): w=(10, 2), scale=min(10, 2)=2,
        rates=(0.2, 1.0) — head flattened, tail (binding) kept whole."""
        from etl_router_spark.functions.corpus import mix_sample

        rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = mix_sample(df, temperature=0.5, rate_col="r")
        rates = dict(out.select("source", "r").distinct().collect())
        assert abs(rates["big"] - 0.2) < 1e-9
        assert abs(rates["small"] - 1.0) < 1e-9
        # alpha=0: uniform target — every domain downsampled to the smallest
        rates0 = dict(mix_sample(df, temperature=0.0, rate_col="r")
                      .select("source", "r").distinct().collect())
        assert abs(rates0["big"] - 0.04) < 1e-9
        assert abs(rates0["small"] - 1.0) < 1e-9
        # alpha=1: natural mix — every rate exactly 1
        rates1 = dict(mix_sample(df, temperature=1.0, rate_col="r")
                      .select("source", "r").distinct().collect())
        assert rates1 == {"big": 1.0, "small": 1.0}

    def test_exclusive_parameters(self, spark):
        import pytest as _pytest

        from etl_router_spark.functions.corpus import mix_sample

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with _pytest.raises(ValueError, match="exactly one"):
            mix_sample(df, weights={"a": 1.0}, temperature=0.5)
        with _pytest.raises(ValueError, match="exactly one"):
            mix_sample(df)
        with _pytest.raises(ValueError, match=">= 0"):
            mix_sample(df, temperature=-0.1)

    def test_manifest_temperature(self, spark, tmp_path):
        from etl_router_spark.compile.pipeline import compile_pipeline
        from etl_router_spark.model.parser import parse_manifest_dict

        src = str(tmp_path / "docs")
        rows = [(i, "big") for i in range(64)] + [(100 + i, "small") for i in range(4)]
        spark.createDataFrame(rows, "doc_id long, source string").write.parquet(src)
        doc = {"apiVersion": "etl.dev/v1", "kind": "Pipeline",
               "metadata": {"name": "tmix"},
               "spec": {"stages": [
                   {"id": "s", "type": "source",
                    "config": {"source_type": "file", "format": "parquet", "path": src}},
                   {"id": "t", "type": "transform",
                    "config": {"transform_type": "mix_sample",
                               "temperature": 0.5, "rate_field": "r"}},
                   {"id": "o", "type": "sink",
                    "config": {"sink_type": "file", "format": "parquet",
                               "path": str(tmp_path / "out")}}]}}
        compile_pipeline(spark, parse_manifest_dict(doc)).run()
        out = spark.read.parquet(str(tmp_path / "out"))
        rates = dict(out.select("source", "r").distinct().collect())
        # sizes (64, 4): w=(8, 2), scale=2 -> rates (0.25, 1.0)
        assert abs(rates["big"] - 0.25) < 1e-9 and rates["small"] == 1.0
