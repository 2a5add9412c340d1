"""sketch_profile / merge_sketch_profiles / estimate_sketch_profile:
HLL estimates land within the lg_k error bound of exact distincts,
per-batch sketches folded nightly equal the one-shot full-corpus
profile, disjoint groups pass through merges, and the sketch column
round-trips through parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.profile import (
    estimate_sketch_profile,
    merge_sketch_profiles,
    sketch_profile,
)


def _corpus(spark, n=6000, start=0):
    # group g0/g1; value cardinality differs per group; overlapping
    # values across rows so distinct < rows
    return spark.range(start, start + n).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 1500).cast("string")).alias("v"),
        F.lit(10).alias("units"),
    )


def test_estimates_within_hll_error(spark):
    df = _corpus(spark)
    prof = estimate_sketch_profile(
        sketch_profile(df, "g", ["v"], lg_k=12, size_col="units"))
    got = {r["g"]: r.asDict() for r in prof.collect()}
    exact = {r["g"]: r["d"] for r in df.groupBy("g")
             .agg(F.countDistinct("v").alias("d")).collect()}
    for g in ("0", "1"):
        assert got[g]["n_rows"] == 3000
        assert got[g]["sum_units"] == 30000.0
        # 3 sigma of the lg_k=12 bound (1.04/sqrt(4096) ~ 1.6%)
        assert abs(got[g]["v_distinct"] - exact[g]) <= 0.05 * exact[g]


def test_incremental_equals_recompute(spark):
    # three nightly batches folded == one-shot profile of the union
    batches = [_corpus(spark, 2000, start=2000 * i) for i in range(3)]
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    folded = sketch_profile(batches[0], "g", ["v"], lg_k=12)
    for b in batches[1:]:
        folded = merge_sketch_profiles(
            folded, sketch_profile(b, "g", ["v"], lg_k=12), "g")
    got = {r["g"]: r.asDict()
           for r in estimate_sketch_profile(folded).collect()}
    want = {r["g"]: r.asDict()
            for r in estimate_sketch_profile(
                sketch_profile(full, "g", ["v"], lg_k=12)).collect()}
    for g in ("0", "1"):
        assert got[g]["n_rows"] == want[g]["n_rows"] == 3000
        assert got[g]["v_distinct"] == pytest.approx(
            want[g]["v_distinct"], rel=0.02)


def test_disjoint_groups_pass_through(spark):
    a = sketch_profile(
        _corpus(spark).filter("g = '0'"), "g", ["v"], lg_k=12)
    b = sketch_profile(
        _corpus(spark).filter("g = '1'")
        .withColumn("g", F.lit("2")), "g", ["v"], lg_k=12)
    merged = estimate_sketch_profile(merge_sketch_profiles(a, b, "g"))
    got = {r["g"]: r["n_rows"] for r in merged.collect()}
    assert got == {"0": 3000, "2": 3000}
    with pytest.raises(ValueError, match="schemas differ"):
        merge_sketch_profiles(a, b.withColumnRenamed("n_rows", "x"), "g")


def test_sketch_roundtrips_parquet(spark, tmp_path):
    path = str(tmp_path / "prof")
    sketch_profile(_corpus(spark), "g", ["v"], lg_k=12).write.parquet(path)
    reloaded = spark.read.parquet(path)
    batch = sketch_profile(_corpus(spark, 1000, start=9000), "g", ["v"],
                           lg_k=12)
    merged = estimate_sketch_profile(
        merge_sketch_profiles(reloaded, batch, "g"))
    got = {r["g"]: r["n_rows"] for r in merged.collect()}
    assert got == {"0": 3500, "1": 3500}
