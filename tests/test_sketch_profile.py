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


# ---------------------------------------------------------------------------
# mergeable fixed-boundary histograms
# ---------------------------------------------------------------------------
def test_histogram_counts_match_python_reference(spark):
    from etl_router_spark.functions.profile import histogram_sketch

    vals = [5, 10, 10, 15, 20, 25, 99, None]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v int")
    bins = [10.0, 20.0]
    row = histogram_sketch(df, "g", "v", bins).collect()[0]
    # bin_0: v < 10 -> {5}; bin_1: 10 <= v < 20 -> {10,10,15};
    # bin_2: v >= 20 -> {20,25,99}
    assert (row["bin_0"], row["bin_1"], row["bin_2"]) == (1, 3, 3)
    assert row["n_rows"] == 7 and row["n_nulls"] == 1
    assert row["sum_value"] == 184.0


def test_histogram_merge_equals_whole(spark):
    from etl_router_spark.functions.profile import (
        histogram_sketch, merge_sketch_profiles)

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 97).alias("v"))
    bins = [20.0, 40.0, 60.0, 80.0]
    whole = histogram_sketch(df, "g", "v", bins)
    merged = merge_sketch_profiles(
        histogram_sketch(df.filter("id % 2 = 0"), "g", "v", bins),
        histogram_sketch(df.filter("id % 2 = 1"), "g", "v", bins),
        "g")
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(whole) == key(merged)


def test_histogram_quantile_within_bin_width(spark):
    import numpy as np

    from etl_router_spark.functions.profile import (
        estimate_histogram_quantile, histogram_sketch)

    rows = [("a", float(i % 113)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v double")
    bins = [float(b) for b in range(10, 120, 10)]
    prof = histogram_sketch(df, "g", "v", bins)
    for q in (0.25, 0.5, 0.9):
        est = estimate_histogram_quantile(prof, bins, q).collect()[0]["q_est"]
        exact = float(np.quantile([v for _, v in rows], q))
        assert abs(est - exact) <= 10.0 + 1e-6, (q, est, exact)


def test_histogram_validation(spark):
    from etl_router_spark.functions.profile import (
        estimate_histogram_quantile, histogram_sketch)

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="increasing"):
        histogram_sketch(df, "g", "v", [2.0, 1.0])
    with pytest.raises(ValueError, match="boundary"):
        histogram_sketch(df, "g", "v", [])
    prof = histogram_sketch(df, "g", "v", [1.0, 2.0])
    with pytest.raises(ValueError, match="q must be"):
        estimate_histogram_quantile(prof, [1.0, 2.0], 1.5)


def test_histogram_empty_group_estimate_null(spark):
    from etl_router_spark.functions.profile import (
        estimate_histogram_quantile, histogram_sketch)

    df = spark.createDataFrame(
        [("g", None)], "g string, v double")
    prof = histogram_sketch(df, "g", "v", [1.0, 2.0])
    row = estimate_histogram_quantile(prof, [1.0, 2.0], 0.5).collect()[0]
    assert row["n_rows"] == 0 and row["q_est"] is None


def test_fold_log_equals_pairwise_merge(spark):
    from etl_router_spark.functions.profile import (
        fold_sketch_profiles, histogram_sketch, merge_sketch_profiles)

    df = spark.range(900).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 53).alias("v"))
    bins = [10.0, 25.0, 40.0]
    parts = [histogram_sketch(df.filter(f"id % 3 = {i}"), "g", "v", bins)
             for i in range(3)]
    log = parts[0].unionByName(parts[1]).unionByName(parts[2])
    folded = fold_sketch_profiles(log, "g")
    paired = merge_sketch_profiles(
        merge_sketch_profiles(parts[0], parts[1], "g"), parts[2], "g")
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(folded) == key(paired)
    assert key(folded) == key(histogram_sketch(df, "g", "v", bins))


# ---------------------------------------------------------------------------
# bottom-k (KMV) mergeable sample
# ---------------------------------------------------------------------------
def test_sample_fold_equals_whole(spark):
    from etl_router_spark.functions.profile import (
        fold_sample_sketches, sample_sketch)

    df = spark.range(500).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 11).alias("payload"))
    whole = sample_sketch(df, "g", k=4, payload_cols=["payload"])
    parts = [sample_sketch(df.filter(f"id % 3 = {i}"), "g", k=4,
                           payload_cols=["payload"]) for i in range(3)]
    log = parts[0].unionByName(parts[1]).unionByName(parts[2])
    folded = fold_sample_sketches(log, "g", k=4)
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(folded) == key(whole)
    # idempotent: folding the fold changes nothing
    assert key(fold_sample_sketches(folded, "g", k=4)) == key(whole)


def test_sample_reingested_id_occupies_one_slot(spark):
    from etl_router_spark.functions.profile import (
        fold_sample_sketches, sample_sketch)

    df = spark.createDataFrame(
        [("g", i) for i in range(10)], "g string, doc_id long")
    s1 = sample_sketch(df, "g", k=3)
    # the same batch re-ingested (a crawl re-fetch) must not double-fill
    folded = fold_sample_sketches(s1.unionByName(s1), "g", k=3)
    assert folded.count() == 3
    assert folded.select("doc_id").distinct().count() == 3


def test_sample_small_group_and_salt(spark):
    from etl_router_spark.functions.profile import sample_sketch

    df = spark.createDataFrame(
        [("g", i) for i in range(2)], "g string, doc_id long")
    assert sample_sketch(df, "g", k=5).count() == 2  # k > group size
    big = spark.createDataFrame(
        [("g", i) for i in range(100)], "g string, doc_id long")
    a = {r["doc_id"] for r in sample_sketch(big, "g", k=5, salt="a").collect()}
    b = {r["doc_id"] for r in sample_sketch(big, "g", k=5, salt="b").collect()}
    assert a != b  # salt rotates the draw
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        sample_sketch(big, "g", k=0)


def test_histogram_drift_detects_shift(spark):
    from etl_router_spark.functions.profile import (
        histogram_drift, histogram_sketch)

    bins = [10.0, 20.0, 30.0]
    same_a = spark.createDataFrame(
        [("g", float(i % 35)) for i in range(300)], "g string, v double")
    same_b = spark.createDataFrame(
        [("g", float((i + 7) % 35)) for i in range(300)], "g string, v double")
    shifted = spark.createDataFrame(
        [("g", float(20 + i % 15)) for i in range(300)], "g string, v double")
    pa = histogram_sketch(same_a, "g", "v", bins)
    stable = histogram_drift(
        pa, histogram_sketch(same_b, "g", "v", bins), "g").collect()[0]
    moved = histogram_drift(
        pa, histogram_sketch(shifted, "g", "v", bins), "g").collect()[0]
    assert stable["psi"] < 0.01 and stable["l1"] < 0.05
    assert moved["psi"] > 0.25 and moved["l1"] > 0.5  # investigate threshold
    assert stable["n_rows_a"] == 300 and stable["n_rows_b"] == 300


def test_histogram_drift_zero_against_self(spark):
    from etl_router_spark.functions.profile import (
        histogram_drift, histogram_sketch)

    df = spark.range(200).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 50).alias("v"))
    p = histogram_sketch(df, "g", "v", [10.0, 25.0])
    rows = histogram_drift(p, p, "g").collect()
    assert all(r["psi"] == 0.0 and r["l1"] == 0.0 for r in rows)


def test_histogram_drift_validation(spark):
    from etl_router_spark.functions.profile import (
        histogram_drift, histogram_sketch)

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    p = histogram_sketch(df, "g", "v", [1.0])
    with pytest.raises(ValueError, match="bin columns"):
        histogram_drift(p, p.drop("bin_1"), "g")
    with pytest.raises(ValueError, match="contiguous"):
        histogram_drift(p.drop("bin_0"), p, "g")


def test_histogram_fractional_sum_fold_is_bit_exact(spark):
    """The r10 fix for the advisor finding: sum_value is persisted
    UNROUNDED, so fold-then-read over FRACTIONAL values equals the
    whole-corpus profile exactly (per-batch rounding broke this)."""
    from pyspark.sql import functions as F

    from etl_router_spark.functions.profile import (
        fold_sketch_profiles,
        histogram_sketch,
    )

    df = spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 0.0101 + 0.37).alias("v"))
    bins = [1.0, 2.0]
    whole = {r["g"]: r["sum_value"]
             for r in histogram_sketch(df, "g", "v", bins).collect()}
    batches = [histogram_sketch(df.filter(F.col("id") % 4 == i),
                                "g", "v", bins) for i in range(4)]
    log = batches[0]
    for b in batches[1:]:
        log = log.unionByName(b)
    folded = {r["g"]: r["sum_value"]
              for r in fold_sketch_profiles(log, "g").collect()}
    # same addends in both paths; assert to float tolerance only for
    # the cross-partitioning order, not a rounding step
    assert whole.keys() == folded.keys()
    for g in whole:
        assert abs(whole[g] - folded[g]) < 1e-9, (g, whole[g], folded[g])


def test_sample_fold_winner_deterministic_across_partitionings(spark):
    """The r10 fix for the advisor finding: a re-ingested id whose
    payload CHANGED across batches folds to the same winner row no
    matter how the log is partitioned (dropDuplicates kept an
    arbitrary one)."""
    from etl_router_spark.functions.profile import fold_sample_sketches

    rows = [("g", 7, 100, "beta"), ("g", 7, 100, "alpha"),
            ("g", 8, 50, "zeta"), ("g", 8, 50, "eta")]
    log = spark.createDataFrame(
        rows, "src string, doc_id bigint, rank_key bigint, lang string")
    outs = []
    for parts in (1, 3, 7):
        folded = fold_sample_sketches(
            log.repartition(parts), "src", k=5, id_col="doc_id")
        outs.append(sorted((r["doc_id"], r["lang"])
                           for r in folded.collect()))
    assert outs[0] == outs[1] == outs[2]
    # the winner is the payload-tuple minimum, not arrival order
    assert dict(outs[0]) == {7: "alpha", 8: "eta"}


def test_sample_fold_skips_non_orderable_payload(spark):
    """The r11 fix for the advisor finding: a map-typed payload column
    (non-orderable — Spark rejects it in a window orderBy) must not
    break the fold. Orderable payloads still drive the deterministic
    winner; the map column rides along with the winning row."""
    from etl_router_spark.functions.profile import fold_sample_sketches

    rows = [("g", 7, 100, "beta", {"k": "1"}),
            ("g", 7, 100, "alpha", {"k": "2"}),
            ("g", 8, 50, "zeta", {"k": "3"})]
    log = spark.createDataFrame(
        rows,
        "src string, doc_id bigint, rank_key bigint, lang string,"
        " meta map<string,string>")
    folded = fold_sample_sketches(log, "src", k=5, id_col="doc_id")
    got = {r["doc_id"]: (r["lang"], dict(r["meta"]))
           for r in folded.collect()}
    # doc 7 dedups to ONE slot, winner by the orderable payload tuple
    # (rank_key, lang) -> "alpha", whose row carries its own map
    assert got == {7: ("alpha", {"k": "2"}), 8: ("zeta", {"k": "3"})}
