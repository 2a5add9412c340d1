"""The nightly corpus-statistics loop, end to end — runnable demo.

Ingest arrives in batches; the corpus itself is never re-read after a
batch is profiled. Every nightly artifact is a #groups-sized table:

  1. per-batch profiling     -> histogram_sketch / sample_sketch /
                                sketch_profile rows APPENDED to logs
  2. log compaction          -> fold_sketch_profiles / fold_sample_sketches
  3. readouts                -> estimate_histogram_quantile (median per
                                source), estimate_sketch_profile
                                (distinct counts), the bottom-k rows
  4. drift alarm             -> histogram_drift (PSI) between the
                                previous fold and today's
  5. decontamination         -> bloom_bitmap built ONCE (night zero),
                                every batch probed with prebuilt_words
                                (pure map, no rebuild, no join)
  6. cutoff calibration      -> filter_yield_curve over the folded
                                corpus view: docs/chars surviving each
                                candidate quality threshold, one pass

Run:  python examples/nightly_stats.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_router_spark import get_spark  # noqa: E402
from etl_router_spark.functions.profile import (  # noqa: E402
    estimate_histogram_quantile,
    estimate_sketch_profile,
    fold_sample_sketches,
    fold_sketch_profiles,
    histogram_drift,
    histogram_sketch,
    sample_sketch,
    sketch_profile,
)
from etl_router_spark.io import load_table  # noqa: E402

BINS = [100.0, 200.0, 300.0, 400.0, 500.0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("nightly_stats")
    docs = load_table(spark, sf_dir, "documents")
    wd = tempfile.mkdtemp(prefix="nightly_stats_")

    # --- night zero, once: build the benchmark Bloom filter ---
    from etl_router_spark.functions.corpus import (
        bloom_bitmap,
        bloom_decontaminate,
        filter_yield_curve,
    )

    bench = docs.filter(F.col("doc_id") % 10 == 0)
    bloom = bloom_bitmap(bench, n=8, m_bits=1 << 16, k=3,
                         hash_family="xxhash64")
    print(f"benchmark filter built once: {len(bloom) * 8 // 1024} KiB")

    # --- nightly ingest: four batches, interleaved across sources ---
    for night in range(4):
        arriving = docs.filter(F.expr(f"(doc_id DIV 20) % 4 = {night}")
                               & (F.col("doc_id") % 10 != 0))
        # decontaminate BEFORE profiling: one map-side probe, no rebuild
        batch = bloom_decontaminate(
            arriving, None, n=8, m_bits=1 << 16, k=3,
            hash_family="xxhash64", prebuilt_words=bloom)
        histogram_sketch(batch, "source", "n_chars", BINS) \
            .write.mode("append").parquet(f"{wd}/hist_log")
        sample_sketch(batch, "source", k=3, payload_cols=["lang"]) \
            .write.mode("append").parquet(f"{wd}/sample_log")
        sketch_profile(batch, "source", ["lang"], lg_k=12) \
            .write.mode("append").parquet(f"{wd}/hll_log")
        print(f"night {night}: {arriving.count()} arrived, "
              f"{batch.count()} clean docs profiled, logs appended")

    # --- compaction + readouts (cost: #groups x #batches rows) ---
    hist = fold_sketch_profiles(spark.read.parquet(f"{wd}/hist_log"), "source")
    medians = estimate_histogram_quantile(hist, BINS, 0.5)
    print("\nper-source median n_chars (from the folded histogram table):")
    medians.select("source", "n_rows", "q_est").orderBy("source").show(5)

    hll = fold_sketch_profiles(spark.read.parquet(f"{wd}/hll_log"), "source")
    print("per-source distinct languages (HLL estimate):")
    estimate_sketch_profile(hll).orderBy("source").show(5)

    samples = fold_sample_sketches(
        spark.read.parquet(f"{wd}/sample_log"), "source", k=3)
    print("representative rows per source (bottom-k sample):")
    samples.orderBy("source", "rank_key").show(5)

    # --- drift alarm: compare the first two nights against the last two ---
    early = fold_sketch_profiles(
        histogram_sketch(docs.filter(F.expr("(doc_id DIV 20) % 4 < 2")),
                         "source", "n_chars", BINS), "source")
    late = fold_sketch_profiles(
        histogram_sketch(docs.filter(F.expr("(doc_id DIV 20) % 4 >= 2")),
                         "source", "n_chars", BINS), "source")
    drift = histogram_drift(early, late, "source")
    worst = drift.orderBy(F.desc("psi")).first()
    print(f"drift check: worst PSI = {worst['psi']} (source {worst['source']})"
          " — < 0.1 stable, > 0.25 investigate")
    # --- cutoff calibration: yield at each candidate quality threshold ---
    scored = docs.withColumn("score", F.col("n_chars").cast("double") / 600.0)
    curve = filter_yield_curve(scored, "score", [0.2, 0.4, 0.6, 0.8],
                               size_col="n_chars")
    print("quality-cutoff yield curve (docs/chars surviving, one pass):")
    curve.show()
    assert medians.count() > 0 and samples.count() > 0
    print("\nnightly loop complete; all state is #groups-sized tables under", wd)


if __name__ == "__main__":
    main()
