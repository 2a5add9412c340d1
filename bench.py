"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "calibration": sec, "sf": "..."}

"calibration" is a pinned scan+aggregate (etl_router_spark/calibration.py)
whose code never changes — the MEDIAN of three best-of-N samples taken at
the start, middle and end of the run ("calibration_samples"), so one
anomalous sample can't skew every normalized ratio (r8 lesson). Compare
rounds with scripts/bench_compare.py, which divides per-query deltas by
the calibration delta to cancel machine drift and warns when the sample
spread makes the normalization untrustworthy.

Each query is forced with a noop sink write (full materialization of
every output column — no count() short-circuits), timed after a small
warm-up query so JVM/codegen startup is not billed to the first entry.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    # headline analytics
    "q1_pricing_summary",
    "q3_revenue_by_priority",
    "q5_nation_revenue",
    "q_top_parts_by_revenue",
    "q_customer_segment_stats",
    "q6_forecast_revenue",
    "q18_large_orders",
    # stateful transform surface
    "t10_dedupe_keep_last",
    "t11_ratelimit",
    "t12_aggregate_tumbling",
    "t12_aggregate_sliding",
    "t14_sessionize",
    "t13_join_shaped",
    "lookup_merge",
    "fanin_union",
    # data-pipeline operators
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "similarity_topk",
    "similarity_lsh_ann",
    "text_quality_stats",
    "text_fingerprint",
    "multimodal_features",
    # round 4: the most expensive previously-untracked gates, added so
    # their plans get regression-tracked (VERDICT r3 #7)
    "corpus_global_shuffle",
    "text_tfidf_cosine",
    "text_bigram_logprob",
    "dedup_minhash_join",
    "corpus_pack_sequences",
    "q_window_funcs",
    # round 4 second pass: the heaviest new operator, tracked from birth
    "corpus_line_dedup",
    # round 4 third pass: substring-dup spans (3-shuffle posting plan),
    # the Python-boundary extension point (honest Arrow-cost tracking),
    # and target-mixture sampling (counts agg + broadcast-rate filter)
    "corpus_duplicate_spans",
    "service_process_batch",
    "corpus_mix_target",
    # round 4 fourth pass: link-graph degree pass (the cheap graph
    # entry; pagerank's 10-round loop is timed in SCALE.md instead —
    # its cost is per-round fixed job overhead, not data volume)
    "graph_degrees",
    # round 5: operator-only twin of graph_degrees over a
    # pre-materialized edge parquet — graph_degrees' 1.07 s was mostly
    # its orders x lineitem fixture join, so fixture and operator cost
    # are now tracked separately (VERDICT r4 #7)
    "graph_degrees_op",
    # round 8: the new operator families, tracked from birth — PQ
    # encode (map-side literal codebooks), IVF-PQ search (broadcast
    # cell join + ADC), model-based quality scoring (literal weights)
    "embedding_pq_encode",
    "embedding_ivfpq_topk",
    "embedding_ivfpq_rerank_topk",
    "text_quality_classifier",
    # round 9: the new families, tracked from birth — retrieval eval
    # (two per-query-group window/agg passes over top-k runs), Bloom
    # decontamination (zero-join literal-bit-array probe), DSIR
    # selection (hashed-ngram importance weights + top-k)
    "search_retrieval_eval",
    "corpus_bloom_decontaminate",
    "select_dsir_topk",
    # round 9 second pass: URL curation (host-keyed exact cap — the
    # one-shuffle plan) and the one-pass filter-attribution report
    "curate_domain_cap",
    "corpus_filter_attribution",
    # round 10: the broadcast Bloom transport, tracked from birth next
    # to its plan-literal twin (the delta between the two rows IS the
    # per-task literal serialization cost)
    "corpus_bloom_decontaminate_bcast",
    # round 10 third pass: the lexical-fuzzy decontamination rung and
    # the one-pass quality-cutoff yield curve, tracked from birth
    "corpus_decontaminate_fuzzy",
    "corpus_yield_curve",
]

# r4 flagged three regressions (+11..23%) with no commit touching their
# code paths — suspected scheduler noise under the widened query set.
# Give exactly those queries more reps so the min is a tighter
# steady-state estimate (VERDICT r4 #2).
EXTRA_RUNS = {
    "dedup_embedding_cosine": 5,
    "text_fingerprint": 5,
    "similarity_topk": 5,
    # r9: flagged x1.29 at 3 reps with zero code change on its path;
    # best-of-7 re-measurement reproduced x1.10 — same noise profile
    "dedup_minhash_lsh": 5,
}

_EDGE_PARQUET: dict[str, str] = {}


def _latest_prior_bench() -> dict | None:
    """The newest BENCH_r*.json at the repo root (the driver's record
    of the prior round), for the >1.5x-mover self-adjudication.
    Returns None when there is no prior artifact (or it is
    unreadable), in which case no re-runs happen."""
    import glob
    import re

    root = Path(__file__).resolve().parent
    best_rnd, best = -1, None
    for p in glob.glob(str(root / "BENCH_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd > best_rnd:
            best_rnd, best = rnd, p
    if best is None:
        return None
    try:
        with open(best) as fh:
            prior = json.load(fh)
        # the driver wraps bench stdout under "parsed" (plus run
        # metadata); a raw bench.py artifact is the dict itself
        if isinstance(prior.get("parsed"), dict):
            prior = prior["parsed"]
        prior["__path__"] = os.path.basename(best)
        return prior
    except Exception:
        return None


def _graph_degrees_op(spark, sf_dir: str):
    """degree_stats over a pre-materialized edge parquet: the first
    call per SF pays the one-time fixture write (excluded by min-of-N),
    later reps time ONLY the operator's two (id, count) shuffles."""
    from etl_router_spark.functions.graph import degree_stats
    from etl_router_spark.queries_llm import _link_graph

    path = _EDGE_PARQUET.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="etl_bench_edges_") + "/edges"
        _link_graph(spark, sf_dir).write.parquet(path)
        _EDGE_PARQUET[sf_dir] = path
    return degree_stats(spark.read.parquet(path), "src", "dst",
                        assume_simple=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    bench_queries = [q for q in BENCH_QUERIES if q in only.split(",")] if only else BENCH_QUERIES

    from etl_router_spark.queries import all_queries
    from etl_router_spark.session import get_spark

    spark = get_spark("etl_router_spark_bench")
    queries = dict(all_queries())
    queries["graph_degrees_op"] = _graph_degrees_op

    # warm-up: run every query once at the smallest SF so JVM startup,
    # plan codegen and JIT are excluded from the timed runs (steady-state
    # measurement); data volume there is negligible (~0.1% of target)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10).collect()
    for name in bench_queries:
        try:
            queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warm-up is best-effort; the timed run will surface errors
    # warm the calibration plan too (codegen at warm SF, then one run
    # at the target SF for the page cache) — the FIRST interleaved
    # block otherwise pays those one-time costs and reads high, which
    # is exactly the asymmetry the median-of-blocks exists to remove
    from etl_router_spark.calibration import calibration_query as _calq

    _calq(spark, warm_dir).write.format("noop").mode("overwrite").save()
    _calq(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-3 per query: single-shot timings on a shared box carry
    # ±20% scheduler noise; the min of three runs is the steady-state
    # estimate (the first run at the target SF also pays the one-time
    # parquet footer read, which later runs do not). Raised from 2 in
    # round 3 after observing cross-run swings larger than any code
    # change being measured
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # calibration: a pinned scan+aggregate over lineitem whose code
    # never changes round-to-round, timed exactly like the headline
    # queries. Two consecutive rounds showed ±20% per-query cross-round
    # noise with zero code change (r4→r5 proven by A/B, r5→r6 by the
    # empty diff); dividing a query's cross-round delta by the
    # calibration delta separates machine drift from real regressions.
    # MEDIAN of three best-of-N samples INTERLEAVED at start / middle /
    # end of the run: r8 proved a single start-of-run sample can come
    # in anomalously fast relative to the rest of the run and flag
    # phantom regressions on every query (10 false REGRESSED lines,
    # adjudicated by re-measurement). The median of interleaved blocks
    # measures the machine the queries actually ran on; the per-block
    # samples are emitted so bench_compare can warn when their spread
    # says the normalization itself is untrustworthy.
    from etl_router_spark.calibration import calibration_query

    def calibration_block() -> float:
        best = float("inf")
        for _ in range(max(runs, 3)):
            t0 = time.perf_counter()
            calibration_query(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    cal_samples = [calibration_block()]
    midpoint = len(bench_queries) // 2

    timings: dict[str, float] = {}
    for qi, name in enumerate(bench_queries):
        if qi == midpoint and bench_queries:
            cal_samples.append(calibration_block())
        fn = queries[name]
        best = float("inf")
        for _ in range(max(runs, EXTRA_RUNS.get(name, 0))):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # clear BETWEEN reps too: self-join operators persist()
            # their shared input, and a rep that reuses the previous
            # rep's cache measures warm-cache re-execution, not
            # steady-state cost (plan handles stay memoized, so rep 2
            # still skips the one-time parquet footer read)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    cal_samples.append(calibration_block())

    cal_samples = [round(s, 3) for s in cal_samples]
    cal_best = sorted(cal_samples)[len(cal_samples) // 2]

    # self-adjudication (r14 verdict ask #3): BENCH_r14.json shipped a
    # 3.4x phantom on an untouched module that the drift file's noise
    # note didn't cover per-query. Any query whose CALIBRATION-
    # NORMALIZED time moved >1.5x in either direction vs the newest
    # BENCH_r*.json gets an automatic isolated re-run (min-of-2, after
    # the rest of the run has quiesced) appended under "requeried" —
    # the artifact then carries its own box-noise adjudication instead
    # of deferring it to a human re-measurement next round.
    requeried: dict[str, dict] = {}
    prior = _latest_prior_bench()
    if prior and str(prior.get("sf")) != sf_dir.rstrip("/").rsplit(
            "sf", 1)[-1]:
        # cross-scale "adjudication" is meaningless — query cost does
        # not scale like the calibration scan, so comparing against a
        # different-SF artifact would re-run nearly the whole suite
        # and label the scale gap a box-noise verdict
        prior = None
    if prior and prior.get("calibration"):
        p_cal = prior["calibration"]
        p_q = prior.get("queries", {})
        for name, sec in timings.items():
            if name not in p_q or not p_q[name]:
                continue
            ratio = (sec / cal_best) / (p_q[name] / p_cal)
            if not (ratio > 1.5 or ratio < 1 / 1.5):
                continue
            fn = queries[name]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            requeried[name] = {
                "normalized_ratio_vs_prior": round(ratio, 2),
                "rerun_sec": round(best, 3),
                "rerun_normalized_ratio": round(
                    (best / cal_best) / (p_q[name] / p_cal), 2),
            }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "calibration": round(cal_best, 3),
        "calibration_samples": cal_samples,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }
    if requeried:
        out["requeried"] = requeried
        out["requeried_vs"] = prior.get("__path__")
    print(json.dumps(out))
    # Human summary on stderr (stdout stays the one-JSON-line contract):
    # the calibration-normalized total is the cross-round comparable
    # number — divide two rounds' normalized totals and machine drift
    # cancels (scripts/bench_compare.py does this per-query).
    print(
        f"# {len(timings)} queries, total {total:.3f}s; "
        f"calibration {cal_best:.3f}s; "
        f"calibration-normalized total x{total / cal_best:.1f}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
