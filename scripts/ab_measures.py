"""Named A/B experiments for operator-level design decisions.

Each experiment measures the SAME result computed two ways and prints
one JSON line — the repo's convention for adjudicating a constant
(bench_compare flags a movement; the A/B here explains it or rejects
the design). Usage:

    python scripts/ab_measures.py [sf_dir] [exp1,exp2,...]

Experiments (default: all):

- ``bloom_transport``: plan-literal vs broadcast bit-array across
  m_bits sizes — where does shipping the filter once per executor
  (BroadcastExchange) beat serializing it into every task binary?
  (The IVF-PQ plan-size lesson applied to bloom_decontaminate's
  ``broadcast`` threshold.)
- ``dsir_cache``: dsir_sample with the (id,bucket,c) aggregate
  persisted (cache=True, the r10 default) vs recomputed — the
  single-pass restructure's win is the corpus text re-scan it
  deletes.
- ``mix_counts``: mix_sample with the per-domain counts pass inline
  vs a pre-persisted domain_sizes table — isolates the counts
  aggregate the r9 temperature rework added to the nightly path
  (adjudicating the corpus_mix_target +27% bench movement).

Methodology: median of 3 alternating reps per arm (A,B,A,B,...),
`spark.catalog.clearCache()` between reps, action = count() so both
arms pay the same materialization.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 3


def _median_wall(fn, spark) -> float:
    walls = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(statistics.median(walls), 3)


def bloom_transport(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from etl_router_spark.functions.corpus import bloom_decontaminate
    from etl_router_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    n_docs = corpus.count()
    out: dict = {"experiment": "bloom_transport", "sf": sf_dir,
                 "n_docs": n_docs, "arms": {}}
    for m_bits in (1 << 18, 1 << 22, 1 << 24):
        row: dict = {"filter_kib": m_bits // 8 // 1024}
        for mode, bcast in (("literal", False), ("broadcast", True)):
            row[mode] = _median_wall(
                lambda b=bcast, m=m_bits: bloom_decontaminate(
                    corpus, bench, n=8, m_bits=m, k=3,
                    hash_family="xxhash64", broadcast=b).count(),
                spark)
        out["arms"][f"m=2^{m_bits.bit_length() - 1}"] = row
    return out


def dsir_cache(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from etl_router_spark.functions.selection import dsir_sample
    from etl_router_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.filter(F.col("doc_id") % 10 != 0)
    tgt = docs.filter(F.col("doc_id") % 10 == 0)
    out: dict = {"experiment": "dsir_cache", "sf": sf_dir,
                 "n_docs": raw.count(), "arms": {}}
    for mode, cache in (("recompute", False), ("persisted", True)):
        out["arms"][mode] = _median_wall(
            lambda c=cache: dsir_sample(
                raw, tgt, 50, buckets=512, salt="dsir1", cache=c).count(),
            spark)
    return out


def mix_counts(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from etl_router_spark.functions.corpus import mix_sample
    from etl_router_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src13": 0.4, "src8": 0.3, "src7": 0.2, "src18": 0.1}
    sizes = (docs.groupBy("source")
             .agg(F.sum(F.col("n_chars").cast("double")).alias("__n")))
    sizes_rows = sizes.collect()  # pre-persisted table stand-in
    sizes_df = spark.createDataFrame(sizes_rows, sizes.schema)
    out: dict = {"experiment": "mix_counts", "sf": sf_dir,
                 "n_docs": docs.count(), "arms": {}}
    out["arms"]["inline_counts"] = _median_wall(
        lambda: mix_sample(docs, weights, domain_col="source",
                           size_col="n_chars", salt="mix2").count(),
        spark)
    out["arms"]["external_sizes"] = _median_wall(
        lambda: mix_sample(docs, weights, domain_col="source",
                           size_col="n_chars", salt="mix2",
                           domain_sizes=sizes_df).count(),
        spark)
    return out



def shared_scan(spark, sf_dir: str) -> dict:
    """N pipelines over one source with an identical expensive
    stateless prefix: compile_group (one scan + one prefix compute,
    persisted) vs N independent compile_pipeline runs. The optimizer\'s
    headline claim ("N full-table scans become one"), finally measured.
    """
    import shutil

    from etl_router_spark.compile.optimizer import compile_group
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    N = 4

    def pipes(tag: str):
        ps = []
        for i in range(N):
            out = f"/tmp/etl_out/ab_shared/{tag}_{i}"
            shutil.rmtree(out, ignore_errors=True)
            ps.append(parse_manifest_dict({
                "apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": f"{tag}-p{i}"},
                "spec": {"stages": [
                    {"id": "src", "type": "source",
                     "config": {"source_type": "file", "format": "parquet",
                                "path": f"{sf_dir}/documents.parquet"}},
                    # the shared prefix: an expensive stateless map
                    # (identical config across all N pipelines)
                    {"id": "feat", "type": "transform",
                     "config": {"transform_type": "map", "mappings": [
                         {"target": "doc_id", "source": "doc_id"},
                         {"target": "fp",
                          "expression": "sha2(repeat(text, 8), 512)"}]}},
                    # tails DIVERGE per pipeline (prefix ends here)
                    {"id": "keep", "type": "transform",
                     "config": {"transform_type": "filter",
                                "condition": {
                                    "type": "expression",
                                    "expression":
                                        f"substring(fp, {i + 1}, 1) != 'f'"}}},
                    {"id": "out", "type": "sink",
                     "config": {"sink_type": "file", "format": "parquet",
                                "path": out}}]}}))
        return ps

    def run_independent():
        for p in pipes("ind"):
            compile_pipeline(spark, p).run()

    def run_shared():
        for compiled in compile_group(spark, pipes("shr")).values():
            compiled.run()

    out: dict = {"experiment": "shared_scan", "sf": sf_dir,
                 "n_pipelines": N, "arms": {}}
    out["arms"]["independent"] = _median_wall(run_independent, spark)
    out["arms"]["shared_group"] = _median_wall(run_shared, spark)
    return out


def stream_shared_scan(spark, sf_dir: str) -> dict:
    """The STREAMING twin of ``shared_scan`` (r11 verdict ask #3): N
    streaming pipelines over one file-stream source with an identical
    expensive stateless prefix — run_streaming_group (ONE fused
    foreachBatch query: one source read + one prefix compute per
    epoch) vs N independent streaming queries (each reads and computes
    the prefix itself). availableNow triggers, so both arms process
    the same one-epoch backlog to completion.

    Honest-measurement note: the independent arm's N queries run
    CONCURRENTLY, so on an idle box with spare cores the N-fold
    duplicate work hides in parallelism — wall only separates the arms
    when the prefix actually costs something (at 100 TB the prefix IS
    the scan; here the staged parquet sits in page cache, so the
    prefix models that cost with heavy compute: sha2 over a 64x
    repeat). Run with SPARK_GRAFT_CPUS=4 to approximate a
    compute-bound cluster where total work, not spare cores, sets the
    wall."""
    import itertools
    import os
    import shutil

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict
    from etl_router_spark.streaming.group import run_streaming_group
    from etl_router_spark.streaming.runner import run_streaming

    # the sharing win should grow with member count (one prefix pays
    # for N tails); AB_STREAM_SHARED_N sweeps it
    N = int(os.environ.get("AB_STREAM_SHARED_N", "4"))
    root = os.path.join("/tmp/etl_out/ab_stream_shared",
                        Path(sf_dir).name)
    src = os.path.join(root, "in")
    if not os.path.exists(src):
        spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .write.mode("overwrite").parquet(src)
    seq = itertools.count()

    def pipes(tag: str, run_id: int):
        ps = []
        for i in range(N):
            out = f"{root}/{tag}_{run_id}_{i}"
            shutil.rmtree(out, ignore_errors=True)
            ps.append(parse_manifest_dict({
                "apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": f"{tag}-p{i}"},
                "spec": {"stages": [
                    {"id": "src", "type": "source",
                     "config": {"source_type": "file", "format": "parquet",
                                "path": src}},
                    {"id": "feat", "type": "transform",
                     "config": {"transform_type": "map", "mappings": [
                         {"target": "doc_id", "source": "doc_id"},
                         {"target": "fp",
                          "expression": "sha2(repeat(text, 64), 512)"}]}},
                    {"id": "keep", "type": "transform",
                     "config": {"transform_type": "filter",
                                "condition": {
                                    "type": "expression",
                                    "expression":
                                        f"substring(fp, {i + 1}, 1) != 'f'"}}},
                    {"id": "out", "type": "sink",
                     "config": {"sink_type": "file", "format": "parquet",
                                "path": out}}]}}))
        return ps

    # checkpoints must be unique per PROCESS as well as per rep: a
    # reused availableNow checkpoint sees no new files and the epoch
    # no-ops, timing nothing
    import tempfile

    ck_root = tempfile.mkdtemp(prefix="ab_stream_ck_")

    def run_independent():
        run_id = next(seq)
        execs = [
            run_streaming(
                compile_pipeline(spark, p, streaming=True),
                f"{ck_root}/ind_{run_id}/{p.id}")
            for p in pipes("sind", run_id)
        ]
        for ex in execs:
            ex.await_termination()

    def run_shared():
        run_id = next(seq)
        run_streaming_group(
            spark, pipes("sshr", run_id),
            f"{ck_root}/shr_{run_id}").await_termination()

    out: dict = {"experiment": "stream_shared_scan", "sf": sf_dir,
                 "n_pipelines": N, "arms": {}}
    out["arms"]["independent"] = _median_wall(run_independent, spark)
    out["arms"]["shared_group"] = _median_wall(run_shared, spark)
    return out


def stream_mixed_group(spark, sf_dir: str) -> dict:
    """Does the r12 stateful-tail guard forfeit the fusion win? A
    group of N members sharing the same expensive stateless prefix,
    where ONE member's tail is stateful (dedupe keep-first) — under
    run_streaming_group the guard routes that member through
    individual run_streaming and fuses the other N-1. Arms:

    - ``all_individual``: every member via run_streaming (the pre-r12
      behavior for any group the runner refused to fuse).
    - ``guarded_group``: run_streaming_group on the same members
      (N-1 fused + 1 individual).

    Same compute-bound caveat as stream_shared_scan: run with
    SPARK_GRAFT_CPUS=4 so duplicate prefix work cannot hide in spare
    cores."""
    import itertools
    import os
    import shutil
    import tempfile
    import warnings

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict
    from etl_router_spark.streaming.group import run_streaming_group
    from etl_router_spark.streaming.runner import run_streaming

    N = int(os.environ.get("AB_STREAM_SHARED_N", "4"))
    root = os.path.join("/tmp/etl_out/ab_stream_mixed", Path(sf_dir).name)
    src = os.path.join(root, "in")
    if not os.path.exists(src):
        spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .write.mode("overwrite").parquet(src)
    seq = itertools.count()

    def pipes(tag: str, run_id: int):
        ps = []
        for i in range(N):
            out = f"{root}/{tag}_{run_id}_{i}"
            shutil.rmtree(out, ignore_errors=True)
            tail = [
                {"id": "keep", "type": "transform",
                 "config": {"transform_type": "filter",
                            "condition": {
                                "type": "expression",
                                "expression":
                                    f"substring(fp, {i + 1}, 1) != 'f'"}}}]
            if i == N - 1:  # the stateful-tail member the guard routes out
                tail.append(
                    {"id": "one_per_lang", "type": "transform",
                     "config": {"transform_type": "dedupe",
                                "key_fields": ["lang"], "keep": "first"}})
            ps.append(parse_manifest_dict({
                "apiVersion": "etl.dev/v1", "kind": "Pipeline",
                "metadata": {"name": f"{tag}-p{i}"},
                "spec": {"stages": [
                    {"id": "src", "type": "source",
                     "config": {"source_type": "file", "format": "parquet",
                                "path": src}},
                    {"id": "feat", "type": "transform",
                     "config": {"transform_type": "map", "mappings": [
                         {"target": "doc_id", "source": "doc_id"},
                         {"target": "lang", "source": "lang"},
                         {"target": "fp",
                          "expression": "sha2(repeat(text, 64), 512)"}]}},
                    *tail,
                    {"id": "out", "type": "sink",
                     "config": {"sink_type": "file", "format": "parquet",
                                "path": out}}]}}))
        return ps

    ck_root = tempfile.mkdtemp(prefix="ab_stream_mixed_ck_")

    def run_individual():
        run_id = next(seq)
        execs = [
            run_streaming(
                compile_pipeline(spark, p, streaming=True),
                f"{ck_root}/ind_{run_id}/{p.id}")
            for p in pipes("mind", run_id)
        ]
        for ex in execs:
            ex.await_termination()

    def run_guarded():
        run_id = next(seq)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # the guard's exclusion warning
            run_streaming_group(
                spark, pipes("mshr", run_id),
                f"{ck_root}/shr_{run_id}").await_termination()

    out: dict = {"experiment": "stream_mixed_group", "sf": sf_dir,
                 "n_pipelines": N, "stateful_members": 1, "arms": {}}
    out["arms"]["all_individual"] = _median_wall(run_individual, spark)
    out["arms"]["guarded_group"] = _median_wall(run_guarded, spark)
    return out


EXPERIMENTS = {
    "bloom_transport": bloom_transport,
    "dsir_cache": dsir_cache,
    "mix_counts": mix_counts,
    "shared_scan": shared_scan,
    "stream_shared_scan": stream_shared_scan,
    "stream_mixed_group": stream_mixed_group,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if sf_dir in ("-h", "--help") or not Path(sf_dir).is_dir():
        print(__doc__.strip())
        if sf_dir not in ("-h", "--help"):
            print(f"\nerror: {sf_dir!r} is not a directory",
                  file=sys.stderr)
            raise SystemExit(2)
        return
    from etl_router_spark.session import get_spark

    names = (sys.argv[2].split(",") if len(sys.argv) > 2
             else list(EXPERIMENTS))
    spark = get_spark("ab_measures")
    for name in names:
        print(json.dumps(EXPERIMENTS[name](spark, sf_dir)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
