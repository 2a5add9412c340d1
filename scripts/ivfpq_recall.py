"""Measure IVF-PQ recall@k against exact L2 top-k across nprobe.

The unit tests prove recall >= 0.5 at toy size and that widening
nprobe widens recall; an operator a 100 TB user tunes needs the
recall-vs-nprobe CURVE at sweep scale next to the timing tables, the
way the exact->LSH crossover is documented in SCALE.md. This sweep
trains real codebooks (pq_train) and real coarse centroids
(train_ivf_centroids) per corpus, computes exact L2 ground truth for a
deterministic query sample, and reports recall@k for each nprobe:

    python scripts/gen_scale_data.py --out /tmp/sf1 --scale 10   # once
    python scripts/ivfpq_recall.py /root/testdata/sf0.1 /tmp/sf1

Output: one JSON line {"sweeps": [{sf, n, n_cells, recall: {nprobe:
r@k}, adc_recall, wall: {...}}]} plus a markdown table on stderr ready
for SCALE.md. n_cells follows the ``auto`` occupancy rule
(ceil(n/256)) so the measured curve is the one the defaults produce.

A positional argument of the form ``clustered:N:C`` generates a
mixture-of-C-Gaussians fixture of N 64-dim vectors (deterministic
seed) under /tmp and sweeps that instead of a testdata dir: the
fixture embeddings are near-uniform random — the documented PQ WORST
case (no subvector structure to quantize, ADC ceiling 0.19 at 20k) —
while real embedding spaces are clustered (SemDeDup's operating
assumption), so the clustered sweep shows users the realistic ceiling
next to the adversarial one.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 10
NPROBES = (1, 2, 4, 8)
N_QUERIES = 32


def sweep(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_router_spark.functions.pq import ivfpq_topk, pq_adc_topk, pq_train
    from etl_router_spark.functions.similarity import train_ivf_centroids
    from etl_router_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.persist()
    n = emb.count()
    n_cells = max(1, math.ceil(n / 256))  # the n_cells="auto" rule

    t0 = time.perf_counter()
    books = pq_train(emb, m=16, k=32, max_iter=10)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    cents = train_ivf_centroids(emb, n_centroids=n_cells, max_iter=10)
    t_cents = time.perf_counter() - t0

    # deterministic ~N_QUERIES query sample, id-hash spaced through the
    # corpus (lowest-id queries would correlate with the stand-in
    # centroid recipe; trained centroids make it moot, hash anyway)
    stride = max(1, n // N_QUERIES)
    q = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(stride)) == 0)

    # exact L2 ground truth (PQ approximates L2, so recall is measured
    # against the metric it approximates, not cosine)
    qq = q.selectExpr("vec_id AS query_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    cc = emb.selectExpr("vec_id AS neighbor_id", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
    l2 = ("round(aggregate(zip_with(qv, cv, (a,b) -> (a-b)*(a-b)), "
          "0D, (acc,x) -> acc+x), 6)")
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc())
    truth_df = (
        F.broadcast(qq)
        .join(cc, F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"{l2} AS d")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id")
    )
    truth = {(r.query_id, r.neighbor_id) for r in truth_df.collect()}

    def recall_of(df) -> float:
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return round(len(got & truth) / len(truth), 3)

    # full-corpus ADC (nprobe = all cells): the quantization-error
    # ceiling — IVF pruning can only lose recall relative to this
    t0 = time.perf_counter()
    adc_recall = recall_of(pq_adc_topk(q, emb, books, k=K, method="blas"))
    t_adc = time.perf_counter() - t0

    recalls: dict[str, float] = {}
    walls: dict[str, float] = {}
    for nprobe in NPROBES:
        if nprobe > n_cells:
            continue
        t0 = time.perf_counter()
        recalls[str(nprobe)] = recall_of(
            ivfpq_topk(q, emb, books, k=K, nprobe=nprobe, centroids=cents))
        walls[str(nprobe)] = round(time.perf_counter() - t0, 2)
    # two-stage re-rank: exact L2 over the top-`shortlist` ADC
    # candidates — the recipe that raises the quantization ceiling
    # (ivfpq_rerank_topk); measured at the mid nprobe
    from etl_router_spark.functions.pq import ivfpq_rerank_topk

    np_rr = min(4, n_cells)
    rerank: dict[str, float] = {}
    for shortlist in (2 * K, 4 * K, 8 * K):
        t0 = time.perf_counter()
        rerank[f"np{np_rr}_s{shortlist}"] = recall_of(
            ivfpq_rerank_topk(q, emb, books, k=K, shortlist=shortlist,
                              nprobe=np_rr, centroids=cents))
        walls[f"rerank_s{shortlist}"] = round(time.perf_counter() - t0, 2)
    emb.unpersist()
    return {
        "sf": sf_dir, "n": n, "dim": 64, "n_cells": n_cells,
        "n_queries": q.count(), "k": K,
        "adc_recall_ceiling": adc_recall,
        "recall": recalls, "rerank_recall": rerank, "wall_sec": walls,
        "train_sec": {"pq": round(t_train, 1), "ivf": round(t_cents, 1),
                      "adc_full": round(t_adc, 1)},
    }


def make_clustered(spark, n: int, n_clusters: int, sigma: float = 0.15,
                   dim: int = 64, seed: int = 1337) -> str:
    """Write a mixture-of-Gaussians embeddings.parquet under /tmp and
    return its directory. Cluster centers ~ N(0,1); ``sigma`` is the
    within-cluster noise scale. sigma ~0.5 models trained-encoder
    embedding spaces (separable clusters with resolvable internal
    structure); sigma 0.15 is the DEGENERATE regime where within-
    cluster spread sits below PQ quantizer resolution — every member
    shares a code, ADC cannot rank inside a cluster, and only exact
    re-rank with a shortlist >= cluster occupancy recovers recall."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n)
    vecs = centers[assign] + sigma * rng.standard_normal((n, dim))
    out_dir = f"/tmp/ivfpq_clustered_n{n}_c{n_clusters}_s{sigma}"
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    (spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
     .repartition(8)
     .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet"))
    return out_dir


def main() -> None:
    from etl_router_spark.session import get_spark

    spark = get_spark("ivfpq_recall")
    dirs = []
    for a in sys.argv[1:]:
        if a.startswith("clustered:"):
            parts = a.split(":")
            sigma = float(parts[3]) if len(parts) > 3 else 0.15
            dirs.append(make_clustered(spark, int(parts[1]),
                                       int(parts[2]), sigma))
        else:
            dirs.append(a)
    out = [sweep(spark, d) for d in dirs]
    print(json.dumps({"sweeps": out}))
    print("| corpus | n | cells | " +
          " | ".join(f"r@{K} np={p}" for p in NPROBES) +
          " | ADC ceiling |", file=sys.stderr)
    print("|---" * (len(NPROBES) + 4) + "|", file=sys.stderr)
    for s in out:
        cells = " | ".join(str(s["recall"].get(str(p), "—")) for p in NPROBES)
        print(f"| {s['sf']} | {s['n']} | {s['n_cells']} | {cells} | "
              f"{s['adc_recall_ceiling']} |", file=sys.stderr)
        rr = ", ".join(f"{k2}={v}" for k2, v in s.get("rerank_recall", {}).items())
        print(f"#   two-stage re-rank: {rr}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
