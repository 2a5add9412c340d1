"""Does the r11 occupancy guard's auto mode actually recover the r10
recall collapse? One focused measurement on the degenerate clustered
fixture (IVFPQ_RECALL_r10.json's regime: sigma 0.15, within-cluster
spread below PQ quantizer resolution, occupancy ~ n/c).

Arms, same queries / same index / same k:
- off:  shortlist as the caller set it (undersized, the r10 collapse)
- auto: occupancy_guard="auto" raises the shortlist to the p95 cell
        occupancy before stage 1 runs

Usage: python scripts/ivfpq_guard_check.py [n] [clusters] [shortlist]
Writes IVFPQ_RECALL_r11.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 10
N_QUERIES = 32


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_router_spark.functions.pq import ivfpq_rerank_topk, pq_train
    from etl_router_spark.functions.similarity import train_ivf_centroids
    from etl_router_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    shortlist = int(sys.argv[3]) if len(sys.argv) > 3 else 80

    spark = get_spark("ivfpq_guard_check")
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from ivfpq_recall import make_clustered

    d = make_clustered(spark, n, n_clusters, sigma=0.15)
    emb = spark.read.parquet(f"{d}/embeddings.parquet") \
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS embedding")
    emb.persist().count()
    books = pq_train(emb, m=16, k=32, max_iter=10)
    cents = train_ivf_centroids(emb, n_centroids=n_clusters)

    q = emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0)
    c = emb.selectExpr("vec_id AS neighbor_id", "embedding AS cv")
    qq = q.selectExpr("vec_id AS query_id", "embedding AS qv")
    l2 = ("round(aggregate(zip_with(qv, cv, (a,b) -> (a-b)*(a-b)), 0D, "
          "(acc,x) -> acc+x), 6)")
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    truth = {(r.query_id, r.neighbor_id) for r in
             F.broadcast(qq).join(c, F.col("query_id") != F.col("neighbor_id"))
             .selectExpr("query_id", "neighbor_id", f"{l2} AS d")
             .withColumn("rank", F.row_number().over(w))
             .filter(f"rank <= {K}").collect()}

    def recall(guard: str) -> float:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = {(r.query_id, r.neighbor_id) for r in ivfpq_rerank_topk(
                q, emb, books, k=K, shortlist=shortlist, nprobe=4,
                centroids=cents, occupancy_guard=guard).collect()}
        return round(len(got & truth) / len(truth), 3)

    occ = (emb.selectExpr("vec_id").count() // n_clusters)
    out = {"fixture": {"n": n, "clusters": n_clusters, "sigma": 0.15,
                       "mean_occupancy": occ},
           "k": K, "nprobe": 4, "caller_shortlist": shortlist,
           "recall": {"guard_off": recall("off"),
                      "guard_auto": recall("auto")}}
    print(json.dumps(out))
    with open(Path(__file__).resolve().parent.parent
              / "IVFPQ_RECALL_r11.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
