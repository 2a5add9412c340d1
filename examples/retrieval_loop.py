"""The retrieval training loop, end to end — runnable demo.

BM25 retrieves, mining turns runs + judgments into contrastive
training pairs, evaluation scores the same runs — the three stages a
retriever's data pipeline cycles through:

  1. retrieve   -> bm25_topk (query docs against the corpus)
  2. mine       -> mine_hard_negatives (positives + the top-ranked
                   unjudged docs per query: DPR-style hard negatives)
  3. evaluate   -> retrieval_eval (trec_eval-style recall/MRR/nDCG)

Run:  python examples/retrieval_loop.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_router_spark import get_spark  # noqa: E402
from etl_router_spark.functions.indexing import (  # noqa: E402
    bm25_topk,
    mine_hard_negatives,
    retrieval_eval,
)
from etl_router_spark.io import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval_loop")
    docs = load_table(spark, sf_dir, "documents")

    # queries: three documents stand in for user queries; judgments:
    # same-source docs are relevant (own doc graded higher)
    q_ids = [r[0] for r in
             docs.select("doc_id").orderBy("doc_id").limit(3).collect()]
    queries = docs.filter(F.col("doc_id").isin(q_ids)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text"))
    qd = docs.filter(F.col("doc_id").isin(q_ids)).select(
        F.col("doc_id").alias("query_id"), "source")
    qrels = qd.join(
        docs.select("doc_id", F.col("source").alias("__s")),
        F.col("__s") == F.col("source"),
    ).select(
        "query_id", "doc_id",
        F.when(F.col("doc_id") == F.col("query_id"), 2.0)
         .otherwise(1.0).alias("rel"))

    runs = bm25_topk(docs, queries, k=10)
    print("top-3 of each run:")
    runs.filter("rank <= 3").orderBy("query_id", "rank").show()

    pairs = mine_hard_negatives(runs, qrels, n_negatives=3)
    n_pos = pairs.filter("label = 1").count()
    n_neg = pairs.filter("label = 0").count()
    gaps = pairs.filter("label = 1 AND rank IS NULL").count()
    print(f"training pairs: {n_pos} positives ({gaps} recall gaps), "
          f"{n_neg} hard negatives")
    pairs.orderBy("query_id", "label", "rank").show(10)

    print("retrieval quality (the numbers the next training round moves):")
    retrieval_eval(runs, qrels, k=10).orderBy("query_id").show()
    assert n_pos > 0 and n_neg > 0
    print("retrieve -> mine -> evaluate loop complete")


if __name__ == "__main__":
    main()
