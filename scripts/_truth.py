"""Shared exact-L2 ground-truth helpers for the measurement scripts.

ONE definition of the ground truth (L2 rounding, tie rule,
self-exclusion) and of the hash-spaced query sampling, imported by
both ``ivfpq_recall_arms.py`` and ``retrieval_chain_timing.py`` —
SCALE.md compares ``recall_at_10`` across their artifacts, so the
two scripts must score against the *same* truth definition; two
hand-kept copies silently diverge.
"""

from __future__ import annotations


def hash_spaced_sample(df, max_rows: int, id_col: str = "vec_id"):
    """A deterministic ~``max_rows``-row sample, hash-spaced over the
    id column (lowest-id sampling would correlate with the stand-in
    centroid recipe, which seeds from the lowest ids)."""
    from pyspark.sql import functions as F

    n = df.count()
    stride = max(1, n // max_rows)
    return df.filter(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)


def exact_l2_topk(emb, queries, k: int = 10) -> set:
    """Exact L2 top-``k`` per query (rounded distance, ascending
    neighbor-id tie rule, self-excluded), as a set of
    (query_id, neighbor_id) — ~|queries| x |corpus| scored rows, the
    queries broadcast so the corpus never shuffles."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    qq = queries.selectExpr("vec_id AS query_id",
                            "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    cc = emb.selectExpr("vec_id AS neighbor_id",
                        "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
    l2 = ("round(aggregate(zip_with(qv, cv, (a,b) -> (a-b)*(a-b)), "
          "0D, (acc,x) -> acc+x), 6)")
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc())
    return {(r.query_id, r.neighbor_id) for r in (
        F.broadcast(qq)
        .join(cc, F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"{l2} AS d")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
        .collect())}
