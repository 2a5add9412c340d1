"""A/B: Bloom h60 probe with per-position md5 recompute (current) vs
digest-hoisted probe (one md5 per gram per digest window group).

Hypothesis: the probe's exists/forall lambdas are evaluated by Spark's
INTERPRETED higher-order-function path (no whole-stage codegen, no
subexpression elimination), so the current expression computes the
same md5 digest ceil(k / (k//3 windows)) times — 3x at k=3. Hoisting
the digest into a transform() over the shingle array computes it once
per gram and must leave the flag values bit-identical (same digest,
same hex windows).

Run: python scripts/bloom_probe_hoist_ab.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from etl_router_spark.functions.corpus import _bloom_pos_sql, bloom_bitmap
from etl_router_spark.functions.text import shingles_sql, tokens_sql

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
M_BITS = 1 << 18
K = 3
N = 8


def hoisted_flag_sql(text_col: str, n: int, m_bits: int, k: int) -> str:
    """Digest-hoisted h60 probe: one md5 per gram per window group."""
    n_digests = (k + 2) // 3
    digs = ", ".join(
        f"md5(concat('bf', '{j}', '|', g))" for j in range(n_digests)
    )
    pos = []
    for i in range(k):
        j, w = divmod(i, 3)
        word = (f"CAST(conv(substring(element_at(ds, {j + 1}), "
                f"{1 + 10 * w}, 10), 16, 10) AS BIGINT)")
        pos.append(f"pmod({word}, {m_bits})")
    return (
        f"exists(transform({shingles_sql(tokens_sql(text_col), n)}, "
        f"g -> array({digs})), ds -> "
        f"forall(array({', '.join(pos)}), "
        "p -> (shiftright(element_at(__bf, CAST(p DIV 64 AS INT) + 1), "
        "CAST(p % 64 AS INT)) & 1) = 1))"
    )


def current_flag_sql(text_col: str, n: int, m_bits: int, k: int) -> str:
    pos = _bloom_pos_sql("g", m_bits, k, "h60")
    return (
        f"exists({shingles_sql(tokens_sql(text_col), n)}, g -> "
        f"forall(array({', '.join(pos)}), "
        "p -> (shiftright(element_at(__bf, CAST(p DIV 64 AS INT) + 1), "
        "CAST(p % 64 AS INT)) & 1) = 1))"
    )


def main():
    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "32g")
             .appName("bloom-probe-hoist-ab").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    words = bloom_bitmap(bench, n=N, m_bits=M_BITS, k=K, hash_family="h60")
    probe = corpus.withColumn("__bf", F.lit(words))

    arms = {
        "current_3x_md5": current_flag_sql("text", N, M_BITS, K),
        "hoisted_1x_md5": hoisted_flag_sql("text", N, M_BITS, K),
    }
    counts, times = {}, {}
    for name, sql in arms.items():
        fl = probe.withColumn("f", F.expr(sql))
        fl.filter("f").count()  # warm
        t = []
        for _ in range(REPS):
            t0 = time.time()
            c = fl.filter("f").count()
            t.append(time.time() - t0)
        counts[name] = c
        times[name] = sorted(t)[len(t) // 2]
    out = {"sf_dir": SF_DIR, "m_bits": M_BITS, "k": K, "n": N,
           "reps": REPS, "median_sec": times, "flag_counts": counts,
           "values_identical": len(set(counts.values())) == 1}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
