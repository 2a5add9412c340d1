"""Term statistics / indexing / corpus ordering: TF-IDF, heavy
hitters, inverted index, group top-k, deterministic global shuffle.
Semantics pinned on micro-fixtures; the global shuffle's distributed
rank is checked for contiguity and seed determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.corpus import global_shuffle, group_topk
from etl_router_spark.functions.indexing import heavy_hitters, inverted_index, tfidf_topk


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple", "web"),
            (2, "banana cherry", "web"),
            (3, "cherry cherry cherry date", "book"),
            (4, "unique", "book"),
        ],
        "doc_id long, text string, source string",
    )


def test_tfidf_values(corpus):
    rows = tfidf_topk(corpus, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, {})[r.term] = r
    # doc 1: apple tf=2 df=1 -> 2*ln(4/1); banana tf=1 df=2 -> ln(2)
    assert by_doc[1]["apple"].tfidf == round(2 * math.log(4), 6)
    assert by_doc[1]["banana"].tfidf == round(math.log(2), 6)
    assert by_doc[1]["apple"].rank == 1
    # k=2 cap holds per doc
    assert all(len(terms) <= 2 for terms in by_doc.values())


def test_heavy_hitters_order_and_ties(corpus):
    rows = heavy_hitters(corpus, k=3).collect()
    assert [r.term for r in rows] == ["cherry", "apple", "banana"]  # 4, 2, 2 — tie apple<banana
    assert rows[0].n_occurrences == 4 and rows[0].n_docs == 2


def test_inverted_index_caps(corpus):
    rows = {r.term: r for r in inverted_index(corpus, min_df=2).collect()}
    assert set(rows) == {"banana", "cherry"}  # df>=2 only
    assert rows["banana"].doc_ids == [1, 2] and rows["banana"].df_t == 2
    capped = inverted_index(corpus, min_df=2, max_postings=1).collect()
    assert all(len(r.doc_ids) == 1 for r in capped)


def test_group_topk(corpus):
    rows = group_topk(corpus.withColumn("n", F.length("text")), "source", "n", k=1).collect()
    best = {r.source: r.doc_id for r in rows}
    assert best == {"web": 1, "book": 3}  # longest text per source
    assert all(r.rank == 1 for r in rows)


def test_global_shuffle_contiguous_and_deterministic(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = global_shuffle(df, seed=3, num_shards=8).collect()
    assert sorted(r.shuffle_pos for r in a) == list(range(500))  # a permutation
    b = {r.doc_id: r.shuffle_pos for r in global_shuffle(df, seed=3, num_shards=3).collect()}
    assert {r.doc_id: r.shuffle_pos for r in a} == b  # shard count irrelevant
    c = {r.doc_id: r.shuffle_pos for r in global_shuffle(df, seed=4, num_shards=8).collect()}
    assert {r.doc_id: r.shuffle_pos for r in a} != c  # seed changes the order


def test_indexing_manifests(spark, sf_dir, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest

    manifest = f"""
apiVersion: etl.dev/v1
kind: Pipeline
metadata: {{name: idx}}
spec:
  stages:
    - id: docs
      type: source
      config: {{source_type: file, format: parquet, path: {sf_dir}/documents.parquet}}
    - id: scores
      type: transform
      config: {{transform_type: tfidf, k: 3}}
    - id: out
      type: sink
      config: {{sink_type: file, format: parquet, path: {tmp_path}/tfidf}}
"""
    compile_pipeline(spark, parse_manifest(manifest)).run()
    back = spark.read.parquet(f"{tmp_path}/tfidf")
    assert {"id", "term", "tfidf", "rank"} <= set(back.columns)
    assert back.count() > 0


def test_bm25_randomized_vs_duckdb(spark):
    """Randomized corpora + queries: bm25_topk must match a DuckDB
    re-implementation of the same formula exactly (rounded scores,
    rank order, top-k membership)."""
    import random

    import duckdb

    from etl_router_spark.functions.indexing import bm25_topk

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 25))))
            for i in range(60)]
    queries = [(qid, " ".join(rng.sample(vocab, k=3))) for qid in range(4)]

    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_topk(ddf, qdf, k=7).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    con.execute("CREATE TABLE qs(query_id BIGINT, query_text VARCHAR)")
    con.executemany("INSERT INTO qs VALUES (?, ?)", queries)
    k1p1, k1, b, omb = repr(1.2 + 1), repr(1.2), repr(0.75), repr(1 - 0.75)
    want = sorted(tuple(r) for r in con.execute(f"""
        WITH terms AS (
          SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+')) AS term
          FROM docs),
        tf AS (SELECT id, term, count(*) AS tf FROM terms
               WHERE term <> '' GROUP BY id, term),
        dl AS (SELECT id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY id),
        dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS dft FROM tf GROUP BY term),
        stats AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM docs) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        q AS (SELECT query_id,
                     unnest(list_distinct(string_split_regex(trim(query_text), '\\s+'))) AS term
              FROM qs),
        scored AS (
          SELECT q.query_id, tf.id,
                 round(sum(
                   ln(1 + (s.n - d.dft + 0.5) / (d.dft + 0.5))
                   * tf.tf * {k1p1}
                   / (tf.tf + {k1} * ({omb} + {b} * dl.dl / s.avgdl))), 6) AS score
          FROM q JOIN tf ON q.term = tf.term
          JOIN dfreq d ON d.term = q.term
          JOIN dl ON dl.id = tf.id
          CROSS JOIN stats s
          GROUP BY q.query_id, tf.id)
        SELECT query_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, id) AS INT) AS rank,
               id AS doc_id, score
        FROM scored QUALIFY rank <= 7
    """).fetchall())
    assert got == want
