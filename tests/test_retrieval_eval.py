"""retrieval_eval: metrics match hand-computed trec_eval semantics on
a fixture with graded relevance, a perfect run scores 1.0 everywhere,
judged-but-unretrieved queries surface as zero rows, and the stage is
declarable in a manifest."""

from __future__ import annotations

import math

import pytest

from etl_router_spark.functions.indexing import retrieval_eval


def _fixture(spark):
    runs = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3),
         ("q2", "y", 1), ("q2", "d", 2), ("q2", "z", 3),
         # beyond-k rows must be ignored at k=3
         ("q1", "c", 4)],
        "query_id string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        [("q1", "a", 2.0), ("q1", "b", 1.0), ("q1", "c", 1.0),
         ("q2", "d", 1.0),
         ("q3", "e", 1.0),          # judged, never retrieved
         ("q1", "junk", 0.0)],      # rel <= 0 is unjudged: dropped
        "query_id string, doc_id string, rel double")
    return runs, qrels


def test_hand_computed_metrics(spark):
    runs, qrels = _fixture(spark)
    got = {r["query_id"]: r.asDict()
           for r in retrieval_eval(runs, qrels, k=3).collect()}

    q1 = got["q1"]
    assert (q1["hits"], q1["n_rel"]) == (2, 3)
    assert q1["recall"] == round(2 / 3, 6)
    assert q1["precision"] == round(2 / 3, 6)
    assert q1["mrr"] == 1.0
    # relevant at ranks 1 (prec 1/1) and 3 (prec 2/3), / min(n_rel, k)
    assert q1["ap"] == round((1.0 + 2 / 3) / 3, 6)
    dcg = 3.0 / math.log2(2) + 1.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert q1["ndcg"] == round(dcg / idcg, 6)

    q2 = got["q2"]
    assert (q2["hits"], q2["n_rel"]) == (1, 1)
    assert q2["recall"] == 1.0
    assert q2["precision"] == round(1 / 3, 6)
    assert q2["mrr"] == 0.5
    assert q2["ap"] == 0.5
    assert q2["ndcg"] == round((1.0 / math.log2(3)) / 1.0, 6)

    # q3 judged but absent from runs: present, all-zero metrics
    q3 = got["q3"]
    assert (q3["hits"], q3["n_rel"]) == (0, 1)
    assert (q3["recall"], q3["precision"], q3["mrr"],
            q3["ap"], q3["ndcg"]) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_perfect_run_scores_one(spark):
    qrels = spark.createDataFrame(
        [("q", chr(97 + i), float(3 - i % 3)) for i in range(5)],
        "query_id string, doc_id string, rel double")
    # ideal ordering: rel desc, doc_id asc — exactly retrieval_eval's
    # IDCG ordering, so every metric must saturate
    ideal = sorted(qrels.collect(), key=lambda r: (-r["rel"], r["doc_id"]))
    runs = spark.createDataFrame(
        [(r["query_id"], r["doc_id"], i + 1) for i, r in enumerate(ideal)],
        "query_id string, doc_id string, rank int")
    row = retrieval_eval(runs, qrels, k=5).collect()[0]
    assert (row["recall"], row["mrr"], row["ap"], row["ndcg"]) == \
        (1.0, 1.0, 1.0, 1.0)
    assert row["precision"] == 1.0


def test_ap_cutoff_normalization(spark):
    # n_rel (20) > k (3): a run whose top-3 are all relevant must get
    # ap = 1.0 under the min(n_rel, k) convention, not 3/20
    qrels = spark.createDataFrame(
        [("q", f"d{i}", 1.0) for i in range(20)],
        "query_id string, doc_id string, rel double")
    runs = spark.createDataFrame(
        [("q", "d0", 1), ("q", "d1", 2), ("q", "d2", 3)],
        "query_id string, doc_id string, rank int")
    row = retrieval_eval(runs, qrels, k=3).collect()[0]
    assert row["ap"] == 1.0
    assert row["recall"] == round(3 / 20, 6)


def test_custom_column_names(spark):
    runs = spark.createDataFrame(
        [(1, 7, 1)], "qid int, did int, pos int")
    qrels = spark.createDataFrame(
        [(1, 7, 1.0)], "qid int, did int, grade double")
    row = retrieval_eval(
        runs, qrels, k=1, query_id_col="qid", doc_id_col="did",
        rank_col="pos", rel_col="grade").collect()[0]
    assert row["qid"] == 1 and row["ndcg"] == 1.0


def test_manifest_stage(spark, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    runs, qrels = _fixture(spark)
    runs_path = str(tmp_path / "runs")
    qrels_path = str(tmp_path / "qrels")
    runs.write.parquet(runs_path)
    qrels.write.parquet(qrels_path)
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "receval"},
        "spec": {"stages": [
            {"id": "src", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": runs_path}},
            {"id": "op", "type": "transform",
             "config": {"transform_type": "retrieval_eval", "k": 3,
                        "qrels": {"source_type": "file",
                                  "format": "parquet",
                                  "path": qrels_path}}},
            {"id": "out", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o")}},
        ]},
    })
    out = compile_pipeline(spark, pipeline).sink_frames["out"]
    got = {r["query_id"]: r["hits"] for r in out.collect()}
    assert got == {"q1": 2, "q2": 1, "q3": 0}
