"""leakage_safe_splits: every near-dup cluster lands in exactly one
split, singletons reduce to plain assign_splits, transitive chains
(a-b, b-c) stay together even when a and c were never paired, and the
stage is declarable in a manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_router_spark.functions.corpus import assign_splits, leakage_safe_splits

FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_clusters_never_straddle(spark):
    docs = _docs(spark)
    # 40 pairs: (0,1), (2,3), ... — each cluster must share one split
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(40)], "id_a long, id_b long")
    out = leakage_safe_splits(docs, pairs, FRACTIONS, salt="s").collect()
    split = {r["doc_id"]: r["split"] for r in out}
    group = {r["doc_id"]: r["split_group"] for r in out}
    assert len(out) == 200
    for i in range(40):
        assert split[2 * i] == split[2 * i + 1]
        assert group[2 * i] == group[2 * i + 1] == 2 * i


def test_transitive_chain_shares_split(spark):
    docs = _docs(spark, 10)
    # chain 0-1, 1-2, 2-3: no direct (0,3) pair, same split regardless
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["split_group"], r["split"])
           for r in leakage_safe_splits(docs, pairs, FRACTIONS,
                                        salt="x").collect()}
    assert {out[i] for i in range(4)} == {out[0]}
    assert out[0][0] == 0


def test_singletons_match_assign_splits(spark):
    docs = _docs(spark)
    empty = docs.sparkSession.createDataFrame([], "id_a long, id_b long")
    got = {r["doc_id"]: r["split"]
           for r in leakage_safe_splits(docs, empty, FRACTIONS,
                                        salt="42").collect()}
    want = {r["doc_id"]: r["split"]
            for r in assign_splits(docs, "doc_id", FRACTIONS,
                                   salt="42").collect()}
    assert got == want


def test_per_doc_hashing_would_leak(spark):
    # the property the operator exists for: on the SAME pairs, plain
    # per-doc assign_splits puts at least one pair across splits
    docs = _docs(spark, 400)
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(100)], "id_a long, id_b long")
    naive = {r["doc_id"]: r["split"]
             for r in assign_splits(docs, "doc_id", FRACTIONS,
                                    salt="s").collect()}
    leaked = sum(1 for i in range(100)
                 if naive[2 * i] != naive[2 * i + 1])
    assert leaked > 0
    safe = {r["doc_id"]: r["split"]
            for r in leakage_safe_splits(docs, pairs, FRACTIONS,
                                         salt="s").collect()}
    assert all(safe[2 * i] == safe[2 * i + 1] for i in range(100))


def test_manifest_stage(spark, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)]
        + [(100 + i, f"unique text {i} with words {i * 7} more") for i in range(5)],
        "doc_id long, text string").write.parquet(src)
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "lsplits"},
        "spec": {"stages": [
            {"id": "s", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": src}},
            {"id": "t", "type": "transform",
             "config": {"transform_type": "leakage_splits",
                        "method": "simhash", "max_hamming": 3,
                        "bits": 32,
                        "fractions": {"train": 0.5, "test": 0.5},
                        "salt": "m"}},
            {"id": "o", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "out")}},
        ]},
    })
    rows = compile_pipeline(spark, pipeline).sink_frames["o"].collect()
    assert len(rows) == 25
    # the 20 identical docs are one cluster: one split for all
    dup_splits = {r["split"] for r in rows if r["doc_id"] < 100}
    assert len(dup_splits) == 1
    assert {r["split"] for r in rows} <= {"train", "test"}
