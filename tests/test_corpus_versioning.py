"""epoch_upsample (budget-driven epoch repetition with a cap) and
snapshot_diff (digest-based corpus-version diff): hand-computed repeat
counts, cap/fraction regimes, null-safe digests, all four statuses,
and the manifest stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.corpus import epoch_upsample, snapshot_diff


def _corpus(spark):
    # domain a: 4 docs x 100 units; domain b: 2 docs x 100 units
    rows = [(i, "a", 100) for i in range(4)] + [(10 + i, "b", 100) for i in range(2)]
    return spark.createDataFrame(rows, "doc_id long, source string, n long")


def test_integer_epochs_exact(spark):
    # budget 1200, weights a=1,b=1 -> t_d=600 each;
    # a: 600/400 = 1.5 epochs; b: 600/200 = 3.0 epochs
    out = epoch_upsample(_corpus(spark), {"a": 1.0, "b": 1.0}, 1200,
                         size_col="n", max_epochs=4.0, salt="t").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # b docs appear exactly 3x with epochs 1,2,3
    assert sorted(by_doc[10]) == [1, 2, 3]
    assert sorted(by_doc[11]) == [1, 2, 3]
    # a docs appear 1 or 2 times; total a copies = 4*1.5 = 6 only if the
    # hash fraction selects exactly half — assert the bounds instead
    a_counts = [len(by_doc.get(i, [])) for i in range(4)]
    assert all(c in (1, 2) for c in a_counts)


def test_cap_binds(spark):
    # huge budget: every domain would run 100s of epochs; cap at 2
    out = epoch_upsample(_corpus(spark), {"a": 1.0, "b": 1.0}, 10_000_000,
                         size_col="n", max_epochs=2.0, salt="t")
    counts = (out.groupBy("doc_id").count().collect())
    assert all(r["count"] == 2 for r in counts)
    assert len(counts) == 6


def test_unlisted_domain_dropped_and_tiny_budget_drops(spark):
    out = epoch_upsample(_corpus(spark), {"a": 1.0}, 1, size_col="n",
                         max_epochs=4.0, salt="t")
    # domain b unlisted -> gone; budget 1 -> epochs_a = 1/400 ~ 0.0025:
    # at most a couple of docs selected, epoch always 1
    rows = out.collect()
    assert all(r["source"] == "a" and r["epoch"] == 1 for r in rows)


def test_rows_mode_without_size_col(spark):
    # unit = rows: budget 6 over weights a=2,b=1 -> t_a=4, t_b=2;
    # a: 4/4 = 1.0 epochs, b: 2/2 = 1.0 epochs -> every doc exactly once
    out = epoch_upsample(_corpus(spark), {"a": 2.0, "b": 1.0}, 6,
                         max_epochs=4.0, salt="t")
    assert out.count() == 6
    assert out.groupBy("doc_id").count().filter("count != 1").count() == 0


def test_epoch_upsample_validates(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        epoch_upsample(df, {}, 100)
    with pytest.raises(ValueError):
        epoch_upsample(df, {"a": -1.0}, 100)
    with pytest.raises(ValueError):
        epoch_upsample(df, {"a": 1.0}, 0)


def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "x", "s1"), (2, "y", "s1"), (3, "z", None), (4, None, "s2")],
        "doc_id long, text string, source string")
    new = spark.createDataFrame(
        [(2, "y", "s1"),        # unchanged
         (3, "z2", None),       # changed
         (4, None, "s2"),       # unchanged (null text both sides)
         (5, "w", "s3")],       # added
        "doc_id long, text string, source string")
    return old, new


def test_snapshot_diff_statuses(spark):
    old, new = _snapshots(spark)
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_snapshot_diff_null_vs_empty_and_order(spark):
    # (NULL, 'a') must differ from ('a', NULL): sentinel + separator
    old = spark.createDataFrame([(1, None, "a")],
                                "doc_id long, c1 string, c2 string")
    new = spark.createDataFrame([(1, "a", None)],
                                "doc_id long, c1 string, c2 string")
    assert snapshot_diff(old, new).collect()[0]["status"] == "changed"


def test_snapshot_diff_explicit_cols(spark):
    old, new = _snapshots(spark)
    # comparing source only: doc 3's text edit becomes invisible
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new, compare_cols=["source"]).collect()}
    assert got[3] == "unchanged"
    with pytest.raises(ValueError):
        snapshot_diff(old.select("doc_id"), new.select("doc_id"))


def test_manifest_stages(spark, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    old, new = _snapshots(spark)
    old_path, new_path = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(old_path)
    new.write.parquet(new_path)
    pipeline = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "ver"},
        "spec": {"stages": [
            {"id": "s", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": new_path}},
            {"id": "d", "type": "transform",
             "config": {"transform_type": "snapshot_diff",
                        "baseline": {"source_type": "file",
                                     "format": "parquet",
                                     "path": old_path}}},
            {"id": "o", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o1")}},
        ]},
    })
    out = compile_pipeline(spark, pipeline).sink_frames["o"]
    assert {r["doc_id"]: r["status"] for r in out.collect()}[1] == "removed"

    corpus_path = str(tmp_path / "corpus")
    _corpus(spark).write.parquet(corpus_path)
    pipeline2 = parse_manifest_dict({
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "ep"},
        "spec": {"stages": [
            {"id": "s", "type": "source",
             "config": {"source_type": "file", "format": "parquet",
                        "path": corpus_path}},
            {"id": "e", "type": "transform",
             "config": {"transform_type": "epoch_upsample",
                        "weights": {"a": 1.0, "b": 1.0},
                        "token_budget": 1200, "size_field": "n",
                        "max_epochs": 4.0, "salt": "t"}},
            {"id": "o", "type": "sink",
             "config": {"sink_type": "file", "format": "parquet",
                        "path": str(tmp_path / "o2")}},
        ]},
    })
    out2 = compile_pipeline(spark, pipeline2).sink_frames["o"]
    b_counts = (out2.filter("source = 'b'").groupBy("doc_id").count()
                .collect())
    assert all(r["count"] == 3 for r in b_counts)
