"""Bucketed catalog tables: the pay-the-shuffle-once join path.

Two tables bucketed on the same keys with the same bucket count must
join without any Exchange in the physical plan — that is the whole
point of bucketing at scale (SCALE.md). The test pins it by asserting
on the executed plan, not just that results are correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_router_spark.io import write_bucketed
from etl_router_spark.sinks.registry import write_sink


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so small test tables take the SMJ path
    (bucketing is invisible under a broadcast join)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", bucket_by=["l_orderkey"], buckets=4,
                   path=str(tmp_path / "b_lineitem"))
    write_bucketed(orders, "b_orders", bucket_by=["o_orderkey"], buckets=4,
                   path=str(tmp_path / "b_orders"))
    try:
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # correctness: same row count as the shuffle join over raw files
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(li, "b_li_agg", bucket_by=["l_orderkey"], buckets=4,
                   path=str(tmp_path / "b_li_agg"))
    try:
        agg = spark.table("b_li_agg").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_table_sink_config_roundtrip(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_sink(orders, {
        "sink_type": "table", "table": "b_sink_orders",
        "bucket_by": ["o_custkey"], "buckets": 4,
        "path": str(tmp_path / "b_sink_orders"),
    })
    try:
        back = spark.table("b_sink_orders")
        assert back.count() == orders.count()
        # bucket metadata survives in the catalog
        desc = spark.sql("DESCRIBE EXTENDED b_sink_orders").toPandas()
        blob = " ".join(str(v) for v in desc["data_type"])
        assert "o_custkey" in blob and "4" in blob
    finally:
        spark.sql("DROP TABLE IF EXISTS b_sink_orders")
