"""RocksDB state store provider (the 100 TB streaming-state posture).

SCALE.md claims stateful streaming scales past executor heap via the
RocksDB state store; this pins that the provider actually loads and
serves a stateful query on this Spark build (rocksdbjni is bundled),
so the claim is a config flip, not an aspiration.
"""

from __future__ import annotations

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def test_stateful_stream_on_rocksdb_state_store(spark, tmp_path):
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        src = str(tmp_path / "in")
        spark.createDataFrame(
            [(i, f"k{i % 5}") for i in range(1000)], "id long, k string"
        ).write.parquet(src)
        schema = spark.read.parquet(src).schema
        out = str(tmp_path / "out")
        q = (
            spark.readStream.schema(schema).parquet(src)
            .groupBy("k").agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory").queryName("rocksdb_counts")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
        got = {r.k: r.n for r in spark.sql(
            "SELECT * FROM rocksdb_counts").collect()}
        assert got == {f"k{i}": 200 for i in range(5)}
        # the state operator must actually be RocksDB-backed: its
        # custom metrics namespace is provider-specific
        metrics = progress["stateOperators"][0]["customMetrics"]
        assert any(m.startswith("rocksdb") for m in metrics), metrics
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
