"""Kafka wire shape -> envelope mapping (no broker needed: the Kafka
source's output schema is fixed, so a synthetic frame of the same shape
exercises the exact mapping used in production)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from etl_router_spark.model.envelope import from_kafka, promote

KAFKA_SCHEMA = T.StructType([
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("timestampType", T.IntegerType()),
    T.StructField("headers", T.ArrayType(T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("value", T.BinaryType()),
    ]))),
])


def _kafka_frame(spark):
    ts = dt.datetime(2026, 1, 1, 9, 0, 0)
    rows = [
        (b"u1", b'{"user_id": 1, "amount": 9.5}', "user-events", 0, 100, ts, 0,
         [("status", b"active"), ("region", b"eu")]),
        (b"u2", b'{"user_id": 2, "amount": 1.25}', "user-events", 1, 7, ts, 0, None),
    ]
    return spark.createDataFrame(rows, KAFKA_SCHEMA)


def test_from_kafka_envelope(spark):
    env = from_kafka(_kafka_frame(spark), record_type="user.event")
    rows = {r.sequence_number: r for r in env.collect()}
    r = rows[100]
    assert r.source_id == "user-events"
    assert r.partition == 0
    assert r.idempotency_key == "user-events:0:100"
    assert r.record_type == "user.event"
    assert r.metadata == {"status": "active", "region": "eu"}
    assert r.payload == '{"user_id": 1, "amount": 9.5}'
    assert rows[7].metadata is None


def test_from_kafka_then_promote(spark):
    env = from_kafka(_kafka_frame(spark))
    typed = promote(env, "user_id BIGINT, amount DOUBLE")
    got = {r.user_id: r.amount for r in typed.select("user_id", "amount").collect()}
    assert got == {1: 9.5, 2: 1.25}
    # envelope predicate surface retained next to typed columns
    assert typed.filter("metadata['status'] = 'active'").count() == 1


def test_idle_source_policy_applied(spark, events, tmp_path):
    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict
    from etl_router_spark.streaming import run_streaming

    src_dir = str(tmp_path / "in")
    events.limit(100).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)

    doc = {
        "apiVersion": "etl.dev/v1", "kind": "Pipeline",
        "metadata": {"name": "idle-fanin"},
        "spec": {
            "stages": [
                {"id": "a", "type": "source",
                 "config": {"source_type": "file", "path": src_dir, "format": "parquet"}},
                {"id": "b", "type": "source",
                 "config": {"source_type": "file", "path": src_dir, "format": "parquet"}},
                {"id": "merge", "type": "fan_in",
                 "config": {"inputs": [
                     {"watermark": {"event_time_field": "ts", "idle_timeout": "30s"}},
                     {"watermark": {"event_time_field": "ts"}},
                 ]}},
                {"id": "out", "type": "sink",
                 "config": {"sink_type": "file", "format": "parquet",
                            "path": str(tmp_path / "out")}},
            ],
            "edges": [
                {"from": "a", "to": "merge"}, {"from": "b", "to": "merge"},
                {"from": "merge", "to": "out"},
            ],
        },
    }
    pipeline = parse_manifest_dict(doc)
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")
    compiled = compile_pipeline(spark, pipeline, streaming=True,
                                source_overrides={"a": stream, "b": stream})
    execu = run_streaming(compiled, str(tmp_path / "ckpt"))
    assert spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy") == "max"
    execu.await_termination()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 200
