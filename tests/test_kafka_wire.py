"""Kafka wire codec + hermetic broker (sources/kafka_wire.py).

Pure-socket tests, no SparkSession. The Spark-side end-to-end path
(staging read -> from_kafka -> promote) is value-checked by the
``source_kafka_wire_roundtrip`` oracle gate.
"""

from __future__ import annotations

import pytest

from etl_router_spark.sources.kafka_wire import (
    KafkaWireBroker,
    KafkaWireProducer,
    build_record_batch,
    crc32c,
    dec_varint,
    enc_varint,
    parse_record_batch,
)

RECS = [
    (1700000000000, b"k1", b'{"a":1}', [("src", b"wire")]),
    (1700000000123, None, b'{"a":2}', []),
    (1700000000456, b"k3", None, [("h", None)]),
]


def test_crc32c_public_vectors():
    # RFC 3720 §B.4 / Castagnoli reference vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint_zigzag_roundtrip():
    for v in [0, 1, -1, 63, 64, 127, 128, -300, 10**12, -(10**12)]:
        raw = enc_varint(v)
        got, i = dec_varint(raw, 0)
        assert (got, i) == (v, len(raw))


def test_record_batch_roundtrip_nulls_and_headers():
    batch = build_record_batch(5, RECS)
    base, out = parse_record_batch(batch)
    assert base == 5 and len(out) == 3
    assert out[0] == {"timestamp": 1700000000000, "key": b"k1",
                      "value": b'{"a":1}', "headers": [("src", b"wire")]}
    assert out[1]["key"] is None
    assert out[2]["value"] is None and out[2]["headers"] == [("h", None)]


def test_record_batch_crc_rejects_corruption():
    bad = bytearray(build_record_batch(0, RECS))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_record_batch(bytes(bad))


def test_broker_produce_roundtrip_offsets():
    got: list[tuple] = []
    broker = KafkaWireBroker(lambda *rec: got.append(rec),
                             topics={"events": 4})
    try:
        p = KafkaWireProducer("127.0.0.1", broker.port)
        try:
            vers = p.api_versions()
            assert vers[0] == (0, 3)  # Produce up to v3
            assert p.metadata("events") == [0, 1, 2, 3]
            assert p.produce("events", 2, RECS) == 0
            # offsets continue per partition across produce calls
            assert p.produce("events", 2, RECS[:1]) == 3
            assert p.produce("events", 0, RECS[:1]) == 0
        finally:
            p.close()
    finally:
        broker.close()
    assert len(got) == 5
    assert [r[2] for r in got if r[1] == 2] == [0, 1, 2, 3]
    topic, part, offset, ts, key, value, headers = got[0]
    assert (topic, part, offset) == ("events", 2, 0)
    assert key == b"k1" and value == b'{"a":1}' and headers == [("src", b"wire")]


def test_broker_unknown_topic_metadata_error():
    broker = KafkaWireBroker(lambda *rec: None, topics={"events": 1})
    try:
        p = KafkaWireProducer("127.0.0.1", broker.port)
        try:
            with pytest.raises(AssertionError, match="topic error"):
                p.metadata("nope")
        finally:
            p.close()
    finally:
        broker.close()


def test_fetch_roundtrip_consumer():
    broker = KafkaWireBroker(topics={"events": 2})
    try:
        from etl_router_spark.sources.kafka_wire import KafkaWireConsumer

        p = KafkaWireProducer("127.0.0.1", broker.port)
        try:
            assert p.api_versions()[1] == (0, 4)  # Fetch up to v4
            p.produce("events", 0, RECS)
            p.produce("events", 0, RECS[:1])
        finally:
            p.close()
        c = KafkaWireConsumer("127.0.0.1", broker.port)
        try:
            hw, records = c.fetch("events", 0, offset=0)
            assert hw == 4 and [r["offset"] for r in records] == [0, 1, 2, 3]
            assert records[0]["key"] == b"k1"
            assert records[3]["value"] == b'{"a":1}'
            assert records[0]["headers"] == [("src", b"wire")]
            # batch-granular resume: offset 3 returns only batch 2
            hw, tail = c.fetch("events", 0, offset=3)
            assert hw == 4 and [r["offset"] for r in tail] == [3]
            # empty partition
            hw, none = c.fetch("events", 1, offset=0)
            assert hw == 0 and none == []
        finally:
            c.close()
    finally:
        broker.close()


def test_record_batch_property_roundtrip():
    # randomized structural coverage: any combination of null/empty
    # keys, values, headers, and timestamp spreads must survive the
    # wire encode/parse exactly
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blob = st.one_of(st.none(), st.binary(max_size=64))
    header = st.tuples(st.text(max_size=8), blob)
    record = st.tuples(
        st.integers(min_value=0, max_value=2**42),  # timestamp ms
        blob, blob, st.lists(header, max_size=3),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(record, min_size=1, max_size=8),
           st.integers(min_value=0, max_value=2**31))
    def check(records, base_offset):
        base, out = parse_record_batch(build_record_batch(base_offset, records))
        assert base == base_offset
        assert [(r["timestamp"], r["key"], r["value"], r["headers"])
                for r in out] == records

    check()
