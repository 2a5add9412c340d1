"""WARC/WET archive source (sources/warc.py): parser unit tests plus
the Spark DataSource round trip — plain, gzip member-per-record
(CommonCrawl layout), record-type filtering, and malformed-input
fail-fast."""

from __future__ import annotations

import gzip
import io
import os
import zlib

import pytest

from etl_router_spark.sources.warc import (
    parse_warc_stream,
    write_wet,
)

RECORDS = [
    {"url": "http://example.com/a", "payload": "hello world"},
    # payload containing CRLFs and a line that LOOKS like a header —
    # Content-Length framing must carry it through untouched
    {"url": "http://example.com/b",
     "payload": "line1\r\nContent-Length: 99\r\n\r\nWARC/1.0\r\nline2"},
    # non-ASCII text
    {"url": "http://example.com/c", "payload": "café ☃ 你好"},
    {"url": "http://example.com/d", "payload": ""},
]


def _warcinfo():
    return {
        "url": "http://example.com/info",
        "payload": "software: fixture",
        "record_type": "warcinfo",
        "content_type": "application/warc-fields",
    }


def test_roundtrip_plain(tmp_path):
    p = str(tmp_path / "f.warc.wet")
    assert write_wet(p, [_warcinfo()] + RECORDS) == 5
    with open(p, "rb") as fh:
        out = list(parse_warc_stream(fh, record_types=("conversion",)))
    assert [r["payload"] for r in out] == [r["payload"] for r in RECORDS]
    assert [r["url"] for r in out] == [r["url"] for r in RECORDS]
    assert all(r["record_type"] == "conversion" for r in out)
    # content_length counts UTF-8 BYTES, not characters
    assert out[2]["content_length"] == len(RECORDS[2]["payload"].encode())


def test_roundtrip_gzip_members(tmp_path):
    """CommonCrawl layout: each record its own gzip member, concatenated."""
    p = str(tmp_path / "f.warc.wet.gz")
    write_wet(p, [_warcinfo()] + RECORDS, gzip_members=True)
    # verify it truly is multi-member: decompressing only the first
    # member must not yield the whole file
    with open(p, "rb") as fh:
        blob = fh.read()
    d = zlib.decompressobj(31)  # wbits=31: one gzip member only
    first = d.decompress(blob)
    assert d.unused_data  # further members follow
    assert b"example.com/a" not in first  # member 1 is the warcinfo only
    with gzip.open(p, "rb") as fh:
        out = list(parse_warc_stream(fh, record_types=("conversion",)))
    assert [r["url"] for r in out] == [r["url"] for r in RECORDS]


def test_no_type_filter_keeps_warcinfo(tmp_path):
    p = str(tmp_path / "f.warc.wet")
    write_wet(p, [_warcinfo()] + RECORDS[:1])
    with open(p, "rb") as fh:
        out = list(parse_warc_stream(fh))
    assert [r["record_type"] for r in out] == ["warcinfo", "conversion"]
    assert out[0]["content_type"] == "application/warc-fields"


def test_min_length_filter(tmp_path):
    p = str(tmp_path / "f.warc.wet")
    write_wet(p, RECORDS)
    with open(p, "rb") as fh:
        out = list(parse_warc_stream(fh, min_length=1))
    assert [r["url"] for r in out] == [r["url"] for r in RECORDS if r["payload"]]


def test_malformed_inputs():
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_stream(io.BytesIO(b"not a warc\r\n")))
    trunc = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 100\r\n\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_stream(io.BytesIO(trunc)))
    headless = b"WARC/1.0\r\nWARC-Type: conversion\r\n"  # EOF inside headers
    with pytest.raises(ValueError, match="EOF inside header"):
        list(parse_warc_stream(io.BytesIO(headless)))


def test_spark_datasource_roundtrip(spark, tmp_path):
    """One InputPartition per archive: two files -> two partitions; rows
    survive the Python DataSource boundary with the declared schema."""
    from etl_router_spark.sources.registry import read_source

    d = str(tmp_path / "arch")
    os.makedirs(d)
    write_wet(os.path.join(d, "seg-00000.warc.wet"), [_warcinfo()] + RECORDS[:2])
    write_wet(os.path.join(d, "seg-00001.warc.wet.gz"), RECORDS[2:],
              gzip_members=True)
    df = read_source(spark, {"source_type": "warc", "path": d})
    assert df.rdd.getNumPartitions() == 2
    rows = sorted(df.collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == [r["url"] for r in RECORDS]
    assert rows[1].payload == RECORDS[1]["payload"]
    assert rows[0].content_length == len("hello world")
    # warcinfo filtered by the default record_types
    assert all(r.record_type == "conversion" for r in rows)


def test_spark_record_types_and_min_length(spark, tmp_path):
    from etl_router_spark.sources.registry import read_source

    d = str(tmp_path / "arch2")
    os.makedirs(d)
    write_wet(os.path.join(d, "seg.warc.wet"), [_warcinfo()] + RECORDS)
    df = read_source(spark, {
        "source_type": "warc", "path": d,
        "record_types": ["warcinfo"], "min_length": 1,
    })
    assert [r.url for r in df.collect()] == ["http://example.com/info"]


def test_streaming_rejected(spark):
    from etl_router_spark.sources.registry import read_source

    with pytest.raises(ValueError, match="batch corpus source"):
        read_source(spark, {"source_type": "warc", "path": "/tmp/x"},
                    streaming=True)
