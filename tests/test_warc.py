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


from hypothesis import given, settings
from hypothesis import strategies as st

_payloads = st.text(max_size=400)  # any unicode incl. CRLFs, header-lookalikes
_urls = st.from_regex(r"http://h\.example/[a-z0-9/]{0,40}", fullmatch=True)


@settings(max_examples=60, deadline=None)
@given(
    recs=st.lists(
        st.fixed_dictionaries({"url": _urls, "payload": _payloads}), max_size=12
    ),
    gz=st.booleans(),
)
def test_parser_roundtrip_property(tmp_path_factory, recs, gz):
    """write_wet -> parse_warc_stream is lossless for ANY unicode
    payload (Content-Length framing, not sentinel scanning): adjacent
    records never bleed, order is preserved, byte counts are UTF-8."""
    p = str(tmp_path_factory.mktemp("wprop") / ("f.wet" + (".gz" if gz else "")))
    write_wet(p, recs, gzip_members=gz)
    opener = gzip.open if gz else open
    with opener(p, "rb") as fh:
        out = list(parse_warc_stream(fh))
    assert [(r["url"], r["payload"]) for r in out] == [
        (r["url"], r["payload"]) for r in recs
    ]
    assert all(
        r["content_length"] == len(r["payload"].encode()) for r in out
    )


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


def test_commoncrawl_manifest_end_to_end(spark, tmp_path):
    """examples/manifests/commoncrawl-wet.yaml runs end to end over a
    staged WET dir: archive -> xxhash64 ids -> langid -> English filter
    -> Gopher drop -> exact dedup -> split assignment. The French doc,
    the sub-min_length doc, the low-quality doc, and one of the
    duplicate pair must not survive."""
    import os

    import yaml

    from etl_router_spark.compile.pipeline import compile_pipeline
    from etl_router_spark.model.parser import parse_manifest_dict

    good = ("the quick brown fox jumps over a lazy dog and every word "
            "of this sentence is plain honest English prose that " * 3
            + "ends with the usual stopwords to be sure and that have with")
    docs = [
        ("http://a.example/keep1", good),
        ("http://a.example/keep2", good + " second distinct document body"),
        ("http://a.example/dupe", good),          # same text as keep1
        ("http://a.example/short", "the and of is tiny"),   # gopher: <50 words
        ("http://a.example/french", "le chat est sur la table et les "
         "autres le regardent " * 20),            # langid: fr
    ]
    d = str(tmp_path / "segments")
    os.makedirs(d)
    write_wet(os.path.join(d, "seg-00000.warc.wet.gz"),
              [{"url": u, "payload": t} for u, t in docs], gzip_members=True)

    with open("examples/manifests/commoncrawl-wet.yaml") as fh:
        doc = yaml.safe_load(fh)
    doc["spec"]["stages"][0]["config"]["path"] = d
    doc["spec"]["stages"][0]["config"]["min_length"] = 30  # keeps 'short' for gopher to drop
    doc["spec"]["stages"][-1]["config"]["path"] = str(tmp_path / "out")
    out = compile_pipeline(spark, parse_manifest_dict(doc)).sink_frames["shard"]
    rows = out.collect()
    urls = sorted(r.url for r in rows)
    assert urls == ["http://a.example/keep1", "http://a.example/keep2"] or urls == [
        "http://a.example/dupe", "http://a.example/keep2"]  # dedup keeps one of the pair
    assert all(r.split in ("train", "val", "test") for r in rows)
    assert all(r.lang_pred == "en" for r in rows)


def test_warc_sink_roundtrip(spark, tmp_path):
    """Export half: DataFrame -> per-partition WET archives (atomic
    publish) -> read back through the warc source identical. Extra
    columns ignored; custom field names honored."""
    from etl_router_spark.sinks.registry import write_sink
    from etl_router_spark.sources.registry import read_source

    out = str(tmp_path / "export")
    df = spark.createDataFrame(
        [(i, f"http://e.example/{i}", f"document body {i} with text", "en")
         for i in range(20)],
        "doc_id long, link string, text string, lang string",
    ).repartition(3)
    write_sink(df, {"sink_type": "warc", "path": out,
                    "url_field": "link", "payload_field": "text"})
    import glob as g

    files = g.glob(out + "/part-*.warc.wet.gz")
    assert len(files) == 3  # one archive per partition
    assert not g.glob(out + "/.part-*")  # no uncommitted temps
    back = read_source(spark, {"source_type": "warc", "path": out})
    rows = sorted(back.collect(), key=lambda r: r.url)
    assert len(rows) == 20
    assert rows[0].payload == "document body 0 with text"
    assert all(r.record_type == "conversion" for r in rows)


def test_warc_sink_missing_column_fails_fast(spark, tmp_path):
    from etl_router_spark.sinks.registry import write_sink

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="url.*not in input schema"):
        write_sink(df, {"sink_type": "warc", "path": str(tmp_path / "o"),
                        "payload_field": "text"})


def test_streaming_rejected(spark):
    from etl_router_spark.sources.registry import read_source

    with pytest.raises(ValueError, match="batch corpus source"):
        read_source(spark, {"source_type": "warc", "path": "/tmp/x"},
                    streaming=True)
