"""MongoDB wire codec + hermetic server (sources/mongo_wire.py).

Pure-socket tests, no SparkSession. The Spark-side end-to-end path
(staging read via ``source_type: mongodb``) is value-checked by the
``source_mongodb_wire_roundtrip`` oracle gate.
"""

from __future__ import annotations

import pytest

from etl_router_spark.sources.mongo_wire import (
    MongoWireClient,
    MongoWireServer,
    bson_decode,
    bson_encode,
    match,
)


def test_bson_roundtrip_scalar_subset():
    doc = {"s": "héllo", "i": 5, "neg": -7, "big": 2**40, "d": 1.25,
           "t": True, "f": False, "n": None,
           "sub": {"x": 1, "deep": {"y": "z"}},
           "arr": [1, "two", None, {"y": 2.5}, [3, 4]]}
    assert bson_decode(bson_encode(doc)) == doc


def test_bson_unsupported_type_raises():
    with pytest.raises(TypeError):
        bson_encode({"bad": object()})


def test_filter_subset_semantics():
    d = {"k": 26, "tag": "a", "v": 1.5, "missing_is_null": None}
    assert match(d, {"tag": "a"})
    assert not match(d, {"tag": "b"})
    assert match(d, {"k": {"$gte": 26, "$lt": 27}})
    assert match(d, {"k": {"$mod": [13, 0]}})
    assert match(d, {"tag": {"$in": ["a", "b"]}})
    assert not match(d, {"nope": {"$gte": 0}})  # absent field never matches
    with pytest.raises(ValueError, match="unsupported filter operator"):
        match(d, {"k": {"$regex": "x"}})


def test_server_insert_find_getmore_paging():
    srv = MongoWireServer()
    try:
        cli = MongoWireClient("127.0.0.1", srv.port)
        try:
            assert cli.hello()["maxWireVersion"] >= 6
            docs = [{"k": i, "v": float(i) / 2,
                     "tag": "a" if i % 3 else "b"} for i in range(950)]
            assert cli.insert("appdb", "items", docs[:500]) == 500
            assert cli.insert("appdb", "items", docs[500:]) == 450
            # full drain pages through 5 cursor batches
            got = cli.find_all("appdb", "items", batch_size=200)
            assert [d["k"] for d in got] == list(range(950))
            # server-side filter + sort desc
            flt = cli.find_all("appdb", "items",
                               {"v": {"$gte": 100.0}, "tag": "a"},
                               sort={"k": -1}, batch_size=77)
            want = sorted((d for d in docs
                           if d["v"] >= 100.0 and d["tag"] == "a"),
                          key=lambda d: -d["k"])
            assert flt == want
            # unknown command surfaces as a failed ok:0 reply
            with pytest.raises(RuntimeError, match="no such command"):
                cli.command({"mapReduce": "items", "$db": "appdb"})
        finally:
            cli.close()
    finally:
        srv.close()


def test_find_on_empty_collection():
    srv = MongoWireServer()
    try:
        cli = MongoWireClient("127.0.0.1", srv.port)
        try:
            assert cli.find_all("nodb", "nothing") == []
        finally:
            cli.close()
    finally:
        srv.close()
