"""Condition truth tables, mirroring the reference matcher tests
(``routing/src/tests.rs:248-469``) including missing-key / two-valued
semantics (SURVEY §2.4 caveat)."""

from __future__ import annotations

import pytest

from etl_router_spark.compile.conditions import compile_condition
from etl_router_spark.model.conditions import Condition as C


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        ("user.event", {"status": "active", "score": "7.5", "env": "prod"}),
        ("user.event", {"status": "inactive", "score": "not-a-number"}),
        ("system.log", {}),  # no metadata keys at all
        ("user.event", None),  # null metadata map
    ]
    return spark.createDataFrame(rows, "record_type string, metadata map<string,string>")


def ids_matching(df, cond):
    rows = df.withColumn("__i", __import__("pyspark.sql.functions", fromlist=["monotonically_increasing_id"]).monotonically_increasing_id())
    # simpler: collect matched record_type+status pairs
    out = df.filter(compile_condition(cond)).collect()
    return [(r.record_type, (r.metadata or {}).get("status")) for r in out]


def test_record_type(records):
    got = ids_matching(records, C.record_type("system.log"))
    assert got == [("system.log", None)]


def test_metadata_exists(records):
    got = ids_matching(records, C.metadata_exists("status"))
    assert len(got) == 2


def test_metadata_equals_missing_key_is_false(records):
    got = ids_matching(records, C.metadata_equals("status", "active"))
    assert got == [("user.event", "active")]


def test_not_on_missing_key_is_true(records):
    # reference: Not(MetadataEquals) on missing key = true (matcher.rs:43-45 + 73-78)
    got = ids_matching(records, C.not_(C.metadata_equals("status", "active")))
    assert len(got) == 3  # everything except the active row


def test_numeric_compare_unparsable_is_false(records):
    got = ids_matching(records, C.metadata_gt("score", 5.0))
    assert got == [("user.event", "active")]
    # not(gt) includes the unparsable and missing rows
    got = ids_matching(records, C.not_(C.metadata_gt("score", 5.0)))
    assert len(got) == 3


def test_numeric_boundary(records):
    assert len(ids_matching(records, C.metadata_gte("score", 7.5))) == 1
    assert len(ids_matching(records, C.metadata_gt("score", 7.5))) == 0
    assert len(ids_matching(records, C.metadata_lte("score", 7.5))) == 1


def test_regex_match(records):
    got = ids_matching(records, C.metadata_match("env", "^pr.*"))
    assert len(got) == 1


def test_invalid_regex_raises_at_compile_time(records):
    with pytest.raises(ValueError, match="invalid regex"):
        compile_condition(C.metadata_match("env", "(unclosed"))


def test_and_or_nesting(records):
    cond = C.and_(
        C.record_type("user.event"),
        C.or_(C.metadata_equals("status", "active"), C.metadata_equals("status", "inactive")),
    )
    assert len(ids_matching(records, cond)) == 2


def test_always_never(records):
    assert len(ids_matching(records, C.always())) == 4
    assert len(ids_matching(records, C.never())) == 0


def test_empty_and_is_true_empty_or_is_false(records):
    assert len(ids_matching(records, C.and_())) == 4
    assert len(ids_matching(records, C.or_())) == 0


def test_expression_condition(records):
    got = ids_matching(records, C.expression("record_type like 'user%'"))
    assert len(got) == 3


def test_expression_null_collapses_false(records):
    # expression over null metadata -> null -> false; Not -> true
    cond = C.not_(C.expression("metadata['status'] = 'active'"))
    assert len(ids_matching(records, cond)) == 3


def test_condition_dict_roundtrip():
    cond = C.and_(
        C.record_type("user.event"),
        C.not_(C.metadata_gt("score", 5)),
        C.or_(C.metadata_exists("env"), C.never()),
    )
    assert C.from_dict(cond.to_dict()) == cond
