"""Envelope record model (SURVEY §1.5, ``proto/common.proto``):
wrap -> predicate on metadata -> promote to typed columns -> demote."""

from __future__ import annotations

from etl_router_spark.compile.conditions import compile_condition
from etl_router_spark.model.conditions import Condition as C
from etl_router_spark.model.envelope import ENVELOPE_COLUMNS, demote, promote, wrap


def test_wrap_promote_round_trip(spark, events):
    env = wrap(events.limit(100), record_type="user.event", source_id="fixtures",
               key_field="user_id", event_time_field="ts",
               metadata_fields=["event_type"])
    assert list(env.columns) == list(ENVELOPE_COLUMNS)
    row = env.first()
    assert row.record_type == "user.event"
    assert row.metadata["event_type"] in {"click", "view", "purchase", "signup", "error"}
    assert row.idempotency_key and len(row.idempotency_key) == 64

    # metadata predicates compile against the envelope (matcher.rs surface)
    purchases = env.filter(compile_condition(C.metadata_equals("event_type", "purchase")))
    assert purchases.count() == events.limit(100).filter("event_type = 'purchase'").count()

    typed = promote(env, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                         "event_type STRING, value DOUBLE, props STRING")
    assert {"event_id", "user_id", "record_type", "metadata"} <= set(typed.columns)
    assert "payload" not in typed.columns
    assert typed.count() == 100
    # typed values survive the JSON round trip
    orig = {r.event_id for r in events.limit(100).select("event_id").collect()}
    assert {r.event_id for r in typed.select("event_id").collect()} == orig


def test_demote_reserializes(spark, events):
    env = wrap(events.limit(10), record_type="user.event", event_time_field="ts")
    typed = promote(env, "event_id BIGINT, user_id BIGINT, value DOUBLE")
    back = demote(typed, ["event_id", "user_id", "value"])
    assert "payload" in back.columns
    first = back.first()
    assert '"event_id"' in first.payload


def test_promote_drop_envelope(spark, events):
    env = wrap(events.limit(10), record_type="t", event_time_field="ts")
    bare = promote(env, "event_id BIGINT, user_id BIGINT", keep_envelope=False)
    assert set(bare.columns) == {"event_id", "user_id"}
