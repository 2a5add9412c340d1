"""Temporal joins: as-of (union-marker window) and bounded range join
(coarse-bucket equi-join). Semantics pinned against hand-computed
micro-fixtures; plan shape pinned to no nested-loop joins."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_router_spark.functions.joins import asof_join, range_join


def ts(s: str):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01T10:00:05"), 100.0),
            (2, "A", ts("2024-01-01T10:00:30"), 101.0),
            (3, "B", ts("2024-01-01T10:00:10"), 50.0),
            (4, "C", ts("2024-01-01T10:00:10"), 7.0),  # no quotes for C
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01T10:00:00"), 99.0),
            ("A", ts("2024-01-01T10:00:05"), 99.5),   # tie with trade 1 -> inclusive
            ("A", ts("2024-01-01T10:00:20"), 100.5),
            ("A", ts("2024-01-01T10:00:31"), 102.0),  # after trade 2 -> never matched
            ("B", ts("2024-01-01T10:00:11"), 51.0),   # after trade 3 -> no match
        ],
        "sym string, ts timestamp, bid double",
    )


def test_asof_backward_inclusive(trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="ts").orderBy("trade_id")
    rows = {r.trade_id: r for r in out.collect()}
    assert rows[1].bid_r == 99.5          # equal-ts quote matches (inclusive)
    assert rows[2].bid_r == 100.5         # latest at-or-before 10:00:30
    assert rows[3].bid_r is None          # only later quotes exist for B
    assert rows[4].bid_r is None          # no quotes at all for C
    assert rows[2].ts_r == ts("2024-01-01T10:00:20")
    assert out.count() == 4               # left join: every trade kept


def test_asof_tolerance(trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="ts", tolerance_sec=5)
    rows = {r.trade_id: r for r in out.collect()}
    assert rows[1].bid_r == 99.5          # 0s old: inside horizon
    assert rows[2].bid_r is None          # 10s old: expired
    assert rows[2].price == 101.0         # left payload intact


def test_asof_atomic_match(spark):
    # right columns with legitimate nulls must not mix rows: the match
    # is carried as one struct, so a null bid from the latest quote
    # stays null instead of borrowing an older quote's bid
    left = spark.createDataFrame([(1, "A", ts("2024-01-01T10:00:10"))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", ts("2024-01-01T10:00:00"), 1.0), ("A", ts("2024-01-01T10:00:05"), None)],
        "k string, ts timestamp, bid double",
    )
    row = asof_join(left, right, on="k", left_ts="ts").collect()[0]
    assert row.ts_r == ts("2024-01-01T10:00:05") and row.bid_r is None


def test_range_join_bounds(spark):
    left = spark.createDataFrame(
        [(1, "u", ts("2024-01-01T10:00:00"))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [
            (10, "u", ts("2024-01-01T09:59:59")),  # before window
            (11, "u", ts("2024-01-01T10:00:00")),  # lower bound inclusive
            (12, "u", ts("2024-01-01T10:04:00")),  # inside (different bucket)
            (13, "u", ts("2024-01-01T10:05:00")),  # upper bound inclusive
            (14, "u", ts("2024-01-01T10:05:01")),  # past upper
            (15, "v", ts("2024-01-01T10:01:00")),  # wrong key
        ],
        "id long, k string, ts timestamp",
    )
    out = range_join(left, right, "ts", "ts", 0.0, 300.0, on="k", bucket_sec=60.0)
    assert sorted(r.id_r for r in out.collect()) == [11, 12, 13]


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T10:00:00"))], "id long, ts timestamp")
    right = spark.createDataFrame([(2, ts("2024-01-01T10:01:00"))], "id long, ts timestamp")
    plan = range_join(left, right, "ts", "ts", 0.0, 300.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_forward_inclusive_and_tolerance(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, "L0"), (1, t0 + dt.timedelta(seconds=100), "L1")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, t0, 10.0),                                  # equal ts -> inclusive
            (1, t0 + dt.timedelta(seconds=130), 20.0),
        ],
        ["k", "ts", "v"],
    )
    out = {r["tag"]: r for r in
           asof_join(left, right, on="k", direction="forward").collect()}
    assert out["L0"]["v_r"] == 10.0          # equal-ts right row matches
    assert out["L1"]["v_r"] == 20.0          # earliest at-or-after
    tol = {r["tag"]: r for r in
           asof_join(left, right, on="k", direction="forward",
                     tolerance_sec=10.0).collect()}
    assert tol["L0"]["v_r"] == 10.0
    assert tol["L1"]["v_r"] is None          # 30s away > 10s horizon


def test_asof_nearest_picks_closer_and_breaks_ties_backward(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=100), "mid"),
         (1, t0 + dt.timedelta(seconds=250), "tie")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=90), 1.0),    # 10s before "mid"
         (1, t0 + dt.timedelta(seconds=103), 2.0),   # 3s after "mid"
         (1, t0 + dt.timedelta(seconds=200), 3.0),   # 50s before "tie"
         (1, t0 + dt.timedelta(seconds=300), 4.0)],  # 50s after "tie"
        ["k", "ts", "v"],
    )
    out = {r["tag"]: r["v_r"] for r in
           asof_join(left, right, on="k", direction="nearest").collect()}
    assert out["mid"] == 2.0      # forward match is closer
    assert out["tie"] == 3.0      # exact tie resolves backward


def test_asof_nearest_one_sided_matches(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, "only-forward")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=5), 7.0)], ["k", "ts", "v"]
    )
    out = asof_join(left, right, on="k", direction="nearest").collect()[0]
    assert out["v_r"] == 7.0

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="sideways")


class TestJoinStrategyHints:
    def _frames(self, spark):
        l = spark.createDataFrame([(1, "a"), (2, "b")], "k int, lv string")
        r = spark.createDataFrame([(1, "x"), (3, "y")], "k int, rv string")
        return l, r

    def test_each_strategy_pins_physical_join(self, spark):
        from etl_router_spark.compile.transforms import apply_join

        l, r = self._frames(spark)
        for strategy, node in [("broadcast", "BroadcastHashJoin"),
                               ("shuffle_hash", "ShuffledHashJoin"),
                               ("merge", "SortMergeJoin")]:
            out = apply_join(l, r, [{"left_key": "k", "right_key": "k"}],
                             strategy=strategy)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert node in plan, f"{strategy} -> expected {node}"
            assert {t["lv"] for t in out.collect()} == {"a"}

    def test_unknown_strategy_rejected(self, spark):
        import pytest as _pt

        from etl_router_spark.compile.transforms import apply_join

        l, r = self._frames(spark)
        with _pt.raises(ValueError):
            apply_join(l, r, [{"left_key": "k", "right_key": "k"}],
                       strategy="nested_loop")
