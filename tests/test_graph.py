"""Unit tests for functions/graph.py (degrees, PageRank, triangles).

Known-answer graphs pin the semantics the oracle gates then verify at
fixture scale: exact triangle counts on cliques, PageRank's fixpoint
on a symmetric cycle, mass conservation with dangling nodes, and the
degree-ordered orientation handling hubs without wedge explosion.
"""

from __future__ import annotations

import pytest

from etl_router_spark.functions.graph import (
    degree_stats,
    pagerank,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, schema="src string, dst string")


def test_degree_stats_counts_directions(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                       ("a", "b"),  # duplicate edge collapses
                       ("b", "b")])  # self-loop drops
    rows = {r["id"]: r for r in degree_stats(e, "src", "dst").collect()}
    assert rows["a"].out_degree == 2 and rows["a"].in_degree == 1
    assert rows["b"].out_degree == 1 and rows["b"].in_degree == 1
    assert rows["c"].out_degree == 1 and rows["c"].in_degree == 2
    assert all(r.degree == r.out_degree + r.in_degree for r in rows.values())


def test_pagerank_two_node_cycle_is_uniform(spark):
    # a <-> b: the uniform vector is the exact fixpoint from iteration 0
    pr = {r["id"]: r["pagerank"]
          for r in pagerank(_edges(spark, [("a", "b"), ("b", "a")]),
                            "src", "dst", iterations=3).collect()}
    assert pr["a"] == pytest.approx(0.5, abs=1e-12)
    assert pr["b"] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_conserves_mass_with_dangling(spark):
    # b and d are dangling; total mass must stay exactly 1 every round
    e = _edges(spark, [("a", "b"), ("a", "d"), ("c", "b")])
    out = pagerank(e, "src", "dst", iterations=5).collect()
    assert sum(r["pagerank"] for r in out) == pytest.approx(1.0, abs=1e-9)
    pr = {r["id"]: r["pagerank"] for r in out}
    # b receives from two sources, d from one: b must outrank d
    assert pr["b"] > pr["d"] > pr["a"]


def test_pagerank_hand_computed_one_iteration(spark):
    # a->b only, N=2: dangling = pr(b)
    #   pr1(a) = 0.15/2 + 0.85 * (0.5/2)             = 0.2875
    #   pr1(b) = 0.15/2 + 0.85 * (0.5 + 0.5/2)       = 0.7125
    pr = {r["id"]: r["pagerank"]
          for r in pagerank(_edges(spark, [("a", "b")]),
                            "src", "dst", iterations=1).collect()}
    assert pr["a"] == pytest.approx(0.2875, abs=1e-12)
    assert pr["b"] == pytest.approx(0.7125, abs=1e-12)


def test_triangle_count_k4(spark):
    # K4: every node sits in C(3,2) = 3 triangles
    nodes = ["a", "b", "c", "d"]
    e = _edges(spark, [(u, v) for u in nodes for v in nodes if u < v])
    rows = {r["id"]: r["triangles"] for r in triangle_count(e, "src", "dst").collect()}
    assert rows == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_count_square_has_none(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert triangle_count(e, "src", "dst").count() == 0


def test_triangle_count_direction_blind_and_dedup(spark):
    # triangle given with mixed directions + a reversed duplicate edge
    e = _edges(spark, [("a", "b"), ("c", "b"), ("a", "c"), ("c", "a")])
    rows = {r["id"]: r["triangles"] for r in triangle_count(e, "src", "dst").collect()}
    assert rows == {"a": 1, "b": 1, "c": 1}


def test_triangle_count_hub_orientation(spark):
    # hub h connects to k spokes; spokes form a path: triangles exist
    # only where consecutive spokes are linked. Degree ordering points
    # spoke->hub, so the hub (degree 6) fans out almost nothing.
    e = _edges(spark, [("h", f"s{i}") for i in range(6)]
               + [(f"s{i}", f"s{i + 1}") for i in range(5)])
    rows = {r["id"]: r["triangles"] for r in triangle_count(e, "src", "dst").collect()}
    # 5 triangles (h, s_i, s_i+1); hub in all 5, s0/s5 in 1, middles in 2
    assert rows["h"] == 5
    assert rows["s0"] == 1 and rows["s5"] == 1
    assert all(rows[f"s{i}"] == 2 for i in range(1, 5))


def test_pagerank_small_graph_broadcasts_ranks(spark):
    # under broadcast_nodes the contribution join must be a broadcast
    # hash join (the edge set never reshuffles across rounds). The
    # returned frame is a localCheckpoint scan, so read the round's
    # executed plan from the SQL status store instead.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    store = spark._jsparkSession.sharedState().statusStore()
    before = store.executionsCount()
    pagerank(e, "src", "dst", iterations=1)
    execs = store.executionsList()
    descs = [
        execs.apply(i).physicalPlanDescription()
        for i in range(before, execs.size())
    ]
    round_plans = [d for d in descs if "BroadcastHashJoin" in d]
    assert round_plans, "no broadcast join in any pagerank round plan"
    assert all("CartesianProduct" not in d for d in descs)


def test_pagerank_large_graph_path_does_not_broadcast_ranks(spark):
    # broadcast_nodes=0 forces the scale path: rank vector joins by
    # shuffle, no broadcast of node-cardinality data
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    pr = pagerank(e, "src", "dst", iterations=1, broadcast_nodes=0)
    rows = {r["id"]: r["pagerank"] for r in pr.collect()}
    small = {r["id"]: r["pagerank"]
             for r in pagerank(e, "src", "dst", iterations=1).collect()}
    # both paths agree exactly (cycle: uniform fixpoint)
    for k in rows:
        assert rows[k] == pytest.approx(small[k], abs=1e-12)


def test_triangle_plan_has_no_cartesian(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    plan = (triangle_count(e, "src", "dst")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan


def test_weighted_pagerank_uniform_weights_match_unweighted(spark):
    # equal weights on every edge must reproduce the unweighted ranks
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    ew = e.selectExpr("src", "dst", "2.5 AS w")
    plain = {r["id"]: r["pagerank"]
             for r in pagerank(e, "src", "dst", iterations=4).collect()}
    weighted = {r["id"]: r["pagerank"]
                for r in pagerank(ew, "src", "dst", iterations=4,
                                  weight_col="w").collect()}
    for k in plain:
        assert weighted[k] == pytest.approx(plain[k], abs=1e-12)


def test_weighted_pagerank_mass_follows_weight(spark):
    # a -> b (weight 9), a -> c (weight 1): b must strongly outrank c
    ew = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0)], "src string, dst string, w double")
    pr = {r["id"]: r["pagerank"]
          for r in pagerank(ew, "src", "dst", iterations=3,
                            weight_col="w").collect()}
    assert pr["b"] > pr["c"]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_reliable_checkpoint_dir(spark, tmp_path):
    # checkpoint_dir= swaps the per-round localCheckpoint for a
    # fault-tolerant reliable checkpoint(): results identical, and
    # RDD checkpoint blocks actually land under the directory
    ck = str(tmp_path / "ck")
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    local = {r["id"]: r["pagerank"]
             for r in pagerank(e, "src", "dst", iterations=3).collect()}
    reliable = {r["id"]: r["pagerank"]
                for r in pagerank(e, "src", "dst", iterations=3,
                                  checkpoint_dir=ck).collect()}
    for k in local:
        assert reliable[k] == pytest.approx(local[k], abs=1e-12)
    import glob
    assert glob.glob(ck + "/*/rdd-*"), "no reliable checkpoint data written"


def test_triangle_count_releases_cache(spark):
    # the oriented-edge cache must not survive the call (storage leak
    # in long-lived sessions); result materializes via localCheckpoint
    before = {r.id() for r in
              spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    out = triangle_count(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]), "src", "dst")
    assert {r["id"]: r["triangles"] for r in out.collect()} == {
        "a": 1, "b": 1, "c": 1}
    leaked = [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
              if r.id() not in before and "localCheckpoint" not in r.name()]
    assert not [r for r in leaked if r.numCachedPartitions() > 0
                and "Exchange" in (r.name() or "")], leaked
