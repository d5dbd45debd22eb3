"""Physical-plan assertions — the scale properties README/SCALE.md claim,
encoded as tests so a refactor can't silently regress them:
pushdown+pruning on scans, broadcast star joins, two-phase aggregation,
WindowGroupLimit top-k, broadcast (not shuffled) ANN corpus."""

from __future__ import annotations

import pytest

from as_etl_storage_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    plan = plan_of(spark, "s1_scan_project_filter")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan
    # projection pruned to exactly the 4 requested columns
    assert "l_extendedprice" in plan and "l_shipdate" not in plan


def test_star_join_broadcasts(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_aggregate_is_two_phase(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # partial + final HashAggregate around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "q_window_rank")
    assert "WindowGroupLimit" in plan


def test_ann_corpus_not_shuffled(spark):
    plan = plan_of(spark, "ann_topk_bruteforce")
    # query side broadcast; corpus side must not hash-exchange before the join
    assert "BroadcastNestedLoopJoin" in plan


def test_range_join_broadcasts(spark):
    plan = plan_of(spark, "q_range_join")
    assert "BroadcastHashJoin" in plan


def test_lsh_join_is_equi_not_cartesian(spark):
    plan = plan_of(spark, "ann_lsh_bucket")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
