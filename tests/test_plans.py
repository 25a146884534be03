"""Plan-property regression guards: the scale behaviors documented in
SCALE.md, asserted on the real executed plans so a future edit that silently
adds a shuffle, drops a pushdown, or un-broadcasts a dimension fails CI."""

from __future__ import annotations

import pytest

from hadoop_2_7_1_spark.queries import REGISTRY

from .conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    df.collect()  # execute THIS plan so AQE finalizes and codegen spans appear
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-execution plan; keep only the final one
    return plan.split("== Initial Plan ==")[0]


def test_scan_agg_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "tq6_forecast_revenue")
    # date/discount/quantity predicates reach the parquet scan
    assert "PushedFilters: [" in plan and "IsNotNull" in plan
    # column pruning: only the needed lineitem columns are read
    assert "l_comment" not in plan.split("ReadSchema")[1].split("\n")[0]
    # map-side combine: partial then final HashAggregate
    assert plan.count("HashAggregate") >= 2


def test_dim_join_broadcasts(spark):
    plan = plan_of(spark, "tq3_shipping_priority")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_secondary_sort_single_shuffle(spark):
    plan = plan_of(spark, "q06_secondary_sort")
    # one grouping exchange; no global-window Sort over the whole dataset
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_total_sort_is_range_partitioned(spark):
    plan = plan_of(spark, "q11_total_sort")
    assert "rangepartitioning" in plan


def test_semi_anti_join_operators(spark):
    plan = plan_of(spark, "q18_semi_anti")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_wordcount_stays_in_codegen(spark):
    plan = plan_of(spark, "q01_wordcount")
    # codegen spans render as "*(n) Node" in executedPlan.toString
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_knn_join_is_equi_join_no_cartesian(spark):
    plan = plan_of(spark, "sim_knn_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
