"""Physical-plan shape assertions: the properties that matter at 100 TB
(broadcast joins for dims, predicate pushdown into scans) must actually
appear in the executed plan, not just in docstrings."""

from __future__ import annotations

from healthcare_oltp_to_olap_gcp_spark.api import QUERIES

from .conftest import SF001


def _plan(spark, name: str) -> str:
    return (
        QUERIES[name](spark, SF001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_star_join_broadcasts_all_dims(spark):
    plan = _plan(spark, "fact_events_star")
    assert plan.count("BroadcastHashJoin") >= 4  # user/type/band/source dims
    assert "SortMergeJoin" not in plan  # the fact side must never shuffle


def test_q5_broadcasts_dims(spark):
    plan = _plan(spark, "q5_revenue_by_nation")
    assert "BroadcastHashJoin" in plan


def test_q3_pushes_segment_filter_to_scan(spark):
    plan = _plan(spark, "q3_top_revenue_orders")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # inside PushedFilters


def test_q1_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # only the 7 needed lineitem columns are read, not all 11
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_bloom_prejoin_broadcasts_bucket_set(spark):
    """The bucket prefilter must reach the fact as a broadcast semi-join
    BEFORE the real join — that ordering is the entire point of the
    operator at 100 TB."""
    plan = _plan(spark, "bloom_prejoin_revenue")
    semi = plan.find("BroadcastHashJoin [_bucket")
    assert semi != -1
    assert "LeftSemi" in plan


def test_incremental_fact_single_final_window(spark):
    """base ∪ delta re-dedup: exactly two window (row_number) passes —
    one for the base fact, one for the merge — and no extra joins."""
    plan = _plan(spark, "fact_events_incremental")
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2
