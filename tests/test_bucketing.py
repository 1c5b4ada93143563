"""Bucketed co-located join: both sides pre-placed by bucket hash, so
the join plan contains no Exchange — the property that deletes the two
biggest shuffles of a fact-to-fact join at scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from healthcare_oltp_to_olap_gcp_spark.catalog import table
from healthcare_oltp_to_olap_gcp_spark.sources import bucketed

from .conftest import SF001


@pytest.mark.fullsweep
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    events = table(spark, SF001, "events")
    user_totals = events.groupBy("user_id").agg(F.count("*").alias("n"))

    bucketed.write_bucketed(events, "ev_bucketed", "user_id")
    bucketed.write_bucketed(user_totals, "ut_bucketed", "user_id")

    # Disable broadcast so the planner must consider the shuffle join —
    # the situation bucketing exists for (two large sides at scale).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.bucketed_join(spark, "ev_bucketed", "ut_bucketed", "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # both sides pre-bucketed
        assert joined.count() == events.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
