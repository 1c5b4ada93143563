"""Structural invariants of the co-purchase graph operators and the
attribution/CMS additions — properties the value-hash oracle can't
state (conservation laws, known-graph ground truth)."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from healthcare_oltp_to_olap_gcp_spark.catalog import table
from healthcare_oltp_to_olap_gcp_spark.operators.textquality import cms_token_counts
from healthcare_oltp_to_olap_gcp_spark.plans.analytics import (
    part_pagerank,
    part_triangles,
    view_purchase_attribution,
)

from .conftest import SF001


def _graph_df(spark, edges):
    """Build a lineitem-shaped frame whose baskets induce ``edges``:
    one 2-part order per edge."""
    rows = [
        (i, a, i * 10) for i, (a, _) in enumerate(edges)
    ] + [(i, b, i * 10 + 1) for i, (_, b) in enumerate(edges)]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long, x long")


def test_pagerank_mass_conservation(spark):
    """Ranks stay a probability distribution: each iteration maps a
    distribution to a distribution (undirected graph, no dangling
    mass), so the final ranks must sum to 1 up to rounding."""
    out = part_pagerank(table(spark, SF001, "lineitem")).collect()
    total = sum(r.pagerank for r in out)
    assert math.isclose(total, 1.0, abs_tol=1e-4)
    assert all(r.pagerank > 0 for r in out)


def test_pagerank_symmetry_on_regular_graph(spark):
    """On a cycle (2-regular), PageRank is exactly uniform."""
    cycle = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
    out = part_pagerank(_graph_df(spark, cycle)).collect()
    assert len(out) == 5
    assert len({r.pagerank for r in out}) == 1
    assert math.isclose(out[0].pagerank, 0.2, abs_tol=1e-6)


@pytest.mark.fullsweep
def test_pagerank_plan_depth_bounded(spark):
    """The rank lineage is localCheckpoint-ed every `checkpoint_every`
    rounds, so the logical plan must NOT grow linearly with iters: at
    13 iterations (2 checkpoints in) the analyzed-plan text must stay
    within 2x of the 3-iteration plan, and high-iteration ranks still
    sum to 1 (checkpointing is value-transparent)."""
    cycle = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]
    g = _graph_df(spark, cycle)

    def plan_len(iters):
        df = part_pagerank(g, iters=iters)
        return len(df._jdf.queryExecution().analyzed().toString())

    shallow, deep = plan_len(3), plan_len(13)
    assert deep <= 2 * shallow, (shallow, deep)
    out = part_pagerank(g, iters=13).collect()
    assert math.isclose(sum(r.pagerank for r in out), 1.0, abs_tol=1e-4)
    # and uniform on the 2-regular cycle regardless of iteration count
    assert len({r.pagerank for r in out}) == 1


def test_triangles_known_graph(spark):
    """K4 has 4 triangles; every node touches 3 of them and has
    clustering coefficient 1."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = {r.part: r for r in part_triangles(_graph_df(spark, k4)).collect()}
    assert set(out) == {1, 2, 3, 4}
    for r in out.values():
        assert r.degree == 3
        assert r.triangles == 3
        assert r.clustering_coeff == 1.0
    # global count: each triangle counted once per member
    assert sum(r.triangles for r in out.values()) == 3 * 4


def test_triangles_triangle_free(spark):
    """A star graph has zero triangles everywhere."""
    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    out = part_triangles(_graph_df(spark, star)).collect()
    assert all(r.triangles == 0 for r in out)
    hub = [r for r in out if r.part == 1][0]
    assert hub.degree == 4 and hub.clustering_coeff == 0.0


def test_attribution_conserves_attributed_value(spark):
    """Every purchase with ≥1 in-window view distributes exactly its
    value (up to per-touch rounding): day-rollup total == total value
    of attributed purchases."""
    events = table(spark, SF001, "events")
    out = view_purchase_attribution(events)
    attributed_total = out.agg(F.sum("attributed_revenue")).collect()[0][0]

    us = F.unix_micros("ts")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", us.alias("pus"), "value"
    )
    v = events.filter(F.col("event_type") == "view").select(
        "user_id", us.alias("vus")
    )
    win = 7 * 86_400 * 1_000_000
    covered = (
        p.join(v, "user_id")
        .filter((F.col("vus") < F.col("pus")) & (F.col("vus") >= F.col("pus") - win))
        .select("pid", "value")
        .distinct()
    )
    expected = covered.agg(F.sum("value")).collect()[0][0]
    assert math.isclose(attributed_total, expected, rel_tol=1e-6)


def test_cms_never_underestimates(spark):
    """The defining CMS guarantee: estimate >= true count, always."""
    out = cms_token_counts(table(spark, SF001, "documents")).collect()
    assert out
    for r in out:
        assert r.cms_count >= r.true_count
        assert r.overestimate == r.cms_count - r.true_count
