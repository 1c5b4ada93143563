"""Theta-sketch set algebra (operators/theta.py): exactness below
saturation, bounded error above it, mergeability of the capped union —
the properties the value-hash oracle can't state (it pins the
computation, not the estimator's quality)."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from healthcare_oltp_to_olap_gcp_spark.operators.theta import (
    THETA_K,
    build_theta_sketches,
    theta_a_not_b,
    theta_estimate,
    theta_intersect,
    theta_union,
)


def _ids_df(spark, groups):
    """groups: dict name -> iterable of ids; one row per (name, id)."""
    rows = [(name, i) for name, ids in groups.items() for i in ids]
    return spark.createDataFrame(rows, "g string, id long")


def _sets_for(groups):
    return {name: F.col("g") == name for name in groups}


@pytest.mark.fullsweep
def test_exact_below_saturation(spark):
    """Sets smaller than k have theta = 1 and EXACT estimates, and the
    algebra degrades to exact set arithmetic."""
    groups = {
        "a": range(0, 100),
        "b": range(50, 180),  # |b| = 130, |a∪b| = 180, |a∩b| = 50
    }
    df = _ids_df(spark, groups)
    sk = build_theta_sketches(df, "id", _sets_for(groups))
    per_set = {r.s: r for r in theta_estimate(sk).collect()}
    assert per_set["a"].theta == 1.0 and per_set["a"].est == 100.0
    assert per_set["b"].est == 130.0

    union = theta_estimate(theta_union(sk)).collect()[0]
    assert union.theta == 1.0 and union.est == 180.0
    inter = theta_estimate(theta_intersect(sk, 2)).collect()[0]
    assert inter.est == 50.0
    a = sk.filter(F.col("s") == "a")
    b = sk.filter(F.col("s") == "b")
    anotb = theta_estimate(theta_a_not_b(a, b)).collect()[0]
    assert anotb.est == 50.0  # 0..49


def test_saturated_error_bounded(spark):
    """At 20k ids per set (k=256), every estimate must land within
    4 standard errors (stderr ≈ 1/√(k−2) ≈ 6.3%) of truth."""
    n = 20_000
    overlap = 8_000
    groups = {
        "a": range(0, n),
        "b": range(n - overlap, 2 * n - overlap),
    }
    df = _ids_df(spark, groups)
    sk = build_theta_sketches(df, "id", _sets_for(groups))
    tol = 4.0 / math.sqrt(THETA_K - 2)

    per_set = {r.s: r for r in theta_estimate(sk).collect()}
    for name in ("a", "b"):
        assert abs(per_set[name].est - n) / n < tol, per_set[name]
        assert per_set[name].theta < 1.0

    exact_union = 2 * n - overlap
    union = theta_estimate(theta_union(sk)).collect()[0]
    assert abs(union.est - exact_union) / exact_union < tol

    inter = theta_estimate(theta_intersect(sk, 2)).collect()[0]
    assert abs(inter.est - overlap) / overlap < 2 * tol  # smaller set, wider rel. error

    a = sk.filter(F.col("s") == "a")
    b = sk.filter(F.col("s") == "b")
    anotb = theta_estimate(theta_a_not_b(a, b)).collect()[0]
    exact_diff = n - overlap
    assert abs(anotb.est - exact_diff) / exact_diff < 2 * tol


def test_capped_union_mergeable(spark):
    """Union of 20 per-shard sketches (each saturated) must estimate the
    global distinct count as well as a single direct sketch — the
    mergeability contract behind the daily-rollup form — and the result
    sketch stays ≤ k hashes."""
    n, shards = 40_000, 20
    groups = {f"s{i:02d}": range(i * (n // shards), (i + 1) * (n // shards) + 500)
              for i in range(shards)}  # ±500 overlap between neighbors
    df = _ids_df(spark, groups)
    sk = build_theta_sketches(df, "id", _sets_for(groups))
    merged = theta_union(sk)
    assert merged.count() <= THETA_K
    est = theta_estimate(merged).collect()[0]
    exact = df.select("id").distinct().count()
    tol = 4.0 / math.sqrt(THETA_K - 2)
    assert abs(est.est - exact) / exact < tol, (est.est, exact)


def test_intersection_and_difference_partition_a(spark):
    """Exact-regime identity: |A∩B| + |A∖B| = |A| (the sketch algebra
    must not lose or double-count hashes)."""
    groups = {"a": range(0, 150), "b": range(100, 250)}
    df = _ids_df(spark, groups)
    sk = build_theta_sketches(df, "id", _sets_for(groups))
    inter = theta_estimate(theta_intersect(sk, 2)).collect()[0].est
    a = sk.filter(F.col("s") == "a")
    b = sk.filter(F.col("s") == "b")
    anotb = theta_estimate(theta_a_not_b(a, b)).collect()[0].est
    assert inter + anotb == 150.0
