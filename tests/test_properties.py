"""Property-based invariants (Hypothesis) over generated micro-data,
plus crafted-edge-case tests the random test tables can't produce."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from healthcare_oltp_to_olap_gcp_spark.functions.keys import money_sum
from healthcare_oltp_to_olap_gcp_spark.operators.dedup import (
    clean_documents,
    dedup_components,
    ngram_jaccard_pairs,
)
from healthcare_oltp_to_olap_gcp_spark.operators.merge import merge_upsert
from healthcare_oltp_to_olap_gcp_spark.operators.sessionize import sessionize

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(0, 30),  # event_id
        st.integers(0, 3_600_000),  # seconds offset
        st.integers(0, 3),  # user_id
        st.floats(0, 1000, allow_nan=False),  # value
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


def _events_df(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=off), uid, "click", round(val, 2), "{}")
            for eid, off, uid, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


@given(rows=EVENT_ROWS)
@SETTINGS
@pytest.mark.fullsweep
def test_merge_upsert_updates_win_and_keys_unique(spark, rows):
    existing = _events_df(spark, rows)
    updates = existing.filter(F.col("event_id") % 2 == 0).withColumn(
        "value", F.col("value") + 1.0
    )
    merged = merge_upsert(existing, updates, "event_id")
    out = {r.event_id: r.value for r in merged.collect()}
    src = {r.event_id: r.value for r in existing.collect()}
    assert len(out) == len(src)  # no key lost, no key duplicated
    for k, v in src.items():
        assert out[k] == (v + 1.0 if k % 2 == 0 else v)


@given(rows=EVENT_ROWS)
@SETTINGS
def test_sessionize_partitions_events_correctly(spark, rows):
    df = _events_df(spark, rows)
    sessions = sessionize(df).collect()
    # every event accounted for exactly once
    assert sum(s.n_events for s in sessions) == len(rows)
    # session bounds are consistent and sessions of one user don't overlap
    by_user: dict[int, list] = {}
    for s in sessions:
        assert s.session_start <= s.session_end
        by_user.setdefault(s.user_id, []).append(s)
    for user_sessions in by_user.values():
        user_sessions.sort(key=lambda s: s.session_idx)
        for a, b in zip(user_sessions, user_sessions[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > 1800  # adjacent sessions separated by > the gap


@given(
    vals=st.lists(st.floats(0, 1e6, allow_nan=False), min_size=1, max_size=30),
    seed=st.integers(0, 10_000),
)
@SETTINGS
@pytest.mark.fullsweep
def test_money_sum_is_order_and_partition_invariant(spark, vals, seed):
    import random

    shuffled = vals[:]
    random.Random(seed).shuffle(shuffled)
    a = spark.createDataFrame([(v,) for v in vals], "v double").coalesce(1)
    b = spark.createDataFrame([(v,) for v in shuffled], "v double").repartition(7)
    ra = a.agg(money_sum(F.col("v")).alias("s")).collect()[0].s
    rb = b.agg(money_sum(F.col("v")).alias("s")).collect()[0].s
    assert ra == rb  # bit-identical, not approximately equal


@pytest.mark.fullsweep
def test_dedup_components_transitive_chain(spark):
    # A~B and B~C are near-dups but A~C is below threshold — components
    # must still merge all three through transitivity.
    words = [f"w{i}" for i in range(20)]
    a = " ".join(words)
    b = " ".join(words[:18] + ["x1", "x2"])  # tail changed: j(a,b)=0.8
    c = " ".join(["y1", "y2"] + words[2:18] + ["x1", "x2"])  # head changed: j(b,c)=0.8, j(a,c)≈0.64
    far = "entirely different tokens " + " ".join(f"z{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b)),
         (2, c, "en", "s", len(c)), (3, far, "en", "s", len(far))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 0.7).collect()}
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) not in pairs
    comp = {r.doc_id: r.component for r in dedup_components(docs, 0.7).collect()}
    assert comp == {0: 0, 1: 0, 2: 0}  # chain collapsed; 'far' not in graph
    survivors = {r.doc_id for r in clean_documents(docs, 0.7).collect()}
    assert survivors == {0, 3}


DOC_ROWS = st.lists(
    st.tuples(
        st.integers(0, 60),  # doc_id
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=0,
            max_size=25,
        ),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [
            (did, " ".join(words), "en", "src0", len(" ".join(words)))
            for did, words in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@SETTINGS
@given(rows=DOC_ROWS)
@pytest.mark.fullsweep
def test_containment_bounds_and_symmetry_free(spark, rows):
    """Containment values sit in (0, 1]; pair keys are ordered; every
    pair's n_shared never exceeds the smaller shingle set."""
    from healthcare_oltp_to_olap_gcp_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    out = ngram_containment_pairs(_docs_df(spark, rows), threshold=0.1).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert 0.0 < r.containment <= 1.0
        assert r.n_shared >= 1


@SETTINGS
@given(rows=DOC_ROWS)
@pytest.mark.fullsweep
def test_curated_is_subset_and_deterministic(spark, rows):
    """The curated corpus is a subset of the input and stable across
    two evaluations (no RNG, no order dependence)."""
    from healthcare_oltp_to_olap_gcp_spark.operators.dedup import curated_documents

    docs = _docs_df(spark, rows)
    ids = {r.doc_id for r, in zip(docs.select("doc_id").collect())}
    got1 = {r.doc_id for r in curated_documents(docs).collect()}
    got2 = {r.doc_id for r in curated_documents(docs).collect()}
    assert got1 == got2
    assert got1 <= ids


@SETTINGS
@given(rows=DOC_ROWS)
@pytest.mark.fullsweep
def test_weighted_sample_deterministic_and_ranked(spark, rows):
    """Weighted sampling: deterministic, ranks contiguous from 1, and
    only positive-length docs are eligible."""
    from healthcare_oltp_to_olap_gcp_spark.operators.dedup import (
        weighted_sample_documents,
    )

    docs = _docs_df(spark, rows)
    a = weighted_sample_documents(docs, n=5).collect()
    b = weighted_sample_documents(docs, n=5).collect()
    assert [(r.doc_id, r.rank) for r in a] == [(r.doc_id, r.rank) for r in b]
    assert [r.rank for r in sorted(a, key=lambda r: r.rank)] == list(
        range(1, len(a) + 1)
    )
    for r in a:
        assert r.n_chars > 0


@SETTINGS
@given(rows=EVENT_ROWS)
@pytest.mark.fullsweep
def test_kmv_exact_below_k_and_merge_equal(spark, rows):
    """With far fewer than k distinct users the KMV sketch must report
    exact counts, and the daily merge must equal the direct sketch."""
    from healthcare_oltp_to_olap_gcp_spark.plans.analytics import (
        kmv_daily_merge_distinct_users,
        kmv_distinct_users,
    )

    events = _events_df(spark, rows)
    exact = events.select("user_id").distinct().count()
    direct = kmv_distinct_users(events).collect()
    assert len(direct) == 1  # single event_type in the generator
    assert direct[0].approx_users == float(exact)
    merged = kmv_daily_merge_distinct_users(events).collect()
    assert {(r.event_type, r.sketch_size, r.approx_users) for r in direct} == {
        (r.event_type, r.sketch_size, r.approx_users) for r in merged
    }
