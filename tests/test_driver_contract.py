"""Simulate the driver exactly: a PLAIN SparkSession (none of our
session.get_spark confs) running entry() and a sample of queries()."""

from __future__ import annotations

import pytest

import subprocess
import sys

SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
rows = e.entry(spark).collect()
assert len(rows) > 0, "entry returned no rows"
qs = e.queries()
osql = e.oracle_sql()
assert set(osql) <= set(qs), "oracle keys not a subset of queries"
# Force ANALYSIS of every registered query on the plain session —
# catches type-resolution breakage (e.g. TIMESTAMP_NTZ vs TIMESTAMP
# from an externally built session) across the whole registry without
# paying for execution.
analysis_errors = []
for name, fn in qs.items():
    try:
        fn(spark, "/root/testdata/sf0.001").schema
    except Exception as ex:  # noqa: BLE001
        analysis_errors.append(f"{name}: {type(ex).__name__}: {ex}")
assert not analysis_errors, "\\n".join(analysis_errors)[:4000]
for name in ("fact_events", "q1_pricing_summary", "sessionize", "dedup_exact"):
    assert qs[name](spark, "/root/testdata/sf0.001").count() >= 0
print("DRIVER_CONTRACT_OK", len(rows), len(qs), len(osql))
spark.stop()
"""


@pytest.mark.fullsweep
def test_plain_session_driver_contract():
    # 900s: the analysis sweep measured 461s at 234 queries on the
    # plain local[4] session (r9) — ~320s of it is the ~10 streaming
    # drains and the eager tokenizer fits that EXECUTE inside their
    # builders, which is intentional coverage. The old 420s bound was
    # passing with <10s of headroom and tipped over when r9's five
    # operators landed; 900 keeps a real-hang ceiling without gating
    # registry growth.
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=900
    )
    assert "DRIVER_CONTRACT_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]


# Rows-only (no SQL oracle) entries allowed inside the driver window:
# the driver logs an `err: no_oracle` row for them — a weaker check,
# but it proves the query runs end-to-end on fresh driver data, which
# is the whole point of rotating them in (r4 verdict item 7). Keep
# this list tiny and deliberate; oracle-backed coverage is the norm.
_ROWS_ONLY_WINDOWED = {
    "pq_trained_ann_topk",
    "ann_recall_report_trained",
    # r6: the IVF trained twins share pq_trained's rationale (sampled
    # Lloyd fit, not SQL-portable; seeded twins stay the oracled
    # controls with recall(trained) >= recall(seeded) asserted locally)
    "ivf_flat_trained_ann_topk",
    "ivfpq_trained_ann_topk",
    "bpe_merges",
    # the encode half inherits the trainer's iterative merges — same
    # rows-only rationale, pinned vs a pure-python encoder locally
    "bpe_encode_documents",
    # r6: Gonzalez farthest-point recursion isn't SQL-portable; the
    # invariants (corpus-member centers, population partition, radius
    # monotone in k, partition-order independence) are pinned locally
    "kcenter_diversity_sample",
    # r6: unigram-LM EM is iterative (bpe_merges' rationale); the whole
    # model table is pinned against a pure-python reference locally
    "unigram_lm_vocab",
    "unigram_encode_documents",
    # r7: the oldest-first recency rotation (window_check STALE_LIMIT)
    # treats rows-only entries uniformly, so the r1-era rows-only
    # sketches rotate through the window like everything else — their
    # bounded-error tests run every round locally
    "hll_sketch_distinct_users",
    "approx_distinct_users",
    "approx_value_percentiles",
    # r7: MLlib-KMeans cells are not SQL-portable (the hash-seeded
    # ivf_flat twin is the oracled control); recall-vs-brute asserted
    # locally
    "ivf_ann_topk",
}


def test_driver_window_composition():
    """The driver's correctness gate reads the FIRST 50 registry entries:
    they must be exactly the curated _PRIORITY list (never-checked ops
    first, then the refactor re-verify set, then risk-ranked regression
    picks), every one of them oracle-backed except the documented
    rows-only rotations."""
    from healthcare_oltp_to_olap_gcp_spark.api import _PRIORITY, QUERIES
    from healthcare_oltp_to_olap_gcp_spark.oracles import ORACLE_SQL

    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(QUERIES)[:50] == _PRIORITY
    missing = [
        n for n in _PRIORITY if n not in ORACLE_SQL and n not in _ROWS_ONLY_WINDOWED
    ]
    assert not missing, f"window entries without an oracle: {missing}"


def test_window_rotation_gate():
    """tools/window_check.py: every registered query must be
    driver-checked in some CORRECTNESS_r*.json or inside the current
    window (VERDICT r3 item 8), and — r7, VERDICT r6 item 2 — its most
    recent driver row must be younger than the STALE_LIMIT unless the
    window refreshes it this round."""
    sys.path.insert(0, "/root/repo/tools")
    import window_check

    never, stale = window_check.violations()
    assert not never, f"never driver-checked and outside window: {never}"
    assert not stale, f"stale (>= {window_check.STALE_LIMIT} rounds) and outside window: {stale}"


def test_bench_compact_line_fits_driver_tail(tmp_path):
    """BENCH_r03 shipped `parsed: null` because the 157-query JSON line
    overflowed the driver's 2,000-char tail capture. The compact emit
    must stay ≤1.5 KB even with long query names at full registry size,
    and the full map must land in tools/bench_full.json."""
    import json

    import bench
    from healthcare_oltp_to_olap_gcp_spark.api import QUERIES

    out = tmp_path / "bench_full.json"
    timings = {name: 123.456 for name in QUERIES}
    line = bench.emit(timings, "/root/testdata/sf0.1", full_path=str(out))
    assert len(line) <= 1500
    compact = json.loads(line)
    assert compact["n_queries"] == len(QUERIES)
    assert len(compact["queries"]) == 10
    full = json.load(open(out))
    assert set(full["queries"]) == set(QUERIES)
    assert full["value"] == compact["value"]


def test_cli_list_and_unknown():
    from healthcare_oltp_to_olap_gcp_spark.__main__ import main

    assert main(["list"]) == 0
    assert main(["run", "no_such_query"]) == 2
