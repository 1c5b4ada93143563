"""Simulate the driver exactly: a PLAIN SparkSession (none of our
session.get_spark confs) running entry() and a sample of queries()."""

from __future__ import annotations

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


def test_plain_session_driver_contract():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=420
    )
    assert "DRIVER_CONTRACT_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]


def test_driver_window_composition():
    """The driver's correctness gate reads the FIRST 50 registry entries:
    they must be exactly the curated _PRIORITY list (17 never-checked +
    5 round-3-rewritten + 12 round-3-new + risk-ranked regression picks),
    every one of them oracle-backed."""
    from healthcare_oltp_to_olap_gcp_spark.api import _PRIORITY, QUERIES
    from healthcare_oltp_to_olap_gcp_spark.oracles import ORACLE_SQL

    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(QUERIES)[:50] == _PRIORITY
    missing = [n for n in _PRIORITY if n not in ORACLE_SQL]
    assert not missing, f"window entries without an oracle: {missing}"


def test_cli_list_and_unknown():
    from healthcare_oltp_to_olap_gcp_spark.__main__ import main

    assert main(["list"]) == 0
    assert main(["run", "no_such_query"]) == 2
