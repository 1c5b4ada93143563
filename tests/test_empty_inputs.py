"""Every registered query must survive EMPTY input tables.

At 100 TB an incremental load, a partition-pruned scan, or a fresh
deployment routinely hands an operator zero rows; a plan that crashes on
an empty frame (e.g. an ML fit, a driver-side collect indexing [0])
is a production outage, not an edge case. This sweep materializes a
schema-identical empty mirror of the sf0.001 tables and runs the entire
registry against it, asserting "no exception" (row counts are free to
be zero).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry
from healthcare_oltp_to_olap_gcp_spark.catalog import TABLES

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF001}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.fullsweep
def test_all_queries_survive_empty_tables(spark, empty_dir):
    failures = {}
    for name, fn in entry.queries().items():
        try:
            fn(spark, empty_dir).collect()
        except Exception as exc:  # noqa: BLE001 - we want every failure listed
            failures[name] = str(exc).splitlines()[0][:200]
    assert not failures, f"queries crashed on empty input: {failures}"
