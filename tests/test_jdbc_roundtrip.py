"""End-to-end JDBC round trip against embedded Apache Derby (which
ships on Spark's classpath): write an OLTP slice out through JDBC, read
a windowed slice back through sources/jdbc.py, and check it equals the
same window filtered directly — the reference's Dataflow
Postgres→BigQuery edge (scheduler/dataflow_flex_body.json) exercised
against a real JDBC engine rather than construction-tested only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_oltp_to_olap_gcp_spark.catalog import table
from healthcare_oltp_to_olap_gcp_spark.sources import jdbc

from .conftest import SF001

CUTOFF = "2024-01-05 00:00:00"  # mid-range of the event_id<300 slice's ts span


def test_jdbc_windowed_roundtrip_derby(spark, tmp_path):
    events = table(spark, SF001, "events").filter(F.col("event_id") < 300)
    url = f"jdbc:derby:{tmp_path}/oltp;create=true"

    jdbc.write_jdbc(events, url, "events")

    q = jdbc.windowed_query_literal("events", "ts", CUTOFF)
    back = jdbc.jdbc_reader(spark, url, "events", query=q).load()

    expected = events.filter(F.col("ts") >= F.lit(CUTOFF).cast("timestamp"))
    # JDBC reports everything nullable; compare names/types, not nullability
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in expected.schema.fields
    ]
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(want) > 0


def test_jdbc_overwrite_idempotent(spark, tmp_path):
    """Re-running the replication write must not duplicate rows."""
    events = table(spark, SF001, "events").filter(F.col("event_id") < 100)
    url = f"jdbc:derby:{tmp_path}/oltp2;create=true"
    jdbc.write_jdbc(events, url, "events")
    jdbc.write_jdbc(events, url, "events")
    back = spark.read.format("jdbc").option("url", url).option("dbtable", "events").load()
    assert back.count() == events.count()
