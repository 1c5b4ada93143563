"""Structured Streaming pipeline: availableNow drain over the events
parquet must equal the batch tumbling aggregate."""

from __future__ import annotations

import shutil

from healthcare_oltp_to_olap_gcp_spark.catalog import table
from healthcare_oltp_to_olap_gcp_spark.plans.analytics import events_hourly
from healthcare_oltp_to_olap_gcp_spark.streaming import pipeline

from .conftest import SF001
from .helpers import normalize


def test_stream_equals_batch(spark, tmp_path):
    # Stage the source file into a stream-watchable directory. The
    # stream schema reads the raw nanos longs, so convert like catalog.
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{SF001}/events.parquet", src / "part-0.parquet")

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    raw_schema = StructType(
        [f if f.name != "ts" else StructField("ts", LongType()) for f in pipeline.EVENTS_SCHEMA.fields]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    agg = pipeline.hourly_agg_stream(stream)
    got = pipeline.run_available_now(agg, "t_hourly")

    want = events_hourly(table(spark, SF001, "events"))
    assert normalize(got.toPandas()) == normalize(want.toPandas())


def test_stream_dedups_replayed_file(spark, tmp_path):
    # The same file delivered twice (replication overlap) must not
    # change the aggregate: dropDuplicates on event_id absorbs it.
    src = tmp_path / "events_stream2"
    src.mkdir()
    shutil.copy(f"{SF001}/events.parquet", src / "part-0.parquet")
    shutil.copy(f"{SF001}/events.parquet", src / "part-1.parquet")

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    raw_schema = StructType(
        [f if f.name != "ts" else StructField("ts", LongType()) for f in pipeline.EVENTS_SCHEMA.fields]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    got = pipeline.run_available_now(pipeline.hourly_agg_stream(stream), "t_hourly2")
    want = events_hourly(table(spark, SF001, "events"))
    assert normalize(got.toPandas()) == normalize(want.toPandas())
