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


def test_stateful_running_totals(spark, tmp_path):
    # Two disjoint halves -> two micro-batches; state must carry totals
    # across batches so the final update per user equals the batch agg.
    import glob

    from pyspark.sql import functions as F

    events = table(spark, SF001, "events")
    src = tmp_path / "events_state"
    src.mkdir()
    for i, half in enumerate(
        (events.filter(F.col("event_id") < 500), events.filter(F.col("event_id") >= 500))
    ):
        out_dir = tmp_path / f"half{i}"
        half.coalesce(1).write.parquet(str(out_dir))
        shutil.copy(glob.glob(f"{out_dir}/part-*.parquet")[0], src / f"batch-{i}.parquet")

    stream = (
        spark.readStream.schema(pipeline.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = pipeline.run_available_now_update(
        pipeline.running_user_totals(stream), "t_state"
    )
    import pandas as pd

    latest = (
        out.toPandas()
        .groupby("user_id")
        .last()  # update mode appends; last row per user is final state
    )
    batch = (
        table(spark, SF001, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .toPandas()
        .set_index("user_id")
    )
    for uid, row in batch.iterrows():
        assert latest.loc[uid, "total_events"] == row["n"]
        assert abs(latest.loc[uid, "total_value"] - round(row["v"], 4)) < 0.01


def test_foreach_batch_incremental_fact_equals_batch(spark, tmp_path):
    """Micro-batched foreachBatch MERGE into the versioned fact store
    must converge to exactly the batch fact_events result, across
    multiple triggers (maxFilesPerTrigger=4 over 8 files)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from healthcare_oltp_to_olap_gcp_spark.plans.star import fact_events

    src = tmp_path / "events_stream3"
    src.mkdir()
    # split the source into several files so availableNow runs >1 batch,
    # with one file duplicated (replication overlap)
    events = table(spark, SF001, "events")
    events.repartition(7).write.mode("overwrite").parquet(str(src))
    dup = sorted(p for p in src.iterdir() if p.name.endswith(".parquet"))[0]
    shutil.copy(dup, src / "dup-copy.parquet")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(str(src))
    )
    store = str(tmp_path / "fact_store")
    q = pipeline.incremental_fact_sink(stream, store)
    q.awaitTermination()

    got = pipeline.read_fact_store(spark, store)
    want = fact_events(events)
    assert normalize(got.toPandas()) == normalize(want.toPandas())
