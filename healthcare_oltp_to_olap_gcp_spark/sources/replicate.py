"""Windowed batch replication with deliberate overlap.

Re-expresses the reference's Dataflow cadence (every 10 minutes, copy
the last 20 minutes — scheduler/dataflow_flex_body.json query:
``WHERE effective_ts >= NOW() - INTERVAL '10 minutes'`` with the
initial load using a 20-minute lookback): late/failed runs are covered
by the next run's overlap, and the downstream dedup fact
(plans/star.fact_events) makes re-delivery idempotent.

At scale the source read is predicate-pushed (timestamp range reaches
the scan) and the sink append is partitioned by day so each incremental
run touches only current partitions.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def extract_window(
    events: DataFrame, window_end: datetime, lookback_minutes: int = 20
) -> DataFrame:
    """The windowed slice a single replication run copies."""
    end = F.lit(window_end.isoformat(sep=" ")).cast("timestamp")
    start = end - F.expr(f"INTERVAL {int(lookback_minutes)} MINUTES")
    return events.filter((F.col("ts") >= start) & (F.col("ts") < end))


def replicate_window(
    events: DataFrame,
    sink_path: str,
    window_end: datetime,
    lookback_minutes: int = 20,
) -> None:
    """One replication run: append the window to the raw landing zone,
    day-partitioned. Overlapping windows write duplicate event_ids on
    purpose — the dedup fact resolves them (idempotency is downstream,
    exactly like the reference)."""
    (
        extract_window(events, window_end, lookback_minutes)
        .withColumn("load_date", F.to_date("ts"))
        .write.mode("append")
        .partitionBy("load_date")
        .parquet(sink_path)
    )


def read_raw(spark: SparkSession, sink_path: str) -> DataFrame:
    return spark.read.parquet(sink_path).drop("load_date")
