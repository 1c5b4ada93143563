"""Temporal operators: as-of join and SCD-2 dimension history.

Both are expressed as window functions over a single shuffle on
user_id — the Spark-native way to get as-of semantics without a range
join (which would need a broadcast + inequality join or a custom
partitioner at scale). Frame arithmetic uses integral epoch micros so
boundaries are exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_last_view_before_purchase(events: DataFrame) -> DataFrame:
    """For every purchase event: the timestamp of the same user's most
    recent strictly-earlier 'view' event (NULL if none) — the classic
    as-of join, computed with one partitioned running-max instead of a
    pairwise range join."""
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = events.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", us)).over(w),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_view_us").alias("last_view_us"),
    )


def scd2_user_band(events: DataFrame) -> DataFrame:
    """SCD-2 style history of each user's value-band: one row per
    (user, band) run with [valid_from, valid_to) bounds; open runs have
    NULL valid_to. Mirrors how the reference's dimensions would track
    attribute changes over time (its dims are type-1 snapshots; this is
    the type-2 extension)."""
    band = (
        F.when(F.col("value") < 50, F.lit("low"))
        .when(F.col("value") < 150, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    tagged = events.select(
        "user_id", "event_id", "ts", band.alias("band"), us.alias("us")
    ).withColumn(
        "changed",
        F.when(
            F.lag("band").over(w).isNull() | (F.lag("band").over(w) != F.col("band")),
            1,
        ).otherwise(0),
    )
    runs = tagged.filter(F.col("changed") == 1)
    w2 = Window.partitionBy("user_id").orderBy(F.col("us"), F.col("event_id"))
    return runs.select(
        "user_id",
        "band",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
