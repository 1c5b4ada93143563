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
    pairwise range join.

    The frame is a RANGE over epoch micros ending 1 PRECEDING, i.e.
    true strict-< semantics: a view at the exact purchase timestamp is
    NOT visible, matching ``asof_join(strict=True)`` and the pandas
    twin's ``allow_exact_matches=False`` — all three share one oracle
    with no tie-order divergence (a ROWS frame over (ts, event_id)
    would instead expose equal-ts views with smaller ids)."""
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(Window.unboundedPreceding, -1)
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


def asof_last_view_pandas(events: DataFrame, partitions: int = 32) -> DataFrame:
    """Same as-of semantics via ``mapInPandas`` + keyed
    ``pd.merge_asof(by="user_id")`` — the escape hatch when as-of
    logic outgrows window expressions (tolerance bands,
    nearest-rather-than-backward, multi-column asof). Output is
    identical to the window formulation (asserted in tests), so the
    same SQL oracle applies.

    Shape note: a per-GROUP ``applyInPandas`` pays one Python call per
    user — at sf0.1 that is ~30k tiny pandas frames and the call
    overhead dominates (~6s). Hash-partitioning on user_id and running
    ONE keyed merge_asof per PARTITION keeps the same per-user
    semantics (``by=`` scopes the backward search) at ~|partitions|
    Python calls. The partition must be materialized in pandas (Arrow
    streams it in batches), so partition count — not data size —
    bounds worker memory; a cluster deploy scales ``partitions`` with
    the input."""
    import pandas as pd

    def per_partition(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["us", "event_id"]).reset_index(drop=True)
        views = pdf[pdf["event_type"] == "view"][["user_id", "us"]].copy()
        views["last_view_us"] = views["us"]
        purchases = pdf[pdf["event_type"] == "purchase"].copy()
        if views.empty:
            purchases["last_view_us"] = pd.Series(dtype="float64")
        else:
            purchases = pd.merge_asof(
                purchases,
                views,
                on="us",
                by="user_id",
                direction="backward",
                allow_exact_matches=False,
            )
        out = purchases[["event_id", "user_id", "ts", "last_view_us"]].copy()
        # real NULLs, not NaN: ANSI mode rejects NaN->long casts downstream
        out["last_view_us"] = (
            out["last_view_us"].astype(object).where(out["last_view_us"].notna(), None)
        )
        yield out

    us = F.unix_micros("ts")
    prepared = events.select(
        "event_id", "user_id", "ts", "event_type", us.alias("us")
    ).repartition(partitions, "user_id")
    out_schema = "event_id long, user_id long, ts timestamp, last_view_us double"
    result = prepared.mapInPandas(per_partition, out_schema)
    return result.withColumn("last_view_us", F.col("last_view_us").cast("long"))


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    tie: str = "event_id",
    value_cols: tuple[str, ...] = (),
    strict: bool = True,
) -> DataFrame:
    """Generic backward as-of join: for every ``left`` row, attach the
    ``value_cols`` of the latest ``right`` row with the same ``by`` key
    and ``right.on`` < ``left.on`` (≤ when ``strict=False``).

    Spark-native formulation: union both sides tagged, ONE shuffle on
    the ``by`` key, and a running ``last(ignorenulls)`` window per
    value column — no range join, no per-pair materialization, so the
    cost is a single per-key sort regardless of how many right rows
    precede each left row. Ties inside one side break on the ``tie``
    column (a stable row id present in both frames), keeping the
    result independent of partitioning.

    This is the reusable form of ``asof_last_view_before_purchase``
    (equality asserted in tests); tolerance bands or nearest-direction
    variants belong in the ``applyInPandas`` twin."""
    lt = left.select(
        F.lit(1).alias("_is_left"),
        F.col(on).alias("_on"),
        F.col(tie).alias("_tie"),
        F.col(by).alias("_by"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    rt = right.select(
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_on"),
        F.col(tie).alias("_tie"),
        F.col(by).alias("_by"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    # Left rows sort AFTER right rows at equal `on` iff non-strict
    # (so an equal-timestamp right row is visible), BEFORE iff strict.
    side_rank = F.col("_is_left") if not strict else (1 - F.col("_is_left"))
    w = (
        Window.partitionBy("_by")
        .orderBy(F.col("_on"), side_rank, F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    unioned = lt.unionByName(rt)
    for c in value_cols:
        unioned = unioned.withColumn(
            f"_asof_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w)
        )
    return unioned.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
