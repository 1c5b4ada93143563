"""Gap-based sessionization over the events stream (batch form).

Pure window functions (lag → gap flag → running sum → groupBy), all
JVM-side. One shuffle on user_id covers every window; the final
per-session aggregation reuses the same partitioning, so at 100 TB this
is a single repartition of the events table.

Gap arithmetic uses integral epoch microseconds so the 30-minute
boundary is exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.keys import money_sum

DEFAULT_GAP_US = 30 * 60 * 1_000_000


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    ts_us = F.unix_micros("ts")
    new_session = F.when(
        F.lag(ts_us).over(w).isNull() | (ts_us - F.lag(ts_us).over(w) > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("session_idx", F.sum(new_session).over(run).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            money_sum(F.col("value")).alias("session_value"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
                "duration_us"
            ),
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Built-in ``session_window`` twin of ``sessionize``: Spark merges
    per-user event windows that overlap within the gap — the same
    single shuffle on the grouping key, but the island detection happens
    inside the aggregation operator (and the identical code works under
    Structured Streaming with a watermark, which the lag-based
    formulation cannot). Session end is last-event + gap per
    session_window semantics; the oracle reproduces it with the
    gap-island SQL."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


DEBOUNCE_GAP_US = 5 * 60 * 1_000_000


def events_debounce(events: DataFrame, gap_us: int = DEBOUNCE_GAP_US) -> DataFrame:
    """Event de-bouncing: within each (user, event_type) stream, keep
    only the FIRST event of every burst — a burst extends while
    consecutive events are ≤ ``gap_us`` apart (trailing-debounce /
    sessionize semantics, so a chain of closely spaced duplicates
    collapses to its leader even when the chain outlives the gap).

    The telemetry-cleaning primitive for double-click/retry storms:
    unlike ``dedup_exact`` it drops near-in-time repeats whose payloads
    differ. One shuffle on (user_id, event_type) serves both window
    passes (the burst flag IS the keep flag — the leader is exactly the
    row that starts a burst, so no second partitioning is needed);
    integral epoch-microsecond arithmetic keeps the boundary exact in
    any engine."""
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id", "event_type").orderBy(*order)
    ts_us = F.unix_micros("ts")
    prev = F.lag(ts_us).over(w)
    new_burst = F.when(prev.isNull() | (ts_us - prev > gap_us), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_nb", new_burst)
        .withColumn("burst_idx", F.sum("_nb").over(run).cast("long"))
        .filter(F.col("_nb") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value", "burst_idx")
    )


SESSION_PATH_K = 20


def session_paths_topk(
    events: DataFrame, gap_us: int = DEFAULT_GAP_US, k: int = SESSION_PATH_K
) -> DataFrame:
    """Top-k session PATHS: the most frequent ordered event-type
    sequences across gap-sessions (the journey/funnel-discovery query
    behind "what do users actually do before purchasing") — one row
    per path with session count, distinct-user count, and rank.

    Shape: ``sessionize``'s island detection verbatim (one shuffle on
    user_id serves the lag, the running sum AND the per-session
    rollup), the path assembled per session from a sort_array'd
    (ts_us, event_id, type) struct list — bounded by session length,
    ordered by the package's exact (ts, event_id) total order so the
    string is partitioning-independent; the path frequency table is a
    map-side-combined aggregation and the cut is TakeOrdered
    (orderBy+limit → per-partition heaps, never a global sort), with
    the rank window running over k rows only."""
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    ts_us = F.unix_micros("ts")
    new_session = F.when(
        F.lag(ts_us).over(w).isNull() | (ts_us - F.lag(ts_us).over(w) > gap_us),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = events.withColumn(
        "session_idx", F.sum(new_session).over(run).cast("long")
    )
    paths = sess.groupBy("user_id", "session_idx").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.unix_micros("ts").alias("tu"),
                            F.col("event_id").alias("eid"),
                            F.col("event_type").alias("et"),
                        )
                    )
                ),
                lambda s: s["et"],
            ),
        ).alias("path")
    )
    agg = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    top = agg.orderBy(F.col("n_sessions").desc(), "path").limit(k)
    wr = Window.orderBy(F.col("n_sessions").desc(), "path")
    return top.withColumn("rank", F.row_number().over(wr).cast("long"))
