"""Monitoring rollups, re-expressing /root/reference/monitoring/*.sql.

The reference monitors scheduler executions (job_name, http status,
success flag) over a 7-day window. The analog here treats
``events.event_type`` as the job name and ``event_type <> 'error'`` as
the success flag; the window is the 7 days up to the newest event so
results are deterministic on the frozen test data.

Scale notes: the base window filter is a pushed-down predicate on the
(at scale, date-partitioned) events table, so the 7-day view scans 7
partitions out of years of history; the rollups are partial-agg
groupBys on low-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def executions(events: DataFrame) -> DataFrame:
    """Base view, ref monitoring/scheduler_executions_results_vw.sql:
    windowed slice + success flag."""
    bounds = events.agg(F.max("ts").alias("_max_ts"))
    return (
        events.crossJoin(F.broadcast(bounds))
        .filter(F.col("ts") >= F.col("_max_ts") - F.expr("INTERVAL 7 DAYS"))
        .select(
            "ts",
            F.col("event_type").alias("job_name"),
            F.col("value").alias("status_value"),
            (F.col("event_type") != "error").alias("is_success"),
            "user_id",
            "event_id",
        )
    )


def last_status(events: DataFrame) -> DataFrame:
    """ref monitoring/scheduler_executions_last_status_vw.sql:
    ROW_NUMBER()=1 per job, newest first."""
    base = executions(events)
    w = Window.partitionBy("job_name").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("ts").alias("last_event_ts"),
            "job_name",
            F.col("status_value").alias("last_status_value"),
            F.col("is_success").alias("last_is_success"),
        )
    )


def daily_summary(events: DataFrame) -> DataFrame:
    """ref monitoring/scheduler_executions_daily_summary_vw.sql."""
    base = executions(events)
    return base.groupBy(
        F.to_date("ts").alias("event_date"), F.col("job_name")
    ).agg(
        F.count("*").alias("total_runs"),
        F.sum(F.when(F.col("is_success"), 1).otherwise(0)).alias("success_runs"),
        F.sum(F.when(~F.col("is_success"), 1).otherwise(0)).alias("failed_runs"),
        F.round(
            F.sum(F.when(F.col("is_success"), 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("success_rate"),
    )


def summary_7d(events: DataFrame) -> DataFrame:
    """ref monitoring/scheduler_executions_7d_summary_vw.sql."""
    base = executions(events)
    return base.groupBy("job_name").agg(
        F.count("*").alias("runs_7d"),
        F.sum(F.when(F.col("is_success"), 1).otherwise(0)).alias("success_7d"),
        F.round(
            F.sum(F.when(F.col("is_success"), 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("success_rate_7d"),
    )


def errors(events: DataFrame) -> DataFrame:
    """ref monitoring/scheduler_executions_errors_vw.sql: failures only."""
    return executions(events).filter(~F.col("is_success")).select(
        "ts", "job_name", "status_value", "user_id", "event_id"
    )


# The reference ships these as SQL views a dashboard queries by name
# (/root/reference/monitoring/*.sql → Looker Studio). Mirror that
# surface: registering them makes `spark.sql("SELECT * FROM
# scheduler_executions_last_status_vw")` work verbatim.
VIEW_BUILDERS = {
    "scheduler_executions_results_vw": executions,
    "scheduler_executions_last_status_vw": last_status,
    "scheduler_executions_daily_summary_vw": daily_summary,
    "scheduler_executions_7d_summary_vw": summary_7d,
    "scheduler_executions_errors_vw": errors,
}


def register_monitoring_views(events: DataFrame) -> list[str]:
    """Register every monitoring rollup as a temp view under its
    reference name; returns the registered names. Temp views are
    lazy — each dashboard query re-plans against current data, exactly
    like the reference's BigQuery views."""
    for name, build in VIEW_BUILDERS.items():
        build(events).createOrReplaceTempView(name)
    return list(VIEW_BUILDERS)
