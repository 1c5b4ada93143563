"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); on a
real cluster the same confs apply, with ``spark.sql.shuffle.partitions``
raised to ~2-3x total executor cores. AQE is on so shuffle partition
counts and skew handling re-plan at runtime, which is what makes the
same code hold from sf0.001 up to 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def get_spark(app_name: str = "hc-olap-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, join-strategy swap.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # r9 (guide §3.1): raise the broadcast threshold from the 10 MB
        # default so moderate build sides (e.g. part_triangles' 1.2M-row
        # closing-edge list, ~19 MB) hash-join without shuffling the
        # much larger probe side. Size-ADAPTIVE, not a force: a side
        # whose (runtime, with AQE) size exceeds the threshold still
        # sort-merge-joins, so the same code holds at cluster scale.
        # Parameterized; size to executor memory in production (a few
        # hundred MB is routine on 10s-of-GB executors, guide §3.1).
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"),
        )
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"),
        )
        # Arrow for the few Pandas-UDF operators (multimodal, winnowing).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic date/timestamp math across engines (DuckDB oracle
        # works on naive timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        # The driver test data stores TIMESTAMP(NANOS) parquet, which the
        # vectorized reader rejects; read as epoch-nanos longs and convert
        # in catalog.table (truncation to micros — same as DuckDB).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Warehouse for bucketed saveAsTable materializations (static conf).
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/hc_olap_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


_SCOPED_CACHES: list[DataFrame] = []


def scoped_persist(df: DataFrame, *, chain: bool = False) -> DataFrame:
    """Persist ``df``, releasing any frame previously persisted through
    this helper.

    Query builders persist intermediates that feed several subtrees of
    ONE returned plan (e.g. the star fact feeding four dimension builds);
    that cache must survive the query's execution but nothing after it.
    Since the registry runs queries sequentially, releasing the previous
    scoped cache at the next build bounds cached-block growth across a
    full ``queries()`` sweep. Releasing early is always safe — an
    unpersisted frame recomputes, it never returns wrong data.

    ``chain=True`` keeps the previously persisted frames alive — for a
    builder whose ONE scope needs several cached intermediates (e.g.
    ann_recall_report's shared corpus + query + brute frames); the whole
    chain is released together at the next non-chained call."""
    if not chain:
        for old in _SCOPED_CACHES:
            try:
                old.unpersist()
            except Exception:
                pass
        _SCOPED_CACHES.clear()
    _SCOPED_CACHES.append(df)
    return df.persist()
