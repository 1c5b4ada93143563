"""JDBC OLTP source (reference: Cloud SQL Postgres via the Dataflow
PostgreSQL_to_BigQuery template).

Spark-native equivalent: ``spark.read.jdbc`` with a windowed pushdown
query and range partitioning on the timestamp so a 1000-executor
cluster reads the OLTP table in parallel slices. No Postgres driver jar
ships in this container, so this module only *builds* the reader plan;
constructing it is unit-tested, executing it requires the jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession

DEFAULT_FETCH_SIZE = 10_000


def windowed_query(table: str, ts_col: str, lookback_minutes: int) -> str:
    """The pushdown query the reference's flex template runs
    (scheduler/dataflow_flex_body.json 'query' parameter)."""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {ts_col} >= NOW() - INTERVAL '{int(lookback_minutes)} minutes'"
    )


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str = "ts",
    lookback_minutes: int = 20,
    num_partitions: int = 32,
) -> DataFrameReader:
    """Configured JDBC reader; caller supplies partition bounds (or
    accepts a single-slice read for small windows)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({windowed_query(table, ts_col, lookback_minutes)}) src")
        .option("fetchsize", str(DEFAULT_FETCH_SIZE))
        .option("numPartitions", str(num_partitions))
    )
