"""JDBC OLTP source (reference: Cloud SQL Postgres via the Dataflow
PostgreSQL_to_BigQuery template).

Spark-native equivalent: ``spark.read.jdbc`` with a windowed pushdown
query and range partitioning on the timestamp so a 1000-executor
cluster reads the OLTP table in parallel slices.

No Postgres driver jar ships in this container, but Spark's classpath
bundles embedded Apache Derby — so the full write → windowed-read
round trip IS exercised end-to-end against a real JDBC engine
(tests/test_jdbc_roundtrip.py); only the NOW()-INTERVAL query text is
Postgres-specific (``windowed_query``), with a dialect-neutral literal
form (``windowed_query_literal``) for engines without that syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DEFAULT_FETCH_SIZE = 10_000


def windowed_query(table: str, ts_col: str, lookback_minutes: int) -> str:
    """The pushdown query the reference's flex template runs
    (scheduler/dataflow_flex_body.json 'query' parameter) —
    Postgres-flavored NOW()-relative window."""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {ts_col} >= NOW() - INTERVAL '{int(lookback_minutes)} minutes'"
    )


def windowed_query_literal(table: str, ts_col: str, cutoff: str) -> str:
    """Dialect-neutral windowed query with an explicit cutoff timestamp
    literal ('YYYY-MM-DD HH:MM:SS'). The ts column is quoted because
    Spark's JDBC writer creates case-sensitive lowercase column names
    on engines that fold unquoted identifiers (Derby, Postgres)."""
    return f"SELECT * FROM {table} WHERE \"{ts_col}\" >= TIMESTAMP('{cutoff}')"


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str = "ts",
    lookback_minutes: int = 20,
    num_partitions: int = 32,
    query: str | None = None,
) -> DataFrameReader:
    """Configured JDBC reader; ``query`` overrides the default
    NOW()-relative window (callers supply partition bounds via
    ``.option("partitionColumn", ...)`` for parallel slicing, or accept
    a single-slice read for small windows)."""
    q = query or windowed_query(table, ts_col, lookback_minutes)
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({q}) src")
        .option("fetchsize", str(DEFAULT_FETCH_SIZE))
        .option("numPartitions", str(num_partitions))
    )


def write_jdbc(df: DataFrame, url: str, table: str) -> None:
    """Materialize ``df`` as a JDBC table (full overwrite). Test path
    uses embedded Derby from Spark's own classpath; the identical call
    reaches Postgres/MySQL once their driver jar is present."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("overwrite")
        .save()
    )
