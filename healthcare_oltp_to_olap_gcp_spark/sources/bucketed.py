"""Bucketed table writes → shuffle-free co-located joins.

The reference clusters its star fact (BigQuery CLUSTER BY) so key
lookups and joins touch co-located data. The Spark-native equivalent
for *join* co-location is bucketing: both sides written with
``bucketBy(n, key)`` hash-place rows identically, so a join on the
bucket key needs NO exchange on either side — at 100 TB that deletes
the two largest shuffles of a fact-to-fact join. Asserted in
tests/test_bucketing.py (executed plan contains zero Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = DEFAULT_BUCKETS
) -> None:
    """Materialize as a bucketed+sorted parquet table in the session
    catalog (metastore-less: the in-memory catalog carries bucket spec).
    Idempotent: drops the table and any orphaned location first."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:") :]
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner
    recognizes matching bucket specs and elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), key)
