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


def _table_location(spark: SparkSession, table_name: str) -> str | None:
    """The catalog's actual location for ``table_name`` (correct for
    db-qualified names and any warehouse URI scheme); None if the table
    isn't registered."""
    try:
        if not spark.catalog.tableExists(table_name):
            return None
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect():
            if r.col_name == "Location":
                return r.data_type
    except Exception:
        return None
    return None


def _delete_path(spark: SparkSession, location: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works for
    file:, hdfs:, gs:, s3a: alike (shutil only handled local paths)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(location)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = DEFAULT_BUCKETS
) -> None:
    """Materialize as a bucketed+sorted parquet table in the session
    catalog (metastore-less: the in-memory catalog carries bucket spec).
    Idempotent: drops the table and its data location first. The
    location is resolved from the catalog BEFORE the drop; only for
    unqualified names missing from the catalog (an orphan dir left by a
    previous session, which the in-memory catalog has forgotten) does it
    fall back to the default <warehouse>/<table> layout."""
    spark = df.sparkSession
    location = _table_location(spark, table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if location is None and "." not in table_name:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse:
            location = f"{warehouse.rstrip('/')}/{table_name.lower()}"
    if location:
        _delete_path(spark, location)
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
