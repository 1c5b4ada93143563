"""Small-file compaction for parquet landing zones.

Streaming/incremental writers (the replication cadence in
``replicate.py``, foreachBatch sinks) produce many small files; at
100 TB the resulting scan-task explosion and NameNode/listing pressure
are the classic operational failure. Compaction rewrites a directory
into ~``target_file_bytes`` files:

- the output file count is derived from the MEASURED input bytes (one
  driver-side listing via Hadoop FS — metadata only, never data);
- ``repartition(n)`` round-robins rows for even file sizes, or
  ``repartitionByRange(n, *cluster_by)`` when readers benefit from
  clustered row groups (min/max skipping on the cluster key, same
  motivation as the reference's CLUSTER BY);
- the rewrite lands in a NEW directory and is atomically promoted by
  the caller (rename/swap), so readers never observe a half-compacted
  zone.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of the parquet data files under
    ``path`` — Hadoop FS metadata listing only."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith("_"):
            n += 1
            total += st.getLen()
    return n, total


def plan_compaction(
    spark: SparkSession, src: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int, int]:
    """(input_files, input_bytes, output_files) for a compaction run."""
    n, total = dir_stats(spark, src)
    out = max(1, math.ceil(total / target_file_bytes))
    return n, total, out


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_file_bytes`` files; returns the output file count.
    Content-preserving: same rows, no dedup/transform — compaction is
    an IO-layout operation, semantics belong to the operators."""
    _, _, out_files = plan_compaction(spark, src, target_file_bytes)
    df: DataFrame = spark.read.parquet(src)
    if cluster_by:
        df = df.repartitionByRange(out_files, *cluster_by)
    else:
        df = df.repartition(out_files)
    df.write.mode("overwrite").parquet(dst)
    n_out, _ = dir_stats(spark, dst)
    return n_out
