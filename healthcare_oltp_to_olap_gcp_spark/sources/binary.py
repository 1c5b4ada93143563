"""Binary-file ingestion for multimodal pipelines.

Spark's built-in ``binaryFile`` source reads whole files as rows of
(path, modificationTime, length, content) — the ingestion edge for
image/audio/video corpora: each blob becomes an opaque ``binary``
column partitioned by file, which the multimodal operators
(operators/multimodal.py) then process with Arrow-batched mapInPandas.
At 100 TB the same reader fans out across executors file-by-file;
``pathGlobFilter`` prunes at listing time, before any read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """All files under ``path`` as (path, modificationTime, length,
    content) rows; ``glob`` (e.g. ``*.png``) prunes at listing time."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def binary_files_as_payload(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Bridge to the multimodal operators: stable doc_id from the file
    name hash, binary payload, mime guessed from the extension. The id
    must derive from content-addressable metadata (the path), never
    from a row index — re-listing in a different order must not change
    identities."""
    files = read_binary_dir(spark, path, glob)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    return files.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
        F.when(ext.isin("png", "jpg", "jpeg", "gif"), F.concat(F.lit("image/"), ext))
        .when(ext.isin("wav", "mp3", "flac"), F.concat(F.lit("audio/"), ext))
        .when(ext.isin("mp4", "avi", "mkv"), F.concat(F.lit("video/"), ext))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
    )
