"""Schema-evolution-tolerant parquet reading.

A long-lived landing zone accumulates files written under different
schema versions (columns added, ints widened). Two production-safe
read paths:

- ``read_evolved``: ``mergeSchema=true`` union of all footer schemas —
  the exploratory path. Footer merging is distributed (one task per
  file), but on a 100 TB zone with millions of files the footer sweep
  itself costs a stage, so pin ``target_schema`` where known. Note
  mergeSchema only merges ADDED columns; a type change across
  generations is a write-path bug, not something reads paper over.
- ``read_conformed``: read with an EXPLICIT target schema — files
  missing a column yield NULLs for it, extra columns are pruned at the
  scan, nothing is inferred. This is the zero-surprise path a
  scheduled pipeline should use: the schema is a declared contract,
  not whatever the newest writer produced. Physical types must match
  the files; value-level drift is ``conform``'s job.

``conform`` is the shared normalizer: project a frame onto a target
schema (add missing columns as typed NULLs, cast drifted types, drop
extras) — the same contract applied to frames that arrive from
non-parquet sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Union-of-schemas read across every file under ``path``."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_conformed(
    spark: SparkSession, path: str, target_schema: T.StructType
) -> DataFrame:
    """Contract read: the declared schema wins. Older files missing a
    column produce NULLs; newer files' extra columns never leave the
    scan (column pruning happens in the reader, not a later project)."""
    return spark.read.schema(target_schema).parquet(path)


def conform(df: DataFrame, target_schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target_schema``: missing columns become
    typed NULLs, present columns are cast to the target type, columns
    outside the contract are dropped. Pure projection — no shuffle."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target_schema.fields:
        if f.name in have:
            src = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                src = src.cast(f.dataType)
            cols.append(src.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
