"""Arrow-backed local frames for driver-built model artifacts (r9).

``spark.createDataFrame(list_of_tuples, schema)`` produces an
RDD-BACKED frame: every action on any plan containing it re-evaluates
the rows through a Python worker (guide §4 — the JVM↔Python boundary),
measured ~0.7 s PER ACTION for a 16-row centroid table at sf0.1 and
~6 s for the streaming sentinel writes. Routing the same rows through
pandas + Arrow ships them to the JVM once at construction; every later
action is JVM-only (measured 45x per action on the centroid table).

Values are bit-exact either way: Arrow carries the binary doubles, no
text round-trip. When the session has Arrow disabled (the driver's
plain correctness session), Spark silently falls back to its row-wise
conversion — same values, original speed — so correctness never
depends on the session conf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a small driver-local DataFrame from ``rows`` (tuples, in
    ``schema`` column order) via pandas + Arrow. ``rows`` must be
    non-empty (empty-input short-circuits keep the plain
    ``createDataFrame([], schema)`` — nothing ever executes those)."""
    import pandas as pd

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    names = [c.strip().split(None, 1)[0] for c in schema.split(",")]
    pdf = pd.DataFrame({n: [r[i] for r in rows] for i, n in enumerate(names)})
    return spark.createDataFrame(pdf, schema=schema)
