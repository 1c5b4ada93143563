"""Surrogate-key and typing helpers shared by the star-schema plans.

Reference parity: the reference derives surrogate keys as
``TO_HEX(SHA256(x))`` (see /root/reference/sql/bq_dim_patient.sql:6).
Spark's ``sha2(col, 256)`` produces the same lowercase hex digest, fully
JVM-side (whole-stage codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


def date_key(ts: Column | str) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(c)


def as_long(c: Column) -> Column:
    return c.cast("long")


def money_sum(expr: Column) -> Column:
    """Deterministic money aggregate: per-row cast to DECIMAL(18,8),
    then exact decimal SUM — order- and partitioning-independent, unlike
    double sums. Scale 8 sits two digits below the true decimal precision
    of price arithmetic (≤6 digits) but far above double noise, so every
    engine rounds the per-row double to the same grid point regardless of
    its double→decimal rounding method. The final cast to double maps the
    one exact decimal to the one nearest double — bit-identical across
    engines, plain float64 schema.
    """
    return F.sum(expr.cast("decimal(18,8)")).cast("double")
