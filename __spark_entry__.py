"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-fact build at sf0.001; ``queries`` /
``oracle_sql`` expose every operator from SURVEY.md §2 (see
healthcare_oltp_to_olap_gcp_spark/api.py and oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_oltp_to_olap_gcp_spark.api import QUERIES  # noqa: E402
from healthcare_oltp_to_olap_gcp_spark.oracles import ORACLE_SQL  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the deduplicated, dimension-keyed star fact
    (reference sql/bq_fact_vitals_star.sql) on sf0.001."""
    return QUERIES["fact_events_star"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
