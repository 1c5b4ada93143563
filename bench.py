"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() so the full plan executes (no
collect of payload rows — the driver measures engine time, not
driver-side materialization).

Per-query time is the MIN of two consecutive runs (caches cleared
between them): single cold runs measured 2x run-to-run swings on the
heavy dedup entries from JIT/codegen-compile timing and async cleaner
interference — steady-state engine time is the number that projects to
cluster throughput, and it's stable (±10%) run to run.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_oltp_to_olap_gcp_spark.api import QUERIES  # noqa: E402
from healthcare_oltp_to_olap_gcp_spark.session import get_spark  # noqa: E402

# Round 3: the ENTIRE registry is benched — the 2× gate binds per
# operator, not just on a headline subset (VERDICT r2 item 5).
# tools/bench_budgets.json carries the per-query budget table;
# tools/bench_check.py compares a bench line against it.
BENCH_QUERIES = tuple(QUERIES)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/catalyst paths once so per-query numbers measure the
    # plan, not first-run classloading — and spin up the Python worker
    # pool so the first pandas-UDF query isn't charged ~3s of worker
    # startup that every later pandas op amortizes.
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    spark.range(32, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def _settle() -> None:
        # Drop dead references so Spark's ContextCleaner can release
        # finished broadcasts/caches, and let the (async) cleanup land
        # OUTSIDE the next timed region — without the settle window its
        # unpersist/GC RPC storm hits mid-query.
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.range(1).count()
        time.sleep(0.3)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - start)
            _settle()
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
