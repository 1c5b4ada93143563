"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {worst-10 by time}, "n_queries": N, "sf": ...,
"full": "tools/bench_full.json"}.

The driver captures only the last ~2,000 characters of stdout, so the
final line must stay small: round 3's full 157-query map (~4 KB) was
truncated mid-object and BENCH_r03.json recorded ``parsed: null``
(VERDICT r3 item 1). The COMPLETE per-query map is written to
``tools/bench_full.json`` for tools/bench_check.py and humans; the
printed line carries the total plus the 10 slowest queries only.

Each query is forced through the NOOP SINK (`.write.format("noop")`)
so the FULL plan executes without driver-side materialization. r7
replaced the earlier count() force after proving count() lets
Catalyst prune the VALUE computation of fixed-row-count outputs: a
count() over an ungrouped aggregate knows the answer is one row per
branch and drops the aggregate expressions entirely (demonstrated by
a deliberately-failing cast inside an agg that count() never
triggered), which under-measured retrieval_quality_report 4.6x
(5.9s "count time" vs 27s honest execution). The noop sink writes
every output row, so nothing upstream is prunable.

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
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - start)
            _settle()
        timings[name] = round(best, 3)

    print(emit(timings, sf_dir))
    spark.stop()


def emit(timings: dict[str, float], sf_dir: str, full_path: str | None = None) -> str:
    """Write the full per-query map to tools/bench_full.json and return
    the compact (driver-safe, ≤1.5 KB) summary line."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf_val,
    }
    if full_path is None:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools", "bench_full.json"
        )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    worst = dict(sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10])
    compact = dict(full, queries=worst, full="tools/bench_full.json")
    line = json.dumps(compact)
    # Hard guard: the driver keeps ~2,000 trailing chars; stay well under.
    assert len(line) <= 1500, f"compact bench line too long: {len(line)}"
    return line


if __name__ == "__main__":
    main()
