"""Core-scaling probe at sf1 (VERDICT r9 item 8): every top-10 query's
8-core/32-core ratio at sf0.1 is ≤1.1 — at that SF the heavy queries
are bound by per-stage scheduling, not parallel work, so core-scaling
claims were unmeasured. This tool measures the SAME queries against an
sf1-sized amplification (scale_probe.amplify, the id-shifted 10x union
— synthetic amplification for performance only, never correctness) at
two core counts, so SCALING.md can carry a real parallel-speedup
number.

Usage:
  python tools/core_probe.py prepare DIR q1 q2 ...   # amplify once
  SPARK_GRAFT_CPUS=32 python tools/core_probe.py run DIR q1 q2 ...
  SPARK_GRAFT_CPUS=8  python tools/core_probe.py run DIR q1 q2 ...

`run` prints one `name\\tseconds` line per query (min of
$CORE_PROBE_RUNS runs, default 2, noop-sink forced, cleaner-settle
between runs — bench.py's methodology). The session honors
$SPARK_GRAFT_CPUS through the ordinary get_spark factory, so the probe
exercises exactly the session the driver's bench builds.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_oltp_to_olap_gcp_spark.api import QUERIES  # noqa: E402
from healthcare_oltp_to_olap_gcp_spark.session import get_spark  # noqa: E402

import scale_probe  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = 10


def main() -> None:
    mode, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    unknown = [q for q in names if q not in scale_probe.PROBES]
    if unknown:
        raise SystemExit(f"no PROBES amplification spec: {unknown}")
    spark = get_spark(f"core-probe-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "prepare":
        needed: dict[str, list[str]] = {}
        for name in names:
            needed.update(scale_probe.PROBES[name])
        scale_probe.amplify(spark, out_dir, needed, FACTOR)
        print(f"amplified {sorted(needed)} x{FACTOR} -> {out_dir}")
        spark.stop()
        return
    assert mode == "run"
    runs = int(os.environ.get("CORE_PROBE_RUNS", "2"))
    QUERIES["q1_pricing_summary"](spark, SF_DIR).count()
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

    def _settle() -> None:
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.range(1).count()
        time.sleep(0.3)

    for name in names:
        spark.sparkContext.setJobDescription(f"core-probe:{name}")
        best = float("inf")
        for _ in range(runs):
            start = time.perf_counter()
            QUERIES[name](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - start)
            _settle()
        print(f"{name}\t{best:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
