"""Per-operator bench budget gate: compare a bench.py output line
against tools/bench_budgets.json and fail on any query exceeding
factor × its budget.

Usage:  python tools/bench_check.py BENCH.json [BUDGETS.json]

Budgets are the round-3 steady-state (min-of-2) measurements at sf0.1
on local[32]; the default factor 2.0 mirrors the driver's 2×-of-
baseline gate but binds PER QUERY, so a single operator regression
can't hide inside a healthy total. Queries missing from the budget
table (new operators) are reported informationally, never failed —
their first measured round becomes their budget.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    bench_path = argv[0]
    budget_path = (
        argv[1]
        if len(argv) > 1
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_budgets.json")
    )
    text = open(bench_path).read()
    try:
        # bench_full.json / BENCH_r*.json are whole-file JSON documents.
        bench = json.loads(text)
    except json.JSONDecodeError:
        line = [ln for ln in text.splitlines() if ln.startswith('{"metric"')][-1]
        bench = json.loads(line)
    if isinstance(bench.get("parsed"), dict) and "queries" in bench["parsed"]:
        # Driver BENCH_r*.json wraps the parsed line under "parsed".
        bench = bench["parsed"]
    if "full" in bench and len(bench.get("queries", {})) < bench.get("n_queries", 0):
        # Compact line: resolve the full per-query map next to this script.
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
        )
        if os.path.exists(full_path):
            bench = json.load(open(full_path))
    budgets = json.load(open(budget_path))
    factor = budgets.get("factor", 2.0)
    over, new = [], []
    for name, sec in bench["queries"].items():
        b = budgets["queries"].get(name)
        if b is None:
            new.append(name)
        elif sec > factor * b:
            over.append((name, sec, b))
    for name in new:
        print(f"NEW      {name}: {bench['queries'][name]}s (no budget yet)")
    for name, sec, b in sorted(over, key=lambda t: -t[1] / t[2]):
        print(f"OVER     {name}: {sec}s > {factor}x budget {b}s")
    ok = [n for n in bench["queries"] if n in budgets["queries"]]
    print(
        f"checked {len(ok)} budgeted queries: {len(over)} over budget, "
        f"{len(new)} unbudgeted"
    )
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
