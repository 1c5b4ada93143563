"""Driver-window rotation gate (VERDICT r3 item 8).

The driver's correctness gate checks only the FIRST 50 entries of
``QUERIES`` (insertion order = ``api._PRIORITY``). Rounds 2 and 3 both
shipped operators that never received a driver CORRECTNESS row because
they landed outside the window and were never rotated in. This tool
makes that gap a hard failure:

every registered query key — oracle-backed OR rows-only — must be
EITHER
  (a) present in some CORRECTNESS_r*.json (driver-checked at least
      once; rows-only entries log an `err: no_oracle` row, which still
      proves the query ran end-to-end on driver data), OR
  (b) inside the current 50-entry window (will be checked this round).

Round 5 widened the gate from ORACLE_SQL keys to ALL of QUERIES: the
r4 verdict (item 7) found three rows-only entries that had silently
never run under the driver because the old gate only tracked
oracle-backed keys.

Round 7 added RECENCY (VERDICT r6 item 2): "checked at least once"
let 71 queries sit on r1-r3 driver rows while shared helpers drifted
underneath them. Now every query's age — (next driver round) minus
(its most recent CORRECTNESS row), with in-window queries counting as
refreshed this round — must be < STALE_LIMIT rounds. STALE_LIMIT = 6:
with ~210 registered queries, a 50-slot window, and a handful of
window slots per round going to brand-new operators and risk-ranked
re-verifies, a full oldest-first rotation takes ⌈210/45⌉ ≈ 5 rounds,
so 6 is the tightest bound a sustained oldest-first rotation can
always satisfy (the verdict's literal "≥ 4 rounds old" ask is
unsatisfiable: 71 stale queries > 50 slots in the very round it was
issued, and the steady-state cycle exceeds 4 rounds).

Usage:  python tools/window_check.py  (exit 1 on violation)
Also invoked by tests/test_driver_contract.py so `pytest` fails CI.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50
STALE_LIMIT = 6  # max rounds since a query's last driver CORRECTNESS row


def last_checked() -> tuple[dict[str, int], int]:
    """(query -> most recent round with a CORRECTNESS row, latest round)."""
    last: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(data, dict):
            continue
        latest = max(latest, rnd)
        for k in data:
            last[k] = max(last.get(k, 0), rnd)
    return last, latest


def violations() -> tuple[list[str], list[str]]:
    """(never-checked outside window, stale outside window)."""
    sys.path.insert(0, REPO)
    from healthcare_oltp_to_olap_gcp_spark.api import QUERIES

    window = set(list(QUERIES)[:WINDOW_SIZE])
    last, latest = last_checked()
    next_round = latest + 1
    never = sorted(k for k in QUERIES if k not in last and k not in window)
    stale = sorted(
        k
        for k in QUERIES
        if k in last and k not in window and next_round - last[k] >= STALE_LIMIT
    )
    return never, stale


def main() -> int:
    never, stale = violations()
    if never:
        print(
            f"{len(never)} registered queries have never been "
            "driver-checked and are NOT in the current 50-entry window:"
        )
        for k in never:
            print(f"  {k}")
    if stale:
        print(
            f"{len(stale)} registered queries' most recent driver "
            f"CORRECTNESS row is >= {STALE_LIMIT} rounds old and they "
            "are NOT in the current window:"
        )
        for k in stale:
            print(f"  {k}")
    if never or stale:
        return 1
    print(
        "window_check: every registered query is windowed, or "
        f"driver-checked within the last {STALE_LIMIT - 1} rounds"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
