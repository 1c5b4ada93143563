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

Usage:  python tools/window_check.py  (exit 1 on violation)
Also invoked by tests/test_driver_contract.py so `pytest` fails CI.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50


def checked_keys() -> set[str]:
    keys: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if isinstance(data, dict):
            keys.update(data.keys())
    return keys


def never_checked_outside_window() -> list[str]:
    sys.path.insert(0, REPO)
    from healthcare_oltp_to_olap_gcp_spark.api import QUERIES

    window = set(list(QUERIES)[:WINDOW_SIZE])
    done = checked_keys()
    return sorted(k for k in QUERIES if k not in done and k not in window)


def main() -> int:
    missing = never_checked_outside_window()
    if missing:
        print(
            f"{len(missing)} oracle-backed queries have never been "
            "driver-checked and are NOT in the current 50-entry window:"
        )
        for k in missing:
            print(f"  {k}")
        return 1
    print("window_check: every registered query is driver-checked or windowed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
