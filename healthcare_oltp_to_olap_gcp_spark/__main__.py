"""CLI: run any registered query by name.

    python -m healthcare_oltp_to_olap_gcp_spark list
    python -m healthcare_oltp_to_olap_gcp_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 20 [--explain] [--oracle]

`run --oracle` prints the DuckDB oracle SQL alongside, so a user can
eyeball the exact cross-engine semantics of any operator.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="healthcare_oltp_to_olap_gcp_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    runp = sub.add_parser("run", help="run one query")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true", help="print the physical plan")
    runp.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from .api import QUERIES
    from .oracles import ORACLE_SQL

    if args.cmd == "list":
        for name in QUERIES:
            tag = "" if name in ORACLE_SQL else "  (rows-only: no SQL oracle)"
            print(f"{name}{tag}")
        return 0

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    if args.oracle:
        print(ORACLE_SQL.get(args.name, "-- no oracle (rows-only check)"))
    from .session import get_spark

    spark = get_spark(f"cli-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    print(f"[{args.name}] total rows: {df.count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
