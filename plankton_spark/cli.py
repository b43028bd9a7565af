"""Tiny CLI over the framework (plankton's status client / DAG viz,
SURVEY.md §2.12): `python -m plankton_spark.cli status <ledger>` and
`... tail <ledger>` read the run ledger; no RPC server needed — live
Spark state is already served by the Spark UI."""

from __future__ import annotations

import argparse
import json
import sys

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.pipeline import pipeline_status


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="plankton-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    st = sub.add_parser("status", help="latest state per pipeline/op")
    st.add_argument("ledger")
    tl = sub.add_parser("tail", help="print raw ledger records")
    tl.add_argument("ledger")
    tl.add_argument("-n", type=int, default=10)
    args = ap.parse_args(argv)

    ledger = RunLedger(args.ledger)
    if args.cmd == "status":
        print(pipeline_status(ledger))
    elif args.cmd == "tail":
        recs = list(ledger.records())[-args.n :]
        for r in recs:
            print(json.dumps(r, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
