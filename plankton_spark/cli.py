"""Tiny CLI over the framework (plankton's status client / DAG viz,
SURVEY.md §2.12): `python -m plankton_spark.cli status <ledger>` and
`... tail <ledger>` read the run ledger; no RPC server needed — live
Spark state is already served by the Spark UI."""

from __future__ import annotations

import argparse
import json
import sys

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.pipeline import pipeline_status, pipeline_watch


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="plankton-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    st = sub.add_parser("status", help="latest state per pipeline/op")
    st.add_argument("ledger")
    tl = sub.add_parser("tail", help="print raw ledger records")
    tl.add_argument("ledger")
    tl.add_argument("-n", type=int, default=10)
    wt = sub.add_parser(
        "watch",
        help="live per-op DAG state of the latest run (re-renders until "
        "every op reaches a terminal state)",
    )
    wt.add_argument("ledger")
    wt.add_argument("--pipeline", default=None)
    wt.add_argument("--interval", type=float, default=0.5)
    wt.add_argument(
        "--frames", type=int, default=0, help="max frames (0 = until terminal)"
    )
    args = ap.parse_args(argv)

    ledger = RunLedger(args.ledger)
    if args.cmd == "status":
        print(pipeline_status(ledger))
    elif args.cmd == "tail":
        recs = list(ledger.records())[-args.n :]
        for r in recs:
            print(json.dumps(r, sort_keys=True))
    elif args.cmd == "watch":
        import time as _time

        n = 0
        while True:
            frame = pipeline_watch(ledger, args.pipeline)
            print(frame, flush=True)
            n += 1
            terminal = frame == "no runs recorded" or not any(
                s in frame for s in ("waiting", "running")
            )
            if terminal or (args.frames and n >= args.frames):
                break
            print("---", flush=True)
            _time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    sys.exit(main())
