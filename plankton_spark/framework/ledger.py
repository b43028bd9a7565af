"""Run ledger: plankton's GORM run-record DB re-expressed as an
append-only JSON-lines file (driver-side metadata, tiny — a real
deployment can point it at Delta/JDBC by swapping this class).

Record shape: {run_id, pipeline, op, fingerprint, state, started_at,
finished_at, output_path, rows}. States: running | success | failed |
skipped_cached.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Iterator


class RunLedger:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, record: dict[str, Any]) -> None:
        record = {"ts": time.time(), **record}
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def records(self) -> Iterator[dict[str, Any]]:
        if not os.path.exists(self.path):
            return
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)

    def latest_success(self, fp: str) -> dict[str, Any] | None:
        """Most recent successful record for a fingerprint — but only
        if no LATER attempt of the same fingerprint failed or is still
        in flight. A forced re-run that dies mid-overwrite leaves a
        partially-written sink (parquet overwrite is not atomic on a
        local FS); trusting the older success would read that partial
        output as cached. Any newer failed/running record therefore
        invalidates prior successes."""
        best = None
        for rec in self.records():
            if rec.get("fingerprint") != fp:
                continue
            state = rec.get("state")
            if state == "success":
                if best is None or rec["ts"] > best["ts"]:
                    best = rec
            elif state in ("failed", "running"):
                if best is not None and rec["ts"] > best["ts"]:
                    best = None
        return best

    def has_fresh_success(self, fp: str, max_age_sec: float | None) -> bool:
        """plankton's cache-window: skip if a success is fresh enough
        and its output (if any) still exists."""
        rec = self.latest_success(fp)
        if rec is None:
            return False
        if max_age_sec is not None and time.time() - rec["ts"] > max_age_sec:
            return False
        out = rec.get("output_path")
        if out and not os.path.exists(out):
            return False
        return True

    def status(self) -> list[dict[str, Any]]:
        """Latest state per (pipeline, op) — the `pipeline status` view."""
        latest: dict[tuple[str, str], dict[str, Any]] = {}
        for rec in self.records():
            key = (rec.get("pipeline", "?"), rec.get("op", "?"))
            if key not in latest or rec["ts"] >= latest[key]["ts"]:
                latest[key] = rec
        return [latest[k] for k in sorted(latest)]
