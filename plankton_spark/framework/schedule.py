"""Scheduling helper (plankton cron-parity, SURVEY.md §2.12).

The reference registers pipelines on cron-like schedules in one
long-lived process. On Spark the engine-correct split is: external
schedulers (cron/Airflow/k8s) own *when*, this helper owns *what a
scheduled tick does* — run the pipeline if due, lean on the ledger's
fingerprint cache so redundant ticks are near-free, and let
Structured Streaming's availableNow trigger serve the
"micro-batch backfill on a schedule" pattern natively.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.pipeline import Pipeline


@dataclass(frozen=True)
class Every:
    """Minimal interval schedule (cron stand-in without external deps)."""

    seconds: float

    def due(self, last_run_ts: float | None, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        return last_run_ts is None or now - last_run_ts >= self.seconds


def last_run_ts(ledger: RunLedger, pipeline_name: str) -> float | None:
    ts = None
    for rec in ledger.records():
        if rec.get("pipeline") == pipeline_name and rec.get("state") == "success":
            ts = rec["ts"] if ts is None else max(ts, rec["ts"])
    return ts


def run_if_due(
    pipeline: Pipeline, schedule: Every, now: float | None = None, force: bool = False
) -> bool:
    """One scheduler tick: run the pipeline if the schedule says so.

    Returns True if a run happened. Ops whose fingerprints are cached
    within the pipeline's cache window are skipped inside run() — so
    an aggressive tick interval degrades to ledger lookups, matching
    the reference's cache-window semantics.
    """
    if pipeline.ledger is None:
        raise ValueError("scheduled pipelines need a ledger")
    last = last_run_ts(pipeline.ledger, pipeline.name)
    if not force and not schedule.due(last, now):
        return False
    pipeline.run(force=force)
    return True
