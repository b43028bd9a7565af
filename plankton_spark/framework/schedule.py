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

import functools
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


@functools.lru_cache(maxsize=256)
def _parse_cron(expr: str):
    """Parse a 5-field cron expression into (minute, hour, dom, month,
    dow) value sets plus the dom/dow 'was *' flags (needed for the
    classic OR rule). Supports *, lists, ranges and /steps."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron expression needs 5 fields, got {len(fields)}: {expr!r}")
    bounds = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]
    names = ["minute", "hour", "day-of-month", "month", "day-of-week"]
    sets = []
    for spec, (lo, hi), fname in zip(fields, bounds, names):
        vals: set[int] = set()
        for part in spec.split(","):
            step = 1
            body = part
            if "/" in part:
                body, step_s = part.split("/", 1)
                if not step_s.isdigit() or int(step_s) < 1:
                    raise ValueError(f"bad step in {fname}: {part!r}")
                step = int(step_s)
            if body == "*":
                rng = range(lo, hi + 1)
            elif "-" in body:
                a_s, b_s = body.split("-", 1)
                a, b = int(a_s), int(b_s)
                if not (lo <= a <= b <= hi):
                    raise ValueError(f"bad range in {fname}: {part!r}")
                rng = range(a, b + 1)
            else:
                v = int(body)
                if not (lo <= v <= hi):
                    raise ValueError(f"{fname} value {v} out of [{lo}, {hi}]")
                # vixie extension: "N/step" means start at N
                rng = range(v, hi + 1) if step > 1 else range(v, v + 1)
            vals.update(x for i, x in enumerate(rng) if i % step == 0)
        if fname == "day-of-week" and 7 in vals:
            vals.discard(7)  # 7 == Sunday == 0
            vals.add(0)
        sets.append(frozenset(vals))
    dom_star = fields[2] == "*"
    dow_star = fields[4] == "*"
    return tuple(sets), dom_star, dow_star


@dataclass(frozen=True)
class Cron:
    """Standard 5-field cron schedule (minute hour dom month dow) —
    plankton registers pipelines on cron expressions; this is the
    no-dependency parity implementation. Classic semantics: dow 0/7 =
    Sunday; when BOTH day-of-month and day-of-week are restricted the
    match is their OR. Times are UTC unless utc=False (local)."""

    expr: str
    utc: bool = True

    def __post_init__(self) -> None:
        _parse_cron(self.expr)  # validate eagerly

    def _matches(self, tm: time.struct_time) -> bool:
        (minute, hour, dom, month, dow), dom_star, dow_star = _parse_cron(self.expr)
        if tm.tm_min not in minute or tm.tm_hour not in hour or tm.tm_mon not in month:
            return False
        dom_ok = tm.tm_mday in dom
        dow_ok = (tm.tm_wday + 1) % 7 in dow  # struct_time Mon=0 → cron Sun=0
        if dom_star and dow_star:
            return True
        if dom_star:
            return dow_ok
        if dow_star:
            return dom_ok
        return dom_ok or dow_ok

    def next_fire(self, after: float) -> float:
        """Epoch seconds of the first fire time strictly after `after`."""
        t = (int(after) // 60 + 1) * 60
        to_tm = time.gmtime if self.utc else time.localtime
        for _ in range(800 * 24 * 60):  # > 2 years covers any valid expr
            if self._matches(to_tm(t)):
                return float(t)
            t += 60
        raise ValueError(f"cron expression never fires: {self.expr!r}")

    def due(self, last_run_ts: float | None, now: float | None = None) -> bool:
        """Due iff a scheduled fire time elapsed since the last run
        (first-ever tick is always due)."""
        now = time.time() if now is None else now
        if last_run_ts is None:
            return True
        return self.next_fire(last_run_ts) <= now


def last_run_ts(ledger: RunLedger, pipeline_name: str) -> float | None:
    ts = None
    for rec in ledger.records():
        if rec.get("pipeline") == pipeline_name and rec.get("state") == "success":
            ts = rec["ts"] if ts is None else max(ts, rec["ts"])
    return ts


def run_if_due(
    pipeline: Pipeline,
    schedule: "Every | Cron",
    now: float | None = None,
    force: bool = False,
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
