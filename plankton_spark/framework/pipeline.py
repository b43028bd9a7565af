"""Pipeline: named-operator DAG with cycle detection, fingerprint
caching and ledger-backed observability (SURVEY.md §2.12).

Execution model vs the reference: plankton runs independent subtrees
on goroutines because each Task materializes side effects eagerly.
Here every operator contributes to ONE lazy Spark plan; "parallelism
between siblings" is free (independent stages schedule concurrently
inside Spark), and an operator only materializes when it is a sink
(``outputs``) or explicitly persisted as a reused fan-out node.
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.operator import Operator


class CycleError(ValueError):
    pass


@dataclass
class _Node:
    op: Operator
    deps: list[str] = field(default_factory=list)
    sink_path: str | None = None  # parquet output → makes the op a sink
    metrics: dict[str, Column] | None = None  # observe() aggregates
    register_as: str | None = None  # SQL catalog name for the sink


class Pipeline:
    def __init__(
        self,
        name: str,
        spark: SparkSession,
        ledger: RunLedger | None = None,
        cache_window_sec: float | None = None,
    ) -> None:
        self.name = name
        self.spark = spark
        self.ledger = ledger
        self.cache_window_sec = cache_window_sec
        self._nodes: dict[str, _Node] = {}

    # -- construction -------------------------------------------------
    def add(
        self,
        op: Operator,
        deps: Sequence[str] = (),
        sink_path: str | None = None,
        metrics: dict[str, Column] | None = None,
        register_as: str | None = None,
    ) -> "Pipeline":
        """``metrics`` are ``df.observe()`` aggregate expressions
        (e.g. ``{"rows": F.count(F.lit(1))}``) recorded into the
        ledger's success row. They piggyback on the sink's own write
        action — zero extra scans, unlike a separate ``df.count()`` —
        so they require ``sink_path`` (nothing materializes
        otherwise; plankton's run-record row counts, Spark-side).

        ``register_as`` (round-9 verdict #7) registers the sink into
        the SQL catalog under that name after every successful (or
        cache-skipped) run — catalog.register(..., fmt="parquet"), so
        a scheduled pipeline's outputs stay queryable BY NAME across
        sessions (the Derby metastore persists the registration) and
        the ledger records which name each run refreshed. Requires
        ``sink_path``.
        """
        if op.name in self._nodes:
            raise ValueError(f"duplicate operator name {op.name!r}")
        if metrics and sink_path is None:
            raise ValueError(
                f"operator {op.name!r}: metrics need a sink_path — "
                "observe() only fires when an action materializes"
            )
        if register_as is not None and sink_path is None:
            raise ValueError(
                f"operator {op.name!r}: register_as needs a sink_path — "
                "only a materialized output can back a catalog name"
            )
        self._nodes[op.name] = _Node(
            op, list(deps), sink_path, metrics, register_as
        )
        return self

    def topo_order(self) -> list[str]:
        """Kahn's algorithm; raises CycleError naming a cycle member."""
        indeg = {n: 0 for n in self._nodes}
        for name, node in self._nodes.items():
            for d in node.deps:
                if d not in self._nodes:
                    raise KeyError(f"{name!r} depends on unknown operator {d!r}")
                indeg[name] += 1
        ready = sorted(n for n, d in indeg.items() if d == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m, node in sorted(self._nodes.items()):
                if n in node.deps:
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        ready.append(m)
            ready.sort()
        if len(order) != len(self._nodes):
            stuck = sorted(set(self._nodes) - set(order))
            raise CycleError(f"dependency cycle involving {stuck}")
        return order

    # -- execution ----------------------------------------------------
    def run(self, force: bool = False) -> dict[str, DataFrame]:
        """Compose and execute the DAG.

        Each operator's fingerprint chains its upstream fingerprints;
        a sink whose fingerprint has a fresh ledger success (and whose
        output exists) is skipped and re-read — plankton's cache-skip.
        """
        run_id = uuid.uuid4().hex[:12]
        results: dict[str, DataFrame] = {}
        fps: dict[str, str] = {}
        fanout = self._fanout_counts()
        order = self.topo_order()
        # pre-log every op as waiting so a live watcher (cli watch /
        # pipeline_watch) sees the full DAG with per-op states from the
        # first instant of the run — plankton's terminal task view.
        for name in order:
            self._log(run_id, name, "", "waiting", self._nodes[name].sink_path)
        for name in order:
            node = self._nodes[name]
            fp = node.op.fingerprint([fps[d] for d in node.deps])
            fps[name] = fp
            cached = (
                not force
                and node.sink_path is not None
                and self.ledger is not None
                and self.ledger.has_fresh_success(fp, self.cache_window_sec)
            )
            if cached:
                results[name] = self.spark.read.parquet(node.sink_path)
                self._register(node)
                self._log(run_id, name, fp, "skipped_cached", node.sink_path)
                continue
            self._log(run_id, name, fp, "running", node.sink_path)
            t0 = time.time()
            observation: Observation | None = None
            try:
                df = node.op.transform({d: results[d] for d in node.deps})
                if fanout.get(name, 0) > 1:
                    # reused fan-out node: persist once instead of
                    # recomputing the subtree per consumer
                    df = df.persist()
                if node.metrics:
                    observation = Observation(f"{name}-{run_id}")
                    df = df.observe(
                        observation,
                        *[c.alias(k) for k, c in node.metrics.items()],
                    )
                if node.sink_path is not None:
                    df.write.mode("overwrite").parquet(node.sink_path)
                    df = self.spark.read.parquet(node.sink_path)
                results[name] = df
            except Exception:
                self._log(run_id, name, fp, "failed", node.sink_path, t0)
                raise
            self._register(node)
            self._log(
                run_id,
                name,
                fp,
                "success",
                node.sink_path,
                t0,
                metrics=observation.get if observation is not None else None,
            )
        return results

    def _register(self, node: _Node) -> None:
        """(Re-)register a sink's catalog name after it materialized —
        also on cache-skip, so a fresh session's first scheduled run
        still leaves the name resolvable."""
        if node.register_as is None:
            return
        from plankton_spark import catalog

        catalog.register(
            self.spark, node.register_as, node.sink_path, "parquet"
        )

    def _fanout_counts(self) -> dict[str, int]:
        counts: dict[str, int] = {}
        for node in self._nodes.values():
            for d in node.deps:
                counts[d] = counts.get(d, 0) + 1
        return counts

    def _log(
        self,
        run_id: str,
        op: str,
        fp: str,
        state: str,
        output_path: str | None,
        t0: float | None = None,
        metrics: dict | None = None,
    ) -> None:
        if self.ledger is None:
            return
        rec = {
            "run_id": run_id,
            "pipeline": self.name,
            "op": op,
            "fingerprint": fp,
            "state": state,
            "output_path": output_path,
        }
        reg = self._nodes.get(op)
        if reg is not None and reg.register_as is not None:
            rec["registered_as"] = reg.register_as
        if t0 is not None:
            rec["elapsed_sec"] = round(time.time() - t0, 3)
        if metrics is not None:
            rec["metrics"] = metrics
        self.ledger.append(rec)

    # -- observability ------------------------------------------------
    def describe(self, fmt: str = "text") -> str:
        """DAG rendering (plankton's terminal viz, sans colors)."""
        order = self.topo_order()
        if fmt == "mermaid":
            lines = ["graph TD"]
            for name in order:
                for d in self._nodes[name].deps:
                    lines.append(f"  {d} --> {name}")
                if not self._nodes[name].deps:
                    lines.append(f"  {name}")
            return "\n".join(lines)
        lines = [f"pipeline {self.name}:"]
        for name in order:
            deps = self._nodes[name].deps
            sink = self._nodes[name].sink_path
            arrow = f" <- {', '.join(deps)}" if deps else ""
            mark = f"  [sink {sink}]" if sink else ""
            if self._nodes[name].register_as:
                mark += f"  [sql {self._nodes[name].register_as}]"
            lines.append(f"  {name}{arrow}{mark}")
        return "\n".join(lines)


def pipeline_status(ledger: RunLedger) -> str:
    """`pipeline status` CLI view over the ledger."""
    rows = ledger.status()
    if not rows:
        return "no runs recorded"
    width = max(len(f"{r['pipeline']}/{r['op']}") for r in rows)
    out = []
    for r in rows:
        key = f"{r['pipeline']}/{r['op']}"
        extra = f" ({r['elapsed_sec']}s)" if "elapsed_sec" in r else ""
        out.append(f"{key:{width}s}  {r['state']}{extra}")
    return "\n".join(out)


_STATE_GLYPH = {
    "waiting": "○",
    "running": "◐",
    "success": "●",
    "skipped_cached": "◌",
    "failed": "✗",
}


def pipeline_watch(ledger: RunLedger, pipeline: str | None = None) -> str:
    """Live per-op state frame for the LATEST run of each pipeline
    (plankton's in-flight terminal DAG view, read from the ledger tail
    while run() executes in another process/thread). Ops appear in
    run order with waiting/running/success/skipped/failed glyphs."""
    latest_run: dict[str, str] = {}
    for rec in ledger.records():  # file order == time order
        p = rec.get("pipeline", "?")
        if pipeline is not None and p != pipeline:
            continue
        rid = rec.get("run_id")
        if rid:
            latest_run[p] = rid
    if not latest_run:
        return "no runs recorded"
    # latest state per op within each pipeline's newest run
    states: dict[str, dict[str, dict]] = {p: {} for p in latest_run}
    for rec in ledger.records():
        p = rec.get("pipeline", "?")
        if p in latest_run and rec.get("run_id") == latest_run[p]:
            states[p][rec.get("op", "?")] = rec
    out = []
    for p in sorted(states):
        out.append(f"{p} [{latest_run[p]}]")
        for op, rec in states[p].items():  # dict preserves insertion order
            st = rec.get("state", "?")
            extra = f" ({rec['elapsed_sec']}s)" if "elapsed_sec" in rec else ""
            out.append(f"  {_STATE_GLYPH.get(st, '?')} {op:24s} {st}{extra}")
    return "\n".join(out)
