"""Scheduler-tick + CLI tests (SURVEY.md §2.12 parity tail)."""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.cli import main as cli_main
from plankton_spark.framework import Operator, Pipeline, RunLedger
from plankton_spark.framework.schedule import Every, last_run_ts, run_if_due
from plankton_spark.io import read_table
from tests.conftest import SF0001


def _pipeline(spark, ledger):
    op = Operator.wrap(
        "count_regions",
        lambda _: read_table(spark, SF0001, "region").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    return Pipeline("sched", spark, ledger=ledger, cache_window_sec=3600).add(op)


def test_every_due_logic():
    s = Every(60)
    assert s.due(None)
    assert s.due(0.0, now=100.0)
    assert not s.due(90.0, now=100.0)


def test_run_if_due_and_skip(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "l.jsonl"))
    p = _pipeline(spark, ledger)
    assert run_if_due(p, Every(3600)) is True
    ts1 = last_run_ts(ledger, "sched")
    assert ts1 is not None
    # immediately due again? no.
    p2 = _pipeline(spark, ledger)
    assert run_if_due(p2, Every(3600)) is False
    # force overrides the schedule
    p3 = _pipeline(spark, ledger)
    assert run_if_due(p3, Every(3600), force=True) is True


def test_cli_status_and_tail(spark, tmp_path, capsys):
    ledger_path = str(tmp_path / "l.jsonl")
    ledger = RunLedger(ledger_path)
    _pipeline(spark, ledger).run()
    assert cli_main(["status", ledger_path]) == 0
    out = capsys.readouterr().out
    assert "sched/count_regions" in out and "success" in out
    assert cli_main(["tail", ledger_path, "-n", "2"]) == 0
    out = capsys.readouterr().out
    assert '"state"' in out
