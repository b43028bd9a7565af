"""Scheduler-tick + CLI tests (SURVEY.md §2.12 parity tail)."""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.cli import main as cli_main
from plankton_spark.framework import Operator, Pipeline, RunLedger
from plankton_spark.framework.schedule import Cron, Every, last_run_ts, run_if_due
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


def _utc(y, mo, d, h, mi) -> float:
    import calendar

    return float(calendar.timegm((y, mo, d, h, mi, 0, 0, 0, 0)))


def test_cron_next_fire():
    c = Cron("*/15 * * * *")
    assert c.next_fire(_utc(2026, 8, 13, 10, 7)) == _utc(2026, 8, 13, 10, 15)
    assert c.next_fire(_utc(2026, 8, 13, 10, 15)) == _utc(2026, 8, 13, 10, 30)
    daily = Cron("30 2 * * *")
    assert daily.next_fire(_utc(2026, 8, 13, 3, 0)) == _utc(2026, 8, 14, 2, 30)
    monthly = Cron("0 0 1 * *")
    assert monthly.next_fire(_utc(2026, 8, 13, 0, 0)) == _utc(2026, 9, 1, 0, 0)
    # 2026-08-17 is a Monday
    weekly = Cron("0 9 * * 1")
    assert weekly.next_fire(_utc(2026, 8, 13, 0, 0)) == _utc(2026, 8, 17, 9, 0)
    # dow 7 == Sunday == 0; 2026-08-16 is a Sunday
    assert Cron("0 9 * * 7").next_fire(_utc(2026, 8, 13, 0, 0)) == _utc(
        2026, 8, 16, 9, 0
    )


def test_cron_dom_dow_or_rule():
    # both fields restricted → classic OR: fires on the 13th AND on
    # every Friday. 2026-08-13 is a Thursday, 2026-08-14 a Friday.
    c = Cron("0 0 13 * 5")
    assert c.next_fire(_utc(2026, 8, 12, 0, 0)) == _utc(2026, 8, 13, 0, 0)
    assert c.next_fire(_utc(2026, 8, 13, 0, 0)) == _utc(2026, 8, 14, 0, 0)
    assert c.next_fire(_utc(2026, 8, 14, 0, 0)) == _utc(2026, 8, 21, 0, 0)


def test_cron_due_windows():
    c = Cron("0 * * * *")  # top of every hour
    assert c.due(None)
    # last ran 10:05, now 10:30 → no fire elapsed
    assert not c.due(_utc(2026, 8, 13, 10, 5), now=_utc(2026, 8, 13, 10, 30))
    # now 11:00 → the 11:00 fire elapsed
    assert c.due(_utc(2026, 8, 13, 10, 5), now=_utc(2026, 8, 13, 11, 0))


def test_cron_lists_ranges_steps():
    c = Cron("5,35 8-17/3 * 1,6 *")
    t = c.next_fire(_utc(2026, 1, 1, 0, 0))
    assert t == _utc(2026, 1, 1, 8, 5)
    assert c.next_fire(t) == _utc(2026, 1, 1, 8, 35)
    assert c.next_fire(_utc(2026, 1, 31, 17, 35)) == _utc(2026, 6, 1, 8, 5)


def test_cron_validation():
    import pytest

    for bad in ("* * * *", "60 * * * *", "* 24 * * *", "* * 0 * *",
                "* * * 13 *", "* * * * 8", "*/0 * * * *", "5-1 * * * *"):
        with pytest.raises(ValueError):
            Cron(bad)


def test_run_if_due_with_cron(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "lc.jsonl"))
    p = _pipeline(spark, ledger)
    assert run_if_due(p, Cron("0 0 1 1 *")) is True  # first tick always due
    p2 = _pipeline(spark, ledger)
    assert run_if_due(p2, Cron("0 0 1 1 *")) is False  # next Jan 1 not elapsed
    import time

    p3 = _pipeline(spark, ledger)
    # two minutes from now, an every-minute fire has certainly elapsed
    assert run_if_due(p3, Cron("* * * * *"), now=time.time() + 120) is True


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


def test_watch_renders_live_state_transitions(spark, tmp_path):
    """Drive a two-op pipeline in a thread and poll pipeline_watch:
    frames must show ops waiting, then running, then all terminal —
    the in-flight DAG view plankton renders in the terminal."""
    import threading
    import time

    from plankton_spark.framework.pipeline import pipeline_watch

    ledger = RunLedger(str(tmp_path / "lw.jsonl"))
    slow = Operator.wrap(
        "slow_src",
        lambda _: (time.sleep(1.0), read_table(spark, SF0001, "region"))[1],
    )
    agg = Operator.wrap(
        "agg_n", lambda ins: ins["slow_src"].agg(F.count(F.lit(1)).alias("n"))
    )
    p = Pipeline("watchme", spark, ledger=ledger)
    p.add(slow).add(agg, deps=["slow_src"])

    frames: list[str] = []
    t = threading.Thread(target=p.run)
    t.start()
    while t.is_alive():
        frames.append(pipeline_watch(ledger, "watchme"))
        time.sleep(0.05)
    t.join()
    final = pipeline_watch(ledger, "watchme")
    frames.append(final)

    assert any("waiting" in f for f in frames)  # agg_n waits on slow_src
    assert any("running" in f for f in frames)  # mid-flight state seen
    assert "success" in final and "waiting" not in final and "running" not in final
    assert "watchme" in final and "agg_n" in final


def test_watch_cli_command(spark, tmp_path, capsys):
    ledger_path = str(tmp_path / "lw2.jsonl")
    ledger = RunLedger(ledger_path)
    _pipeline(spark, ledger).run()
    assert cli_main(["watch", ledger_path, "--frames", "2"]) == 0
    out = capsys.readouterr().out
    assert "sched" in out and "success" in out


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
