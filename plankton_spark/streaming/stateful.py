"""Custom stateful streaming with a backend chooser (SURVEY.md §2.9).

Spark 4 has TWO custom-state APIs:

- ``applyInPandasWithState`` (APWS, the GroupState API) — pure Arrow
  transport, no extra Python dependencies, shipped since Spark 3.4.
- ``transformWithStateInPandas`` (TWS, the StatefulProcessor API) —
  the successor, richer state types (value/list/map state, timers,
  TTL), but its Python state client speaks protobuf to the JVM state
  server, so it needs ``google.protobuf`` on the executors
  (requirements-optional.txt pins the version range pyspark declares).

Both express the same operator here: per-key running totals held in
executor state. ``running_totals`` picks the backend at call time —
``auto`` uses TWS when protobuf is importable (the richer API, and the
one Spark is investing in) and falls back to APWS otherwise, so the
SAME pipeline code runs in this sandbox (no protobuf) and on a real
cluster image (protobuf present) without edits.

Exactness: totals accumulate as integer ten-thousandths
(``round(value * 10000)`` per row) in state, NOT as floats — batch
boundaries must not change the answer, and float accumulation order
across micro-batches would. The emitted ``n_rows`` is CUMULATIVE, so
the final row per key (the one with max n_rows) is well-defined even
when the source replays as many micro-batches.
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = "user_id long, total_e4 long, n_rows long"


def tws_available() -> bool:
    """True when transformWithStateInPandas can run: its Python state
    client imports google.protobuf at worker startup."""
    return (
        importlib.util.find_spec("google") is not None
        and importlib.util.find_spec("google.protobuf") is not None
    )


def choose_backend(requested: str = "auto") -> str:
    """Resolve ``auto|tws|apws`` to the backend that will run.

    ``auto`` → tws when protobuf is present, else apws. Forcing
    ``tws`` without protobuf raises immediately (driver-side) instead
    of letting every executor crash at worker startup.
    """
    if requested not in ("auto", "tws", "apws"):
        raise ValueError(f"backend must be auto|tws|apws, got {requested!r}")
    if requested == "auto":
        return "tws" if tws_available() else "apws"
    if requested == "tws" and not tws_available():
        raise RuntimeError(
            "backend=tws but google.protobuf is not installed — "
            "transformWithStateInPandas's state client requires it "
            "(see requirements-optional.txt); use backend=auto to fall "
            "back to applyInPandasWithState"
        )
    return requested


def _purchases(events: DataFrame) -> DataFrame:
    from plankton_spark.streaming.jobs import with_second_ts

    e = with_second_ts(events).where(F.col("event_type") == "purchase")
    return e.withColumn(
        "value_e4", F.round(F.col("value") * 10000).cast("long")
    ).withWatermark("ts2", "1 hour")


def _apws_totals(events: DataFrame) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def running_total(key, pdfs, state):
        total, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += int(pdf["value_e4"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_e4": [total], "n_rows": [n]}
        )

    return (
        _purchases(events)
        .groupBy("user_id")
        .applyInPandasWithState(
            running_total,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType="total long, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _tws_totals(events: DataFrame) -> DataFrame:
    # Imported lazily: the module imports google.protobuf transitively.
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    import pandas as pd

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("st", "total long, n long")

        def handleInputRows(self, key, rows, timerValues):
            total, n = self._st.get() if self._st.exists() else (0, 0)
            for pdf in rows:
                total += int(pdf["value_e4"].sum())
                n += len(pdf)
            self._st.update((total, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total_e4": [total], "n_rows": [n]}
            )

        def close(self) -> None:
            pass

    return (
        _purchases(events)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotal(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_totals(events: DataFrame, backend: str = "auto") -> DataFrame:
    """Per-user running purchase totals in executor state.

    Returns a streaming DataFrame (user_id, total_e4, n_rows) in
    update mode; one row per key per micro-batch that touched it, the
    final row per key carrying the full total. State is two longs per
    user — at 100 TB of events, bounded by |users|, checkpointed,
    watermark-scoped.
    """
    resolved = choose_backend(backend)
    return _tws_totals(events) if resolved == "tws" else _apws_totals(events)


def finalize_totals(updates: DataFrame) -> DataFrame:
    """Collapse an update-mode emission log to final per-key rows:
    n_rows is cumulative, so max-n_rows per key is the last state.
    Used after draining a bounded replay (availableNow) — on a live
    stream the sink would be a keyed upsert instead."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("n_rows").desc(), F.col("total_e4").desc()
    )
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "total_e4", "n_rows")
    )
