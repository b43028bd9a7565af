"""Structured Streaming integration tests (SURVEY.md §5.2.4).

Replays events.parquet through the file source with availableNow and
asserts stream results equal the declared batch queries — proving the
batch shadows in queries/streaming_shadows.py describe the actual
streaming jobs.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.streaming import jobs
from tests.conftest import SF0001


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (
        pdf[cols].sort_values(by=cols).reset_index(drop=True)
    )


def assert_same(df_a, df_b):
    a, b = _sorted_pdf(df_a), _sorted_pdf(df_b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_tumbling_equals_batch(spark):
    stream = jobs.read_events_stream(spark, SF0001)
    streamed = jobs.run_available_now(
        jobs.tumbling_counts(stream), run_name="tumbling_t"
    )
    batch = jobs.tumbling_counts(read_table(spark, SF0001, "events"))
    assert_same(streamed, batch)


def test_stream_session_equals_batch(spark):
    stream = jobs.read_events_stream(spark, SF0001)
    # Only one stateful aggregation is allowed per streaming query:
    # stream the session-window agg, roll up per-user as batch.
    sessions = jobs.run_available_now(jobs.session_windows(stream), run_name="session_t")
    streamed = jobs.rollup_sessions(sessions)
    batch = jobs.session_stats(read_table(spark, SF0001, "events"))
    assert_same(streamed, batch)


def test_stream_static_join_equals_batch(spark):
    stream = jobs.read_events_stream(spark, SF0001)
    streamed = jobs.run_available_now(
        jobs.segment_rollup(spark, stream), run_name="segjoin_t"
    )
    batch = jobs.segment_rollup(spark, read_table(spark, SF0001, "events"))
    assert_same(streamed, batch)


def test_stream_dedup_under_watermark(spark):
    stream = jobs.with_second_ts(jobs.read_events_stream(spark, SF0001))
    deduped = stream.withWatermark("ts2", "1 hour").dropDuplicates(["event_id"])
    streamed = jobs.run_available_now(
        deduped.groupBy().agg(F.count(F.lit(1)).alias("n")),
        run_name="dedup_t",
        output_mode="complete",
    )
    n_stream = streamed.collect()[0]["n"]
    n_batch = read_table(spark, SF0001, "events").select("event_id").distinct().count()
    assert n_stream == n_batch


def test_foreachbatch_sink_roundtrip(spark):
    out = f"{jobs.SCRATCH}/sf0.001/test_feb_out"
    stream = jobs.read_events_stream(spark, SF0001)
    jobs.run_foreach_batch_to_parquet(stream, out)
    back = spark.read.parquet(out)
    src = read_table(spark, SF0001, "events")
    assert back.count() == src.count()
    got = back.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    want = src.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    assert got == want


def test_stream_stateful_group_state(spark):
    """applyInPandasWithState: per-user running purchase totals in
    executor state must equal the batch per-user sums."""
    stream = jobs.read_events_stream(spark, SF0001)
    streamed = jobs.run_available_now(
        jobs.purchase_running_totals(stream), run_name="apws_t", output_mode="update"
    )
    batch = (
        read_table(spark, SF0001, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
    )
    got = {r["user_id"]: r["total_value"] for r in streamed.collect()}
    want = {r["user_id"]: round(r["total_value"], 4) for r in batch.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_stream_stateful_running_total(spark):
    """transformWithStateInPandas (Spark 4 custom state); falls back to
    skip if the API/state-store combo is unavailable in local mode."""
    try:
        from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    except ImportError:
        pytest.skip("transformWithStateInPandas API not available")

    import pandas as pd  # noqa: F811

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key, rows, timerValues):
            total = self._total.get()[0] if self._total.exists() else 0.0
            n = 0
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += len(pdf)
            self._total.update((total,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total_value": [round(total, 4)], "n_rows": [n]}
            )

        def close(self) -> None:
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            jobs.with_second_ts(jobs.read_events_stream(spark, SF0001))
            .where(F.col("event_type") == "purchase")
            .withWatermark("ts2", "1 hour")
        )
        result = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotal(),
            outputStructType="user_id long, total_value double, n_rows long",
            outputMode="Update",
            timeMode="None",
        )
        streamed = jobs.run_available_now(result, run_name="twsip_t", output_mode="update")
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"transformWithStateInPandas unavailable: {type(e).__name__}: {e}")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    batch = (
        read_table(spark, SF0001, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("total_value"))
    )
    got = {r["user_id"]: r["total_value"] for r in streamed.collect()}
    want = {r["user_id"]: r["total_value"] for r in batch.collect()}
    assert got == want
