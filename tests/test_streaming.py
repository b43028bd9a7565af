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


def test_foreachbatch_windowed_sink_emits_finalized_windows(spark):
    """Append-mode windowed foreachBatch sink: every window the final
    watermark (max event time - 1h) has passed is emitted exactly once
    — incrementally across micro-batches, not as one final dump — and
    values match the batch shadow restricted to that watermark cut."""
    out = f"{jobs.SCRATCH}/sf0.001/test_feb_windowed"
    stream = jobs.read_events_stream_batched(spark, SF0001)
    jobs.run_foreach_batch_windowed(stream, out)
    back = spark.read.parquet(out)

    ev = read_table(spark, SF0001, "events")
    maxts = ev.agg(F.max(F.date_trunc("second", "ts"))).collect()[0][0]
    wm = F.date_format(F.lit(maxts) - F.expr("INTERVAL 1 HOUR"), "yyyy-MM-dd HH:mm:ss")
    shadow = jobs.watermarked_tumbling(ev).where(F.col("window_end") <= wm)

    assert_same(back.drop("batch_id"), shadow)
    # incremental emission: more than one micro-batch contributed
    assert back.select("batch_id").distinct().count() > 1
    # exactly-once per window key
    assert (
        back.groupBy("window_start", "event_type").count().where("count > 1").count() == 0
    )


def test_stream_watermark_drops_late_rows(spark, tmp_path):
    """Real late-data semantics: batch 1 advances the watermark to
    (max ts - 1h); batch 2 replays rows older than that → they must
    be excluded from the windowed aggregation."""
    import os

    from pyspark.sql import Row

    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    on_time = [
        Row(event_id=i, ts_ms=1704067200000 + i * 60_000, user_id=i % 3, value=1.0)
        for i in range(240)  # 4 hours of minutely events
    ]
    # watermark eviction applies one batch after it advances, so the
    # late rows go in a THIRD batch, after a small batch that runs
    # with the advanced watermark and evicts the old windows.
    nudge = [Row(event_id=900, ts_ms=1704067200000 + 240 * 60_000, user_id=0, value=1.0)]
    late = [
        Row(event_id=1000 + i, ts_ms=1704067200000 + i * 60_000, user_id=0, value=1.0)
        for i in range(10)  # replays of hour 1 — far behind the watermark
    ]
    # Stage as two plain files with strictly increasing mtimes — the
    # file source orders micro-batches by modification time.
    import glob
    import shutil
    import time as _time

    ages = {"a": 120, "b": 60, "c": 0}
    for tag, rows in (("a", on_time), ("b", nudge), ("c", late)):
        tmp = str(tmp_path / f"stage_{tag}")
        spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{src}/{tag}.parquet"
        shutil.copyfile(part, dst)
        now = _time.time()
        os.utime(dst, (now, now - ages[tag]))

    stream = (
        spark.readStream.schema("event_id long, ts_ms long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("memory")
        .queryName("late_drop_t")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only finalized windows; total counted events
    # must equal the on-time rows (240) — none of the 10 late rows may
    # appear in any emitted or pending window beyond the watermark.
    # Windows finalize once the watermark (max ts - 1h = 3:00 after
    # the nudge) passes their end: hours 1-3 emit exactly 60 on-time
    # events each; hour 4 stays pending; the 10 late replays of hour 1
    # arrive after eviction and are dropped by the watermark.
    emitted = spark.table("late_drop_t").agg(F.sum("n")).collect()[0][0] or 0
    assert emitted == 180, spark.table("late_drop_t").collect()
    # late rows pre-aggregate into one partial row per window before
    # the stateful operator, so the drop metric counts >= 1, not 10
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p.get("stateOperators")
    )
    assert dropped >= 1, dropped


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
    """Backend-chosen custom state (streaming/stateful.py): the SAME
    operator runs as transformWithStateInPandas where google.protobuf
    exists (cluster images) and applyInPandasWithState here — no env
    skip; the chooser itself is pinned separately below. Totals
    accumulate as integer ten-thousandths in state, so the streamed
    answer must EXACTLY equal the batch aggregate regardless of how
    the replay batches."""
    from plankton_spark.streaming import stateful

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = jobs.read_events_stream(spark, SF0001)
        updates = jobs.run_available_now(
            stateful.running_totals(stream, backend="auto"),
            run_name="stateful_auto_t",
            output_mode="update",
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    streamed = stateful.finalize_totals(updates)

    batch = (
        read_table(spark, SF0001, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("total_e4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    got = {r["user_id"]: (r["total_e4"], r["n_rows"]) for r in streamed.collect()}
    want = {r["user_id"]: (r["total_e4"], r["n_rows"]) for r in batch.collect()}
    assert got == want


def test_stateful_backend_chooser(monkeypatch):
    """The backend chooser's full contract, independent of which
    libraries this sandbox has: auto tracks protobuf availability,
    forcing tws without protobuf fails fast driver-side (not as N
    executor worker crashes), and bogus names are rejected."""
    from plankton_spark.streaming import stateful

    monkeypatch.setattr(stateful, "tws_available", lambda: True)
    assert stateful.choose_backend("auto") == "tws"
    assert stateful.choose_backend("tws") == "tws"
    assert stateful.choose_backend("apws") == "apws"

    monkeypatch.setattr(stateful, "tws_available", lambda: False)
    assert stateful.choose_backend("auto") == "apws"
    assert stateful.choose_backend("apws") == "apws"
    with pytest.raises(RuntimeError, match="protobuf"):
        stateful.choose_backend("tws")
    with pytest.raises(ValueError, match="auto\\|tws\\|apws"):
        stateful.choose_backend("rocksdb")

    # the real probe reflects this environment truthfully
    import importlib.util

    expected = (
        importlib.util.find_spec("google") is not None
        and importlib.util.find_spec("google.protobuf") is not None
    )
    monkeypatch.undo()
    assert stateful.tws_available() is expected


def test_stream_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark: rows duplicated into the same
    micro-batch (same event time) are collapsed; state for old keys is
    evicted once the watermark passes — the bounded-state dedup for
    at-least-once sources at scale."""
    stream = jobs.with_second_ts(jobs.read_events_stream_batched(spark, SF0001))
    doubled = stream.withColumn("copy", F.explode(F.array(F.lit(1), F.lit(2))))
    dd = doubled.withWatermark("ts2", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    streamed = jobs.run_available_now(
        dd.groupBy().agg(F.count(F.lit(1)).alias("n")),
        run_name="ddww_t",
        output_mode="complete",
    )
    n_batch = read_table(spark, SF0001, "events").count()
    assert streamed.collect()[0]["n"] == n_batch


def test_stream_stream_join_equals_batch(spark):
    # Stream-stream interval join emits in append mode (no agg state);
    # self-joining two filtered views of one file-source stream.
    stream = jobs.read_events_stream(spark, SF0001)
    streamed = jobs.run_available_now(
        jobs.view_click_pairs(stream), run_name="ssjoin_t", output_mode="append"
    )
    batch = jobs.view_click_pairs(read_table(spark, SF0001, "events"))
    assert_same(streamed, batch)


def test_stream_stream_outer_join_restart_emits_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream interval join across a checkpoint
    restart (round-10 verdict #5): the unmatched side's null emission
    is WATERMARK-DRIVEN, so the test replays the events in two
    time-ordered files (run 1 drains file 1 to a parquet sink, the
    'crashed' query restarts on the same checkpoint for file 2), with
    far-future sentinel events in file 2 advancing BOTH sides'
    watermarks past every real view's eviction bound — after which
    the accumulated sink must equal the batch left outer range join
    EXACTLY: every unmatched view emitted once with a null click,
    no double emissions across the restart, matched pairs intact."""
    import datetime
    import os

    events = read_table(spark, SF0001, "events")
    min_ts, max_ts = events.select(
        F.min(F.date_trunc("second", "ts")),
        F.max(F.date_trunc("second", "ts")),
    ).first()
    split_ts = min_ts + (max_ts - min_ts) / 2  # time-ordered halves
    h1 = events.where(F.date_trunc("second", "ts") <= split_ts)
    h2 = events.where(F.date_trunc("second", "ts") > split_ts)
    sent = spark.createDataFrame(
        [
            (-1, max_ts + datetime.timedelta(hours=2), -999, "view", 0.0, None),
            (-2, max_ts + datetime.timedelta(hours=3), -998, "click", 0.0, None),
        ],
        events.schema,
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            jobs.view_click_pairs_outer(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    h1.coalesce(1).write.mode("append").parquet(src)
    drain()  # run 1: matched pairs + early-evictable unmatched views
    # the "kill": new data (and the watermark-advancing sentinels)
    # lands while the query is down; the restart reads ONLY file 2
    h2.unionByName(sent).coalesce(1).write.mode("append").parquet(src)
    drain()
    streamed = spark.read.parquet(sink).where(F.col("user_id") >= 0)
    batch = jobs.view_click_pairs_outer(events)
    assert_same(streamed, batch)
    # the null-click population is non-trivial in the fixture
    assert streamed.where(F.col("click_ts").isNull()).count() > 0


def test_stateful_aggs_run_on_rocksdb_state_store(spark):
    """The 100 TB state backend: the default (HDFS-backed in-memory)
    state store holds every key in executor heap — at billions of
    session/dedup keys that's an OOM, and RocksDB is the production
    answer. Pin that our stateful jobs run — and agree with batch —
    under RocksDBStateStoreProvider, so the posture SCALE.md claims
    is actually exercised (the only other RocksDB test is
    protobuf-gated and skips in this sandbox)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = jobs.read_events_stream(spark, SF0001)
        streamed = jobs.run_available_now(
            jobs.tumbling_counts(stream), run_name="tumbling_rocks"
        )
        batch = jobs.tumbling_counts(read_table(spark, SF0001, "events"))
        assert_same(streamed, batch)

        # session windows: merging-key state, the shape that actually
        # stresses a state store
        stream2 = jobs.read_events_stream(spark, SF0001)
        sessions = jobs.run_available_now(
            jobs.session_windows(stream2), run_name="session_rocks"
        )
        assert_same(
            jobs.rollup_sessions(sessions),
            jobs.session_stats(read_table(spark, SF0001, "events")),
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_stream_full_outer_join_restart(spark, tmp_path):
    """FULL OUTER stream-stream interval join across a checkpoint
    restart: both unmatched populations (view-only AND click-only)
    are watermark-driven emissions; after the sentinel events push
    both watermarks past every real row's eviction bound the
    accumulated sink must equal the batch full outer range join
    exactly — no lost or doubled null rows on either side."""
    import datetime
    import os

    events = read_table(spark, SF0001, "events")
    min_ts, max_ts = events.select(
        F.min(F.date_trunc("second", "ts")),
        F.max(F.date_trunc("second", "ts")),
    ).first()
    split_ts = min_ts + (max_ts - min_ts) / 2
    h1 = events.where(F.date_trunc("second", "ts") <= split_ts)
    h2 = events.where(F.date_trunc("second", "ts") > split_ts)
    sent = spark.createDataFrame(
        [
            (-1, max_ts + datetime.timedelta(hours=2), -999, "view", 0.0, None),
            (-2, max_ts + datetime.timedelta(hours=3), -998, "click", 0.0, None),
        ],
        events.schema,
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            jobs.view_click_pairs_full(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    h1.coalesce(1).write.mode("append").parquet(src)
    drain()
    h2.unionByName(sent).coalesce(1).write.mode("append").parquet(src)
    drain()
    streamed = spark.read.parquet(sink).where(F.col("user_id") >= 0)
    batch = jobs.view_click_pairs_full(events)
    assert_same(streamed, batch)
    # both unmatched populations are non-trivial in the fixture
    assert streamed.where(F.col("click_ts").isNull()).count() > 0
    assert streamed.where(F.col("view_ts").isNull()).count() > 0
