"""Streaming tests for the Kafka-shaped `jsonltail` source (r6
verdict #4): append-only JSONL partition files tailed by byte offset.
The kill tests mirror tests/test_streaming_changelog.py: a restart on
the same checkpoint must resume from the exact byte positions (read
only newly-appended records, keep aggregate state), new partition
files are picked up mid-stream, torn (newline-less) producer tails
are never consumed early, and truncated/vanished partitions refuse to
stream instead of silently duplicating or dropping."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.sources import jsonl_tail
from plankton_spark.streaming import jobs
from tests.conftest import SF0001

SCHEMA = "event_id long, user_id long, event_type string, value double, ts timestamp"
N_SLICES = 4


def _slices(spark):
    ev = read_table(spark, SF0001, "events").where(F.col("user_id") < 60)
    w = F.ntile(N_SLICES).over(Window.orderBy("ts", "event_id"))
    tagged = ev.withColumn("slc", w).cache()
    return ev, [
        tagged.where(F.col("slc") == i + 1).drop("slc") for i in range(N_SLICES)
    ]


def _produce(topic: str, df, n_parts: int = 2) -> None:
    parts: dict[int, list[dict]] = {p: [] for p in range(n_parts)}
    for r in df.collect():
        parts[r.user_id % n_parts].append(
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "event_type": r.event_type,
                "value": r.value,
                "ts": r.ts.isoformat(),
            }
        )
    for p, recs in parts.items():
        if recs:
            jsonl_tail.append_records(
                os.path.join(topic, f"part-{p}.jsonl"), recs
            )


def _stream(spark, topic: str):
    jsonl_tail.register(spark)
    return (
        spark.readStream.format("jsonltail")
        .schema(SCHEMA)
        .option("path", topic)
        .load()
    )


def _drain(df, name: str, ckpt: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return df.sparkSession.table(name)


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols).reset_index(drop=True)


def assert_same(df_a, df_b):
    pd.testing.assert_frame_equal(
        _sorted_pdf(df_a), _sorted_pdf(df_b), check_dtype=False
    )


def test_tail_resume_after_kill(spark, tmp_path):
    """Kill between micro-batches: run 1 aggregates slices 0-1, the
    restarted query on the same checkpoint sees only the bytes
    appended while it was down, and the final complete-mode table
    equals the batch shadow of ALL records."""
    all_ev, slices = _slices(spark)
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    _produce(topic, slices[0])
    _produce(topic, slices[1])
    ckpt = str(tmp_path / "ckpt")

    first = _drain(jobs.tumbling_counts(_stream(spark, topic)), "jt1", ckpt)
    assert_same(
        first, jobs.tumbling_counts(slices[0].unionByName(slices[1]))
    )
    # byte offsets checkpointed past everything consumed so far
    # (the "kill"); more records land, including a NEW partition file
    _produce(topic, slices[2])
    jsonl_tail.append_records(
        os.path.join(topic, "part-late.jsonl"),
        [
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "event_type": r.event_type,
                "value": r.value,
                "ts": r.ts.isoformat(),
            }
            for r in slices[3].collect()
        ],
    )
    final = _drain(jobs.tumbling_counts(_stream(spark, topic)), "jt1", ckpt)
    assert_same(final, jobs.tumbling_counts(all_ev))


def test_torn_tail_not_consumed_until_newline(spark, tmp_path):
    """A producer caught mid-append: the newline-less tail is invisible
    to latestOffset, so no torn record is ever parsed; once the
    newline lands the record streams."""
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    f = os.path.join(topic, "part-0.jsonl")
    jsonl_tail.append_records(
        f, [{"event_id": 1, "user_id": 1, "event_type": "a", "value": 1.0}]
    )
    # torn append: half a record, no newline
    with open(f, "a") as fh:
        fh.write('{"event_id": 2, "user_id": 1, "event_ty')
    ckpt = str(tmp_path / "ckpt")
    agg = _stream(spark, topic).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    )
    got = _drain(agg, "jt_torn", ckpt).collect()[0]
    assert (got.n, got.s) == (1, 1)
    # the producer finishes the line
    with open(f, "a") as fh:
        fh.write('pe": "b", "value": 2.0}\n')
    got = _drain(agg, "jt_torn", ckpt).collect()[0]
    assert (got.n, got.s) == (2, 3)


def test_truncated_partition_refuses_to_stream(spark, tmp_path):
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    f = os.path.join(topic, "part-0.jsonl")
    jsonl_tail.append_records(
        f,
        [
            {"event_id": i, "user_id": 1, "event_type": "a", "value": 1.0}
            for i in range(10)
        ],
    )
    ckpt = str(tmp_path / "ckpt")
    agg = _stream(spark, topic).groupBy().count()
    _drain(agg, "jt_trunc", ckpt)
    # someone rewrites the log shorter
    with open(f, "w") as fh:
        fh.write('{"event_id": 0, "user_id": 1, "event_type": "a", "value": 1.0}\n')
    with pytest.raises(Exception, match="shrank below the planned"):
        _drain(agg, "jt_trunc", ckpt)


def test_vanished_partition_refuses_to_stream(spark, tmp_path):
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    f = os.path.join(topic, "part-0.jsonl")
    jsonl_tail.append_records(
        f, [{"event_id": 1, "user_id": 1, "event_type": "a", "value": 1.0}]
    )
    ckpt = str(tmp_path / "ckpt")
    agg = _stream(spark, topic).groupBy().count()
    _drain(agg, "jt_gone", ckpt)
    os.remove(f)
    # another partition still exists, so latestOffset is reachable
    jsonl_tail.append_records(
        os.path.join(topic, "part-1.jsonl"),
        [{"event_id": 2, "user_id": 2, "event_type": "b", "value": 2.0}],
    )
    with pytest.raises(Exception, match="disappeared"):
        _drain(agg, "jt_gone", ckpt)


def test_batch_reader_matches_parquet_source(spark, tmp_path):
    """The batch side parses/coerces identically to the fixture."""
    _, slices = _slices(spark)
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    _produce(topic, slices[0], n_parts=3)
    jsonl_tail.register(spark)
    got = (
        spark.read.format("jsonltail")
        .schema(SCHEMA)
        .option("path", topic)
        .load()
    )
    assert got.rdd.getNumPartitions() == 3
    assert_same(
        got.select("event_id", "user_id", "event_type", "value"),
        slices[0].select("event_id", "user_id", "event_type", "value"),
    )
    # timestamps round-trip through ISO strings to the second+micros
    a = {r.event_id: r.ts for r in got.collect()}
    b = {r.event_id: r.ts for r in slices[0].collect()}
    assert a == b


def test_explicit_schema_required(spark, tmp_path):
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    jsonl_tail.register(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("jsonltail").option("path", topic).load().count()


# ---------------------------------------------------------------------
# maxBytesPerTrigger (admission control)
# ---------------------------------------------------------------------


def _write_lines(path, n, start=0, pad=0):
    with open(path, "a") as f:
        for i in range(start, start + n):
            f.write('{"event_id": %d%s}\n' % (i, " " * pad))


def test_rate_limited_offsets_snap_to_line_boundaries(tmp_path):
    import pyspark.sql.types as T

    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    p0 = os.path.join(topic, "p0.jsonl")
    _write_lines(p0, 5)
    schema = T.StructType([T.StructField("event_id", T.LongType())])
    r = jsonl_tail.JsonlTailStreamReader(topic, schema, max_bytes=40)
    # RESTART shape (no initialOffset call): first trigger unthrottled
    # — capping from zero could regress the checkpoint
    o1 = r.latestOffset()["files"]["p0.jsonl"]
    assert o1 == os.path.getsize(p0)
    # FRESH-start shape: initialOffset sets a zero baseline, so even
    # the first batch of a pre-existing backlog is throttled
    r2 = jsonl_tail.JsonlTailStreamReader(topic, schema, max_bytes=40)
    r2.initialOffset()
    assert r2.latestOffset()["files"]["p0.jsonl"] <= 40
    # backlog lands; subsequent triggers drain it in bounded steps
    _write_lines(p0, 100, start=5)
    o2 = r.latestOffset()["files"]["p0.jsonl"]
    assert o1 < o2 <= o1 + 40
    with open(p0, "rb") as f:
        f.seek(o2 - 1)
        assert f.read(1) == b"\n", "capped offset must end a line"
    o3 = r.latestOffset()["files"]["p0.jsonl"]
    assert o2 < o3 <= o2 + 40
    # drains to the tail eventually
    last = o3
    for _ in range(200):
        nxt = r.latestOffset()["files"]["p0.jsonl"]
        if nxt == last:
            break
        last = nxt
    assert last == os.path.getsize(p0)


def test_rate_limit_single_oversized_record_still_advances(tmp_path):
    import pyspark.sql.types as T

    topic = str(tmp_path / "topic2")
    os.makedirs(topic)
    p0 = os.path.join(topic, "p0.jsonl")
    _write_lines(p0, 1)
    schema = T.StructType([T.StructField("event_id", T.LongType())])
    r = jsonl_tail.JsonlTailStreamReader(topic, schema, max_bytes=32)
    o1 = r.latestOffset()["files"]["p0.jsonl"]
    # one record far beyond the byte budget
    _write_lines(p0, 1, start=1, pad=500)
    o2 = r.latestOffset()["files"]["p0.jsonl"]
    assert o2 == os.path.getsize(p0), (
        "an over-budget record must still advance one whole line"
    )
    assert o2 > o1 + 32
