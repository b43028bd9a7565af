"""Streaming operators, oracle-checked via batch execution
(SURVEY.md §2.9).

Spark's window/session_window functions are batch/stream symmetric:
the *same* transformation functions (plankton_spark.streaming.jobs)
run here on a batch DataFrame for the DuckDB oracle, and in
tests/test_streaming.py on a readStream replay with availableNow —
the integration test asserts both paths produce identical tables.

All event timestamps are second-truncated before any window math
(ns-vs-µs safety, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.operators import exclusive_prefix_max
from plankton_spark.registry import query
from plankton_spark.streaming import jobs

_EVENTS_SECOND = """
  SELECT event_id, user_id, event_type, value,
         CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2
  FROM events
"""


@query(
    "q_stream_tumbling",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND})
    SELECT strftime(date_trunc('hour', ts2), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM e
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1h event-time windows (same code path as the stream)."""
    return jobs.tumbling_counts(read_table(spark, sf_dir, "events"))


@query(
    "q_stream_sliding",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    slid AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts2)
               - k * INTERVAL '15 minutes' AS window_start,
             ts2
      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM slid
    WHERE ts2 < window_start + INTERVAL '1 hour'
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark, sf_dir):
    """Sliding 1h/15m windows — each event lands in 4 buckets."""
    return jobs.sliding_counts(read_table(spark, sf_dir, "events"))


@query(
    "q_stream_session",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    marked AS (
      SELECT user_id, ts2,
             CASE WHEN LAG(ts2) OVER w IS NULL
                       OR ts2 - LAG(ts2) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts2)
    ),
    numbered AS (
      SELECT user_id, ts2,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts2
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM marked
    ),
    sessions AS (
      SELECT user_id, sid, COUNT(*) AS n,
             epoch(MAX(ts2)) - epoch(MIN(ts2)) AS dur
      FROM numbered GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(dur) AS BIGINT) AS total_dur_sec
    FROM sessions GROUP BY user_id
    """,
)
def q_stream_session(spark, sf_dir):
    """session_window (30 min gap): the shadow reconstructs sessions
    with the lag-gap + cumulative-sum idiom and must agree exactly.
    Gap-boundary tie (round-12 sf0.1 soak catch): Spark's
    session_window MERGES an event exactly `gap` after its
    predecessor (sessions coalesce while new_start <= current_end),
    so the oracle's new-session rule is STRICTLY-greater — `>=` split
    the one exactly-30-minute pair the larger fixture produced."""
    return jobs.session_stats(read_table(spark, sf_dir, "events"))


@query(
    "q_stream_watermark",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    wm AS (
      SELECT event_id, ts2,
             MAX(ts2) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS high_water
      FROM e
    )
    SELECT CAST(COUNT(CASE WHEN ts2 < high_water - INTERVAL '1 hour' THEN 1 END) AS BIGINT)
             AS n_late_dropped,
           COUNT(*) AS n_total
    FROM wm
    """,
)
def q_stream_watermark(spark, sf_dir):
    """Watermark semantics, batch-modeled: an event is droppable when
    it arrives (event_id order = arrival order) with event time more
    than 1h behind the high-water mark already seen. The streaming
    replay test asserts the same count via .withWatermark.

    The high-water mark is a global exclusive running max over arrival
    order — computed with the parallel-prefix construction
    (operators.exclusive_prefix_max) instead of an unpartitioned
    window, which would funnel the whole stream history through one
    task (r6 verdict #2)."""
    e = jobs.with_second_ts(read_table(spark, sf_dir, "events"))
    wm = exclusive_prefix_max(e, [F.col("event_id")], "ts2", "high_water")
    return wm.agg(
        F.count(
            F.when(
                F.col("ts2") < F.col("high_water") - F.expr("INTERVAL 1 HOUR"), 1
            )
        )
        .cast("long")
        .alias("n_late_dropped"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT COUNT(DISTINCT event_id) AS n_unique_ids,
           COUNT(DISTINCT (user_id, event_type)) AS n_user_type,
           COUNT(*) AS n_total
    FROM events
    """,
)
def q_stream_dedup(spark, sf_dir):
    """Streaming dropDuplicates shadow: distinct cardinalities the
    watermarked streaming dedup must reproduce (see streaming test)."""
    e = read_table(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("event_id").alias("n_unique_ids"),
        F.countDistinct("user_id", "event_type").alias("n_user_type"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "q_stream_staticjoin",
    oracle="""
    SELECT CASE CAST(user_id % 3 AS INTEGER) WHEN 0 THEN 'bronze'
                WHEN 1 THEN 'silver' ELSE 'gold' END AS segment,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_stream_staticjoin(spark, sf_dir):
    """Stream-static broadcast join with a synthetic user dimension."""
    return jobs.segment_rollup(spark, read_table(spark, sf_dir, "events"))


@query(
    "q_stream_stateful",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND})
    SELECT user_id, event_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts2, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 4) AS running_total
    FROM e
    WHERE event_type = 'purchase' AND user_id < 20
    """,
)
def q_stream_stateful(spark, sf_dir):
    """Custom-state shadow: per-user running purchase total. The
    streaming twin keeps the total in a value state per key
    (transformWithStateInPandas, tests/test_streaming.py)."""
    e = jobs.with_second_ts(read_table(spark, sf_dir, "events")).where(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 20)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts2", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"), 4
        ).alias("running_total"),
    )


@query(
    "q_stream_foreachbatch",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_stream_foreachbatch(spark, sf_dir):
    """REAL streaming run inside the gate: replay events through a
    foreachBatch parquet sink (availableNow), read the sink back and
    aggregate — must equal the batch aggregate over the source."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{jobs.SCRATCH}/{tag}/foreachbatch_events"
    stream = jobs.read_events_stream(spark, sf_dir)
    jobs.run_foreach_batch_to_parquet(stream, out)
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
            "sum_value"
        ),
    )


@query(
    "q_stream_stateful_run",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS total_e4,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def q_stream_stateful_run(spark, sf_dir):
    """REAL custom-stateful streaming run inside the gate (round-8
    verdict #2): replay events through the backend-chosen stateful
    operator (streaming/stateful.py — transformWithStateInPandas when
    google.protobuf is present, applyInPandasWithState otherwise; this
    sandbox runs APWS), drain with availableNow, collapse the
    update-mode emission log to final per-key rows, and hash-match the
    per-user exact-integer purchase totals against the batch oracle.
    Exactness survives arbitrary micro-batch splits because state
    accumulates integer ten-thousandths, never floats."""
    from plankton_spark.streaming import stateful

    stream = jobs.read_events_stream(spark, sf_dir)
    updates = jobs.run_available_now(
        stateful.running_totals(stream),
        run_name="stateful_gate",
        output_mode="update",
    )
    return stateful.finalize_totals(updates)


@query(
    "q_stream_streamjoin",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    v AS (
      SELECT user_id, ts2 AS view_ts FROM e WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id, ts2 AS click_ts FROM e WHERE event_type = 'click'
    )
    SELECT v.user_id,
           COUNT(*) AS n_pairs,
           CAST(SUM(epoch(c.click_ts) - epoch(v.view_ts)) AS BIGINT)
             AS total_lag_sec,
           strftime(MIN(v.view_ts), '%Y-%m-%d %H:%M:%S') AS first_view
    FROM v JOIN c
      ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts < v.view_ts + INTERVAL '10 minutes'
    GROUP BY v.user_id
    """,
)
def q_stream_streamjoin(spark, sf_dir):
    """Stream-stream interval join (clicks to views within 10 min per
    user), same jobs.view_click_pairs code path the streaming test
    replays; the batch shadow rolls pairs up per user."""
    pairs = jobs.view_click_pairs(read_table(spark, sf_dir, "events"))
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts"))
        .cast("long")
        .alias("total_lag_sec"),
        F.date_format(F.min("view_ts"), "yyyy-MM-dd HH:mm:ss").alias("first_view"),
    )


@query(
    "q_stream_streamjoin_outer",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    v AS (
      SELECT user_id, ts2 AS view_ts FROM e WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id AS c_user_id, ts2 AS click_ts
      FROM e WHERE event_type = 'click'
    )
    SELECT v.user_id,
           COUNT(*) AS n_rows,
           CAST(COUNT(c.click_ts) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN c.click_ts IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatched,
           CAST(SUM(CASE WHEN c.click_ts IS NOT NULL
                    THEN epoch(c.click_ts) - epoch(v.view_ts) END)
                AS BIGINT) AS total_lag_sec
    FROM v LEFT JOIN c
      ON v.user_id = c.c_user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts < v.view_ts + INTERVAL '10 minutes'
    GROUP BY v.user_id
    """,
)
def q_stream_streamjoin_outer(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join (round-10 verdict #5 —
    the watermark-driven null-emission half the inner join doesn't
    exercise): views with no click in the 10-minute window emit with
    a NULL click side, which in a real stream happens only when the
    click watermark passes view_ts + 10 min (state eviction = the
    emission trigger). Same jobs.view_click_pairs_outer code path the
    streaming test replays file-by-file with a checkpoint restart
    (tests/test_streaming.py); this batch shadow is the plain left
    outer range join the watermarks degenerate to, rolled up per
    user with matched/unmatched populations separated so a dropped
    null row or a double emission is a hash mismatch."""
    pairs = jobs.view_click_pairs_outer(read_table(spark, sf_dir, "events"))
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("click_ts").cast("long").alias("n_matched"),
        F.count_if(F.col("click_ts").isNull()).alias("n_unmatched"),
        F.sum(
            F.when(
                F.col("click_ts").isNotNull(),
                F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts"),
            )
        )
        .cast("long")
        .alias("total_lag_sec"),
    )


@query(
    "q_stream_session_changelog",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    marked AS (
      SELECT user_id, ts2,
             CASE WHEN LAG(ts2) OVER w IS NULL
                       OR ts2 - LAG(ts2) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts2)
    ),
    numbered AS (
      SELECT user_id, ts2,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts2
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM marked
    ),
    sessions AS (
      SELECT user_id, sid, COUNT(*) AS n,
             epoch(MAX(ts2)) - epoch(MIN(ts2)) AS dur
      FROM numbered GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(dur) AS BIGINT) AS total_dur_sec
    FROM sessions GROUP BY user_id
    """,
)
def q_stream_session_changelog(spark, sf_dir):
    """Session stats computed by a REAL Structured Streaming query
    over the engine's Delta changelog source, with a restart in the
    middle: half the events are committed, the session-window agg
    drains (availableNow) into a memory sink, the remaining events
    are committed while the query is down, and a second run resumes
    from the same checkpoint — so the final complete-mode table is
    right only if the restart restored the session state AND read
    only the new commits. The oracle is the lag-gap + cumulative-sum
    batch reconstruction over all events: the streaming result must
    agree exactly, which also pins the exactly-once contract through
    the {{"version": N}} offsets."""
    import shutil
    import uuid as _uuid

    from plankton_spark.queries.scans import _scratch
    from plankton_spark.sources.delta_log import DeltaLogWriter, register

    root = _scratch(sf_dir, "chlog_sess")
    shutil.rmtree(root, ignore_errors=True)
    ckpt = root + "_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    register(spark)

    ev = read_table(spark, sf_dir, "events")
    half = ev.agg(F.expr("percentile(event_id, 0.5)")).first()[0]
    w = DeltaLogWriter(spark, root)
    w.create(ev.where(F.col("event_id") <= half))

    name = f"chlog_sess_{_uuid.uuid4().hex[:8]}"

    from plankton_spark.sources.delta_log import snapshot_schema

    feed_schema = snapshot_schema(root)  # skip the per-load schema probe

    def drain():
        stream = (
            spark.readStream.format("deltalog")
            .option("path", root)
            .schema(feed_schema)
            .load()
        )
        # stateful session-window agg: pin the state-store partition
        # count instead of inheriting the batch session's shuffle
        # default (jobs.stream_state_partitions rationale)
        with jobs.stream_state_partitions(spark):
            q = (
                jobs.session_windows(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

    drain()  # batch 0: first half of the events
    w.append(ev.where(F.col("event_id") > half))  # lands while "down"
    drain()  # restart: state restored, only the new commit read
    return jobs.rollup_sessions(spark.table(name))


@query(
    "q_stream_jsonl_tail",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS sum_value
    FROM events
    WHERE user_id < 40
    GROUP BY event_type
    """,
)
def q_stream_jsonl_tail(spark, sf_dir):
    """The Kafka-shaped JSONL tail source's batch shadow: a bounded
    events slice is produced into a 4-partition JSONL topic (one
    append-only file per partition, keyed by user_id % 4 — the
    producer-side partitioner), read back through
    spark.read.format("jsonltail") with an explicit reader schema,
    and aggregated per event type. The oracle re-derives the same
    aggregate from the parquet fixture, so a parse/coerce/partition
    bug in the source fails the value hash. The STREAMING side of the
    same source (byte-offset checkpoints, resume-after-kill,
    refuse-on-truncation) is pytest-driven in
    tests/test_streaming_jsonl.py."""
    import os
    import shutil

    from plankton_spark.queries.scans import _scratch
    from plankton_spark.sources import jsonl_tail

    topic = _scratch(sf_dir, "jsonl_topic")
    shutil.rmtree(topic, ignore_errors=True)
    os.makedirs(topic)
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 40)
        .select("event_id", "user_id", "event_type", "value")
    )
    # producer: partition by user_id % 4 into one JSONL file each —
    # driver-side only in this declared-query fixture (bounded slice);
    # a real producer appends from its own process. The bound is a
    # hard contract, not a convention: cap the collect so a fixture
    # edit widening the .where can't silently become a driver OOM
    # (r7 verdict hygiene note).
    _CAP = 100_000
    if (n := ev.limit(_CAP + 1).count()) > _CAP:
        raise ValueError(
            f"jsonltail fixture slice exceeds the declared driver-side "
            f"bound ({n}+ rows > {_CAP}); tighten the filter — this "
            "producer is a fixture, not a data path"
        )
    parts: dict[int, list[dict]] = {p: [] for p in range(4)}
    for r in ev.collect():
        parts[r.user_id % 4].append(
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "event_type": r.event_type,
                "value": r.value,
            }
        )
    for p, recs in parts.items():
        jsonl_tail.append_records(os.path.join(topic, f"part-{p}.jsonl"), recs)
    jsonl_tail.register(spark)
    schema = (
        "event_id long, user_id long, event_type string, value double"
    )
    tail = (
        spark.read.format("jsonltail").schema(schema).option("path", topic).load()
    )
    return tail.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").cast("long").alias("id_sum"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_value"),
    )


@query(
    "q_stream_cdf",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey AS c FROM orders
      WHERE o_orderkey < 1200
    ),
    changes AS (
      SELECT CAST(0 AS BIGINT) AS commit_ver, 'insert' AS change_type,
             k, c FROM o
      UNION ALL
      SELECT 1, 'update_preimage', k, c FROM o WHERE k % 10 = 3
      UNION ALL
      SELECT 1, 'update_postimage', k, c + 1000000 FROM o WHERE k % 10 = 3
      UNION ALL
      SELECT 2, 'delete', k, c FROM o WHERE k % 10 = 7
    )
    SELECT commit_ver, change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(c) AS BIGINT) AS cust_sum
    FROM changes GROUP BY commit_ver, change_type
    """,
)
def q_stream_cdf(spark, sf_dir):
    """The CHANGE DATA FEED as a REAL STREAMING source — the
    CDC-to-downstream pattern (index sync, audit trail, incremental
    materialization) run live with a mid-stream restart: the create
    commit drains through format("deltacdf") into an append parquet
    sink (availableNow), then an UPDATE and a DELETE land while the
    query is down, and the resumed query — same checkpoint, offsets
    are commit versions — must emit EXACTLY the two new commits'
    change rows (cdc files verbatim: per-row update
    preimage/postimage pairs, deletes) and never replay the initial
    inserts. The oracle recomputes every commit's change set
    relationally, so a replayed batch, a dropped preimage, or an
    offset drift is a hash mismatch. Each micro-batch is one
    partition per change file — native parquet + Arrow, no Python
    row path (sources/delta_log.py:DeltaCdfStreamReader)."""
    import shutil
    import uuid as _uuid

    from plankton_spark.queries.scans import _scratch
    from plankton_spark.sources.delta_log import DeltaLogWriter, register

    root = _scratch(sf_dir, "stream_cdf")
    shutil.rmtree(root, ignore_errors=True)
    sink = root + "_sink"
    ckpt = root + "_ckpt"
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    register(spark)

    o = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 1200)
        .select("o_orderkey", "o_custkey")
    )
    w = DeltaLogWriter(spark, root)
    w.create(o.repartition(1), change_data_feed=True)  # v0

    from plankton_spark.sources.delta_log import cdf_schema

    feed_schema = cdf_schema(root)  # skip the per-load schema probe

    def drain():
        stream = (
            spark.readStream.format("deltacdf")
            .option("path", root)
            .schema(feed_schema)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .queryName(f"cdf_{_uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()  # the v0 inserts
    # the "kill": changes land while the consumer is down
    w.update_where(
        {"o_custkey": F.col("o_custkey") + 1000000},
        F.col("o_orderkey") % 10 == 3,
    )  # v1
    w.delete_where(F.col("o_orderkey") % 10 == 7)  # v2
    drain()  # restart: only v1/v2 stream
    feed = spark.read.parquet(sink)
    return feed.groupBy(
        F.col("_commit_version").alias("commit_ver"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum("o_custkey").cast("long").alias("cust_sum"),
    )


@query(
    "q_stream_streamjoin_full",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    v AS (
      SELECT user_id AS v_user_id, ts2 AS view_ts
      FROM e WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id AS c_user_id, ts2 AS click_ts
      FROM e WHERE event_type = 'click'
    )
    SELECT COALESCE(v.v_user_id, c.c_user_id) AS user_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN view_ts IS NOT NULL AND click_ts IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN click_ts IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view_only,
           CAST(SUM(CASE WHEN view_ts IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click_only,
           CAST(SUM(CASE WHEN view_ts IS NOT NULL AND click_ts IS NOT NULL
                    THEN epoch(click_ts) - epoch(view_ts) END)
                AS BIGINT) AS total_lag_sec
    FROM v FULL JOIN c
      ON v.v_user_id = c.c_user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts < v.view_ts + INTERVAL '10 minutes'
    GROUP BY COALESCE(v.v_user_id, c.c_user_id)
    """,
)
def q_stream_streamjoin_full(spark, sf_dir):
    """Stream-stream FULL OUTER interval join — the remaining half
    after round-11's left outer: clicks with NO view in the
    preceding 10 minutes now ALSO emit (null view side), each
    unmatched emission watermark-driven in the real stream (view
    watermark past click_ts for the right-outer half, click watermark
    past view_ts + 10 min for the left-outer half). Same
    jobs.view_click_pairs_full code path the streaming test replays
    file-by-file with a checkpoint restart; this batch shadow is the
    plain full outer range join the watermarks degenerate to, rolled
    up per user with the three populations (matched / view-only /
    click-only) separated so a dropped or doubled emission on EITHER
    side is a hash mismatch."""
    pairs = jobs.view_click_pairs_full(read_table(spark, sf_dir, "events"))
    both = F.col("view_ts").isNotNull() & F.col("click_ts").isNotNull()
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(both.cast("int")).cast("long").alias("n_matched"),
        F.count_if(F.col("click_ts").isNull()).alias("n_view_only"),
        F.count_if(F.col("view_ts").isNull()).alias("n_click_only"),
        F.sum(
            F.when(
                both,
                F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts"),
            )
        )
        .cast("long")
        .alias("total_lag_sec"),
    )
