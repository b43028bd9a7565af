"""Event-analytics operators (SURVEY.md §2.11 round-2 additions):
funnel conversion and cohort retention — the bread-and-butter product
analytics an engine must serve next to the OLAP core.

Scale design: both are hash-agg pipelines over (user_id)-keyed data —
partial aggs combine map-side, the per-user frames are tiny, and no
window ever partitions on a low-cardinality key. Timestamps are
second-truncated before any arithmetic (ns-vs-µs policy, SURVEY §1.2)
and emitted as strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import query

_EVENTS_SECOND = """
  SELECT event_id, user_id, event_type, value,
         CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2
  FROM events
"""


def _events_second(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_trunc("second", "ts").alias("ts2"),
    )


@query(
    "q_funnel",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    v AS (
      SELECT user_id, MIN(ts2) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts2) AS t_click
      FROM e JOIN v ON e.user_id = v.user_id AND e.ts2 >= v.t_view
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts2) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id AND e.ts2 >= c.t_click
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click,
           (SELECT CAST(COALESCE(SUM(epoch(c.t_click) - epoch(v.t_view)), 0) AS BIGINT)
            FROM c JOIN v USING (user_id)) AS view_to_click_sec,
           (SELECT CAST(COALESCE(SUM(epoch(p.t_purchase) - epoch(c.t_click)), 0) AS BIGINT)
            FROM p JOIN c USING (user_id)) AS click_to_purchase_sec
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: each stage's
    timestamp is the user's first qualifying event AT OR AFTER the
    previous stage. Three hash-aggs chained by (user_id) joins — the
    per-user frames stay tiny, so at scale each stage is one shuffle
    on user_id with map-side combine."""
    e = _events_second(spark, sf_dir)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts2").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts2") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts2").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts2") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts2").alias("t_purchase"))
    )
    lat_vc = (
        c.join(v, "user_id")
        .agg(
            F.coalesce(
                F.sum(F.unix_timestamp("t_click") - F.unix_timestamp("t_view")),
                F.lit(0),
            )
            .cast("long")
            .alias("view_to_click_sec")
        )
    )
    lat_cp = (
        p.join(c, "user_id")
        .agg(
            F.coalesce(
                F.sum(F.unix_timestamp("t_purchase") - F.unix_timestamp("t_click")),
                F.lit(0),
            )
            .cast("long")
            .alias("click_to_purchase_sec")
        )
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )
    return counts.crossJoin(lat_vc).crossJoin(lat_cp)


@query(
    "q_retention",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    d AS (SELECT user_id, CAST(date_trunc('day', ts2) AS DATE) AS day FROM e),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id),
    act AS (
      SELECT DISTINCT c.cohort_day, datediff('day', c.cohort_day, d.day) AS day_offset,
             d.user_id
      FROM d JOIN cohort c USING (user_id)
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def q_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day; for each
    (cohort, day-offset) the count of distinct users active that day.
    distinct → hash-agg, cohort assignment is one user_id-keyed join;
    the output matrix is tiny no matter the input size."""
    e = _events_second(spark, sf_dir)
    d = e.select("user_id", F.to_date(F.date_trunc("day", "ts2")).alias("day"))
    cohort = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        d.join(cohort, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_users",
    )


@query(
    "q_sessionize",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    l AS (
      SELECT user_id, event_id, ts2,
             lag(ts2) OVER (PARTITION BY user_id ORDER BY ts2, event_id) AS prev
      FROM e
    ),
    f AS (
      SELECT *, CASE WHEN prev IS NULL OR epoch(ts2) - epoch(prev) > 1800
                     THEN 1 ELSE 0 END AS is_new
      FROM l
    ),
    s AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts2, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM f
    ),
    g AS (
      SELECT user_id, sess, COUNT(*) AS n_events,
             CAST(epoch(MAX(ts2)) - epoch(MIN(ts2)) AS BIGINT) AS dur_sec
      FROM s GROUP BY user_id, sess
    )
    SELECT n_events, COUNT(*) AS n_sessions,
           CAST(SUM(dur_sec) AS BIGINT) AS total_dur_sec
    FROM g GROUP BY n_events
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization with a 30-minute inactivity gap: per-user
    lag() marks session starts, a running sum assigns session ids, and
    sessions aggregate to a length histogram. The window partitions on
    user_id (high-cardinality — no low-card single-task window); at
    scale this is one user-keyed shuffle then map-side-combinable
    hash-aggs. Ties are broken on (ts2, event_id) so both engines
    order identically."""
    from pyspark.sql import Window

    e = _events_second(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts2", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        "ts2",
        F.when(
            F.lag("ts2").over(w).isNull()
            | (F.col("ts2").cast("long") - F.lag("ts2").over(w).cast("long") > 1800),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessed = marked.withColumn(
        "sess",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = sessed.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts2").cast("long") - F.min("ts2").cast("long")).alias("dur_sec"),
    )
    return sessions.groupBy("n_events").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_sec").cast("long").alias("total_dur_sec"),
    )


@query(
    "q_sample_assembly",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND})
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           string_agg(event_type || ':' || CAST(event_id AS VARCHAR), ' '
                      ORDER BY ts2, event_id) AS trajectory,
           strftime(MIN(ts2), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(ts2), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM e WHERE user_id < 40
    GROUP BY user_id
    """,
)
def q_sample_assembly(spark, sf_dir):
    """Training-sample assembly: each user's event stream becomes one
    ordered trajectory string (the events→episode step of an
    agent/behavioral pretraining pipeline).

    Shape: ONE groupBy(user_id) with collect_list of (ts, id, token)
    structs, sorted per group with sort_array (struct ordering = field
    order → (ts, event_id) tie-break) and folded to a string — no
    window, no second shuffle; partial aggs combine map-side. Skewed
    users at 100 TB are handled upstream by the same salting pattern
    as q_join_salted; per-user payloads are the sample itself, which
    any assembly step must materialize somewhere."""
    e = _events_second(spark, sf_dir).where(F.col("user_id") < 40)
    tok = F.struct(
        F.col("ts2"),
        F.col("event_id"),
        F.concat_ws(":", "event_type", F.col("event_id").cast("string")).alias("t"),
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list(tok)), lambda s: s["t"]),
                " ",
            ).alias("trajectory"),
            F.date_format(F.min("ts2"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts2"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


@query(
    "q_anomaly_buckets",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    buckets AS (
      SELECT event_type, date_trunc('minute', ts2) AS bkt,
             COUNT(*) AS n
      FROM e GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             AVG(CAST(n AS DOUBLE)) AS mu,
             STDDEV_SAMP(CAST(n AS DOUBLE)) AS sigma,
             COUNT(*) AS n_buckets
      FROM buckets GROUP BY 1
    )
    SELECT b.event_type,
           strftime(b.bkt, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(b.n AS BIGINT) AS n_events,
           ROUND((CAST(b.n AS DOUBLE) - s.mu) / s.sigma, 4) AS z
    FROM buckets b JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND ABS((CAST(b.n AS DOUBLE) - s.mu) / s.sigma) > 2.5
    """,
)
def q_anomaly_buckets(spark, sf_dir):
    """Volume-anomaly detection: per-minute event counts z-scored
    against each event type's own bucket distribution; buckets beyond
    2.5σ are flagged. Two hash aggregations (bucket counts, then
    per-type moments — the second over the tiny bucket frame) + one
    broadcast join back; nothing touches raw events twice. Integer
    counts make mean/stddev deterministic (single final-stage double
    division, no accumulation-order risk at the bucket-frame size —
    the moments aggregate a per-type handful of rows)."""
    e = _events_second(spark, sf_dir)
    buckets = e.groupBy(
        "event_type", F.date_trunc("minute", "ts2").alias("bkt")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = buckets.groupBy("event_type").agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_samp(F.col("n").cast("double")).alias("sigma"),
    )
    z = (F.col("n").cast("double") - F.col("mu")) / F.col("sigma")
    return (
        buckets.join(F.broadcast(stats), "event_type")
        .where((F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_type",
            F.date_format("bkt", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.col("n").cast("long").alias("n_events"),
            F.round(z, 4).alias("z"),
        )
    )
