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

from pyspark.sql import Window
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


@query(
    "q_gapfill_locf",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    obs AS (
      SELECT event_type, CAST(date_trunc('hour', ts2) AS TIMESTAMP) AS hr,
             CAST((SUM(CAST(ROUND(value * 100) AS BIGINT) + 10000000)
                   * 10000) // COUNT(*) AS BIGINT) AS v_micro
      FROM e GROUP BY 1, 2
    ),
    cal AS (
      SELECT t.event_type, h.hr
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (
        SELECT UNNEST(generate_series(
          (SELECT MIN(hr) FROM obs), (SELECT MAX(hr) FROM obs),
          INTERVAL 1 HOUR)) AS hr
      ) h
    ),
    joined AS (
      SELECT c.event_type, c.hr, obs.v_micro FROM cal c
      LEFT JOIN obs ON obs.event_type = c.event_type AND obs.hr = c.hr
    ),
    filled AS (
      SELECT event_type, hr, v_micro,
        LAST_VALUE(v_micro IGNORE NULLS) OVER w_prev AS prev_v,
        LAST_VALUE(CASE WHEN v_micro IS NOT NULL THEN hr END IGNORE NULLS)
          OVER w_prev AS prev_hr,
        FIRST_VALUE(v_micro IGNORE NULLS) OVER w_next AS next_v,
        FIRST_VALUE(CASE WHEN v_micro IS NOT NULL THEN hr END IGNORE NULLS)
          OVER w_next AS next_hr
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, STRFTIME(hr, '%Y-%m-%d %H:00') AS hour,
           v_micro IS NULL AS is_gap,
           CAST(prev_v - 100000000000 AS BIGINT) AS locf_micro,
           CAST((CASE
             WHEN v_micro IS NOT NULL THEN v_micro
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE (prev_v * (CAST(EPOCH(next_hr) - EPOCH(hr) AS BIGINT) // 3600)
                   + next_v * (CAST(EPOCH(hr) - EPOCH(prev_hr) AS BIGINT) // 3600))
                  // (CAST(EPOCH(next_hr) - EPOCH(prev_hr) AS BIGINT) // 3600)
           END) - 100000000000 AS BIGINT) AS interp_micro
    FROM filled
    """,
)
def q_gapfill_locf(spark, sf_dir):
    """Gap-filled hourly rollup with LOCF and linear interpolation
    (the hypertable `time_bucket_gapfill + locf + interpolate`
    pattern): per event type, the hourly mean of `value` on a
    complete hour calendar; missing hours carry the last observation
    forward AND linearly interpolate between the bracketing
    observations.

    Scale shape: the raw scan collapses via ONE partial-combinable
    hash agg to (type x hour) rows; only that CALENDAR-sized frame
    (bounded by wall-clock span, not data volume -- 100x rows is the
    same month of hours) flows through the per-type carry windows, so
    the low-cardinality partition key is safe by construction.

    Determinism: everything is integer MICRO-UNITS -- cent-exact
    value sums OFFSET into positive range (+1e7 cents per row, so the
    integer divisions are truncation == floor in BOTH engines; Spark
    DIV truncates while DuckDB // floors, and they disagree on
    negatives -- the same hazard q_cluster_kmeans documents), the
    offset subtracted exactly at output (the mean and the blend are
    offset-affine). Neither decimal ROUND on doubles nor
    decimal->double casts are bit-identical across engines (both
    measured to differ at half-case boundaries here), hence no FP
    anywhere."""
    e = _events_second(spark, sf_dir)
    obs = e.groupBy(
        "event_type", F.date_trunc("hour", "ts2").alias("hr")
    ).agg(
        F.expr(
            "(sum(cast(round(value * 100) as bigint) + 10000000)"
            " * 10000) DIV count(*)"
        ).alias("v_micro")
    )
    bounds = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    cal = e.select("event_type").distinct().crossJoin(hours)
    joined = cal.join(obs, ["event_type", "hr"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("v_micro").isNotNull(), F.col("hr"))
    filled = joined.select(
        "event_type",
        "hr",
        "v_micro",
        F.last("v_micro", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_hr, ignorenulls=True).over(w_prev).alias("prev_hr"),
        F.first("v_micro", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_hr, ignorenulls=True).over(w_next).alias("next_hr"),
    )
    blend = F.expr(
        "(prev_v * (cast((unix_timestamp(next_hr) - unix_timestamp(hr)) / 3600 as bigint))"
        " + next_v * (cast((unix_timestamp(hr) - unix_timestamp(prev_hr)) / 3600 as bigint)))"
        " DIV (cast((unix_timestamp(next_hr) - unix_timestamp(prev_hr)) / 3600 as bigint))"
    )
    interp = (
        F.when(F.col("v_micro").isNotNull(), F.col("v_micro"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(blend)
    )
    return filled.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        F.col("v_micro").isNull().alias("is_gap"),
        (F.col("prev_v") - F.lit(100_000_000_000)).alias("locf_micro"),
        (interp - F.lit(100_000_000_000)).cast("long").alias("interp_micro"),
    )


@query(
    "q_rollup_timeweighted",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    iv AS (
      SELECT event_type, value,
             CAST(EPOCH(LEAD(ts2) OVER (
               PARTITION BY event_type, user_id ORDER BY ts2, event_id
             )) - EPOCH(ts2) AS BIGINT) AS dur_s
      FROM e
    )
    SELECT event_type,
           COUNT(*) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_dur_s,
           ROUND(
             CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) * dur_s
                           AS DECIMAL(28,0))) AS DOUBLE)
             / (100.0 * CAST(SUM(dur_s) AS DOUBLE)), 6) AS twa
    FROM iv WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY event_type
    """,
)
def q_rollup_timeweighted(spark, sf_dir):
    """Time-weighted average (the hypertable `time_weight('locf')`
    rollup): each event's value holds until the SAME USER's next event
    of that type, and the per-type average weights values by that
    holding duration — the right mean for irregularly sampled series
    (a value held for an hour counts 3600× a one-second blip).

    Scale shape: the carry window partitions on (event_type, user_id)
    — data-sized key cardinality, so no single task ever holds a
    whole type (the module's no-low-cardinality-window rule); the
    final rollup is one partial-combinable hash agg. Determinism:
    cent-exact value integers × whole-second durations summed as
    decimals — no FP reduction anywhere until the final division."""
    e = _events_second(spark, sf_dir)
    w = Window.partitionBy("event_type", "user_id").orderBy("ts2", "event_id")
    iv = e.select(
        "event_type",
        "value",
        (
            F.unix_timestamp(F.lead("ts2").over(w)) - F.unix_timestamp("ts2")
        ).cast("long").alias("dur_s"),
    ).where(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    cents = F.round(F.col("value") * 100).cast("long")
    return iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_s").cast("long").alias("total_dur_s"),
        F.round(
            F.sum((cents * F.col("dur_s")).cast("decimal(28,0)")).cast("double")
            / (F.lit(100.0) * F.sum("dur_s").cast("double")),
            6,
        ).alias("twa"),
    )


@query(
    "q_attribution",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    tagged AS (
      SELECT user_id, ts2, event_id,
             CASE WHEN event_type IN ('click', 'view') THEN 0 ELSE 1 END
               AS side,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END
               AS touch,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT) END AS cents
      FROM e WHERE event_type IN ('click', 'view', 'purchase')
    ),
    carried AS (
      SELECT side, cents,
             LAST_VALUE(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts2, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS channel
      FROM tagged
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM carried WHERE side = 1
    GROUP BY 1
    """,
)
def q_attribution(spark, sf_dir):
    """Last-touch marketing attribution: every purchase's revenue is
    credited to the SAME user's most recent preceding touch (click or
    view); purchases with no prior touch bucket as 'direct'. The same
    union-and-carry plan as the as-of joins — one shuffle on user_id,
    a per-user ordered carry, no pair blowup — followed by one hash
    agg over the (tiny) channel dimension. Revenue is cent-exact
    integers; ordering ties break on (side, event_id), identical in
    the oracle's window."""
    e = _events_second(spark, sf_dir)
    is_touch = F.col("event_type").isin("click", "view")
    tagged = e.where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        "ts2",
        "event_id",
        F.when(is_touch, F.lit(0)).otherwise(F.lit(1)).alias("side"),
        F.when(is_touch, F.col("event_type")).alias("touch"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        ).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts2", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "channel", F.last("touch", ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("side") == 1)
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


@query(
    "q_anomaly_cusum",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    obs AS (
      SELECT event_type, CAST(date_trunc('hour', ts2) AS TIMESTAMP) AS hr,
             COUNT(*) AS n
      FROM e GROUP BY 1, 2
    ),
    cal AS (
      SELECT t.event_type, h.hr
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (
        SELECT UNNEST(generate_series(
          (SELECT MIN(hr) FROM obs), (SELECT MAX(hr) FROM obs),
          INTERVAL 1 HOUR)) AS hr
      ) h
    ),
    series AS (
      SELECT c.event_type, c.hr,
             CAST(COALESCE(obs.n, 0) AS BIGINT) AS n,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c.event_type ORDER BY c.hr) - 1 AS BIGINT)
               AS idx
      FROM cal c LEFT JOIN obs
        ON obs.event_type = c.event_type AND obs.hr = c.hr
    ),
    stats AS (
      SELECT event_type,
             CAST((SUM(n) * 1000000) // COUNT(*) AS BIGINT) AS mean_micro
      FROM series GROUP BY event_type
    ),
    dev AS (
      SELECT s.event_type, s.idx,
             s.n * 1000000 - st.mean_micro - st.mean_micro // 2 AS d
      FROM series s JOIN stats st ON st.event_type = s.event_type
    ),
    pfx AS (
      SELECT event_type, idx,
             CAST(SUM(d) OVER w AS BIGINT) AS p
      FROM dev
      WINDOW w AS (PARTITION BY event_type ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cusum AS (
      SELECT p2.event_type, p2.idx,
             p2.p - LEAST(CAST(0 AS BIGINT), CAST(MIN(p2.p) OVER (
               PARTITION BY p2.event_type ORDER BY p2.idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT)) AS s
      FROM pfx p2
    ),
    flagged AS (
      SELECT c.*, st.mean_micro * 3 AS h
      FROM cusum c JOIN stats st ON st.event_type = c.event_type
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_hours,
           CAST(MAX(s) AS BIGINT) AS max_cusum_micro,
           CAST(MIN(CASE WHEN s > h THEN idx END) AS BIGINT)
             AS first_alarm_idx
    FROM flagged GROUP BY event_type
    """,
)
def q_anomaly_cusum(spark, sf_dir):
    """CUSUM change-point detection over the per-type hourly volume
    series (the streaming-ops 'did traffic shift regime' monitor):
    one-sided CUSUM S_i = max(0, S_{i-1} + x_i - mean - slack),
    alarming when S crosses 3x the hourly mean.

    The recursion is NOT directly window-expressible, but its closed
    form is: S_i = prefix_i - min(0, running_min(prefix_{<=i})) —
    one running sum + one running min over the CALENDAR-sized frame
    (bounded by wall-clock span, the gapfill rule, so the per-type
    window partitioning is safe). All arithmetic in integer
    micro-units: counts, means (floor division on positives), and
    deviations are exact in both engines."""
    e = _events_second(spark, sf_dir)
    obs = e.groupBy(
        "event_type", F.date_trunc("hour", "ts2").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = obs.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    cal = e.select("event_type").distinct().crossJoin(hours)
    w_ord = Window.partitionBy("event_type").orderBy("hr")
    series = (
        cal.join(obs, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .withColumn("idx", (F.row_number().over(w_ord) - 1).cast("long"))
    )
    stats = series.groupBy("event_type").agg(
        F.expr("CAST((sum(n) * 1000000) DIV count(*) AS BIGINT)").alias(
            "mean_micro"
        )
    )
    dev = series.join(stats, "event_type").select(
        "event_type",
        "idx",
        (
            F.col("n") * 1000000
            - F.col("mean_micro")
            - F.expr("mean_micro DIV 2")
        ).alias("d"),
        "mean_micro",
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pfx = dev.withColumn("p", F.sum("d").over(w_run))
    # the closed form needs the running min INCLUDING the current row:
    # S_i = p_i - min(0, min_{j<=i} p_j). Excluding it (the first cut,
    # review finding) made S negative on partitions with no positive
    # excursion, where one-sided CUSUM is >= 0 by definition.
    cusum = pfx.withColumn(
        "s",
        F.col("p")
        - F.least(F.lit(0).cast("long"), F.min("p").over(w_run)),
    )
    alarm = F.col("s") > F.col("mean_micro") * 3
    return cusum.groupBy("event_type").agg(
        F.sum(alarm.cast("int")).cast("long").alias("n_alarm_hours"),
        F.max("s").cast("long").alias("max_cusum_micro"),
        F.min(F.when(alarm, F.col("idx"))).cast("long").alias("first_alarm_idx"),
    )


@query(
    "q_path_pattern",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    paths AS (
      SELECT user_id,
             STRING_AGG(event_type, '>' ORDER BY ts2, event_id) AS path
      FROM e GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             REGEXP_MATCHES(path, 'click.*view.*purchase') AS hit,
             LENGTH(path) - LENGTH(REPLACE(path, '>', '')) + 1
               AS n_events
      FROM paths
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           CAST(SUM(CASE WHEN hit THEN user_id END) AS BIGINT)
             AS matched_user_sum,
           CAST(MAX(n_events) AS BIGINT) AS max_path_len
    FROM m
    """,
)
def q_path_pattern(spark, sf_dir):
    """Ordered path-pattern matching (the MATCH_RECOGNIZE / funnel-
    with-ordering primitive): per user, the full event sequence
    (totally ordered by ts, tie-broken by event_id) folds to a path
    string and a regex asserts the ordered subsequence
    click → … → view → … → purchase. One shuffle builds the per-user
    paths (collect_list under an ordering window would be two — the
    sort_array(struct) fold keeps it partial-aggregatable); the
    pattern test is a per-row regex, embarrassingly parallel. Output
    is user counts + an identity-pinning matched-id sum."""
    e = _events_second(spark, sf_dir)
    paths = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts2", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    m = paths.select(
        "user_id",
        F.col("path").rlike("click.*view.*purchase").alias("hit"),
        (F.size(F.split("path", ">", -1))).cast("long").alias("n_events"),
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("hit").cast("int")).cast("long").alias("n_matched"),
        F.sum(F.when(F.col("hit"), F.col("user_id"))).cast("long").alias(
            "matched_user_sum"
        ),
        F.max("n_events").cast("long").alias("max_path_len"),
    )


@query(
    "q_conversion_delay",
    oracle=f"""
    WITH e AS ({_EVENTS_SECOND}),
    tagged AS (
      SELECT user_id, ts2, event_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
      FROM e WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
      SELECT side, event_id,
             CAST(EPOCH(ts2) - EPOCH(LAST_VALUE(
               CASE WHEN side = 0 THEN ts2 END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts2, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )) AS BIGINT) AS delay_s
      FROM tagged
    ),
    delays AS (
      SELECT delay_s,
             ROW_NUMBER() OVER (ORDER BY delay_s, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM carried WHERE side = 1 AND delay_s IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(MIN(delay_s) AS BIGINT) AS min_s,
           CAST(MAX(delay_s) AS BIGINT) AS max_s,
           CAST(SUM(delay_s) AS BIGINT) AS total_s,
           CAST(SUM(delay_s * (
                  CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END
                + CASE WHEN rn = (n + 2) // 2 THEN 1 ELSE 0 END))
             AS BIGINT) AS median2x_s
    FROM delays
    """,
)
def q_conversion_delay(spark, sf_dir):
    """Click-to-purchase conversion delay: each purchase's seconds
    since the SAME user's most recent click (union-and-carry — one
    shuffle), reduced to count/min/max/total and an EXACT integer
    median: median2x = the sum of the two middle order statistics,
    WEIGHTED so an odd count takes its single middle twice (a plain
    rank-IN test would halve it — review finding). Ranks come from
    the range-partitioned global_row_number operator with event_id as
    the unique tie-break (its total-order contract), and its
    total_out column supplies the global count in the SAME pass — no
    second job. Integer arithmetic where percentile interpolation
    would hit the engines' differing decimal halving; zero-conversion
    inputs agree too (COUNT(*) on both sides)."""
    from plankton_spark.operators.ranking import global_row_number

    e = _events_second(spark, sf_dir)
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts2",
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts2", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts2"))
    carried = tagged.withColumn(
        "delay_s",
        (
            F.unix_timestamp("ts2")
            - F.unix_timestamp(F.last(click_ts, ignorenulls=True).over(w))
        ).cast("long"),
    )
    delays = carried.where(
        (F.col("side") == 1) & F.col("delay_s").isNotNull()
    ).select("delay_s", "event_id")
    ranked = global_row_number(
        delays, ["delay_s", "event_id"], "rn", total_out="n"
    )
    mid_lo = F.floor((F.col("n") + 1) / 2)
    mid_hi = F.floor((F.col("n") + 2) / 2)
    weight = (F.col("rn") == mid_lo).cast("int") + (
        F.col("rn") == mid_hi
    ).cast("int")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.min("delay_s").cast("long").alias("min_s"),
        F.max("delay_s").cast("long").alias("max_s"),
        F.sum("delay_s").cast("long").alias("total_s"),
        F.sum(F.col("delay_s") * weight).cast("long").alias("median2x_s"),
    )


@query(
    "q_win_rolling_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
      FROM events
    ),
    cover AS (
      SELECT DISTINCT user_id, ud.d + w.i AS we
      FROM ud, (SELECT UNNEST(generate_series(0, 6)) AS i) w
    ),
    ends AS (SELECT DISTINCT d AS we FROM ud)
    SELECT CAST(e.we AS BIGINT) AS day_index,
           CAST(COUNT(*) AS BIGINT) AS rolling_7d_users
    FROM ends e JOIN cover c ON c.we = e.we
    GROUP BY e.we
    """,
)
def q_win_rolling_dau(spark, sf_dir):
    """Rolling 7-day distinct active users — COUNT(DISTINCT) over a
    sliding window, which no engine's window frame supports directly.
    The exact distributed shape: dedup (user, day) once, EXPLODE each
    activity day to the 7 window-ends it covers (a constant x7 row
    factor — linear, shuffle-free expansion), dedup (user, window_end),
    and count per end present in the data. Day indexes (days since the
    fixture epoch) keep dates out of the output per the determinism
    policy. The naive alternative — a per-window self-join — is
    O(days x activity) and skew-prone; this is the textbook exact
    rolling-distinct at 100 TB. Oracle mirrors with generate_series."""
    e = read_table(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d"),
        )
        .distinct()
    )
    cover = (
        ud.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select("user_id", (F.col("d") + F.col("i")).alias("we"))
        .distinct()
    )
    ends = ud.select(F.col("d").alias("we")).distinct()
    return (
        ends.join(cover, "we")
        .groupBy("we")
        .agg(F.count(F.lit(1)).alias("rolling_7d_users"))
        .select(
            F.col("we").cast("long").alias("day_index"),
            F.col("rolling_7d_users"),
        )
    )
