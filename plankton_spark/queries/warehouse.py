"""Warehouse-maintenance and data-quality patterns (SURVEY.md §2
round-8 continuation): SCD Type-2 dimension versioning and
distribution-drift detection between time windows.

Scale posture:
- q_merge_scd2 is the standard expire-and-insert: one anti/left join
  against the (comparatively tiny, broadcastable) change set plus a
  union — the dimension is never shuffled on anything but its key,
  and the change set is the only thing scanned twice.
- q_drift_tvd is two hash aggs over ONE scan of the fact (conditional
  counts per bucket, then per-type totals) with the total-variation
  distance computed from EXACT integer cross products
  (|cA*tB - cB*tA| in DECIMAL(38,0)) — no per-engine float
  accumulation order anywhere before the final rounded division.
"""

from __future__ import annotations

from plankton_spark.io import read_table
from plankton_spark.registry import query

_SCD2 = """
WITH chg AS (
  SELECT DISTINCT o_custkey
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1996-07-01'
    AND o_custkey % 3 = 0
)
SELECT c_custkey, CAST(1 AS BIGINT) AS version,
       c_mktsegment AS segment,
       (chg.o_custkey IS NULL) AS is_current
FROM customer LEFT JOIN chg ON c_custkey = chg.o_custkey
WHERE c_custkey % 3 = 0
UNION ALL
SELECT c_custkey, CAST(2 AS BIGINT) AS version,
       'UPGRADED' AS segment, TRUE AS is_current
FROM customer JOIN chg ON c_custkey = chg.o_custkey
WHERE c_custkey % 3 = 0
"""

_DRIFT = """
WITH b AS (
  SELECT event_type,
         LEAST(CAST(9 AS BIGINT), CAST(FLOOR(value / 10) AS BIGINT))
           AS bucket,
         CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
              THEN 1 ELSE 0 END AS in_a
  FROM events
),
bc AS (
  SELECT event_type, bucket,
         CAST(SUM(in_a) AS BIGINT) AS ca,
         CAST(SUM(1 - in_a) AS BIGINT) AS cb
  FROM b GROUP BY event_type, bucket
),
tot AS (
  SELECT event_type,
         CAST(SUM(ca) AS BIGINT) AS ta,
         CAST(SUM(cb) AS BIGINT) AS tb
  FROM bc GROUP BY event_type
)
SELECT bc.event_type,
       tot.ta AS n_before, tot.tb AS n_after,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(CAST(SUM(ABS(CAST(bc.ca AS DECIMAL(38,0)) * tot.tb
                          - CAST(bc.cb AS DECIMAL(38,0)) * tot.ta))
                  AS DOUBLE)
             / CAST(2 * tot.ta * tot.tb AS DOUBLE), 6) AS tvd
FROM bc JOIN tot ON bc.event_type = tot.event_type
GROUP BY bc.event_type, tot.ta, tot.tb
"""

_TABLES = {
    "q_merge_scd2": ("customer", "orders"),
    "q_drift_tvd": ("events",),
}


def _run_sql(spark, sf_dir, name, sql):
    for t in _TABLES[name]:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("q_merge_scd2", oracle=_SCD2)
def q_merge_scd2(spark, sf_dir):
    """SCD Type-2 dimension versioning: customers who placed an
    URGENT order in 1996-H1 get a version-2 'UPGRADED' row and their
    version-1 row flips is_current=false; untouched customers keep
    version 1 current. Integer versions + a current flag stand in for
    valid_from/valid_to dates (the determinism policy keeps raw dates
    out of output columns). The SAME SQL text is the oracle; the
    Spark plan is one left join + one inner join against the
    broadcastable change set, unioned."""
    return _run_sql(spark, sf_dir, "q_merge_scd2", _SCD2)


@query("q_drift_tvd", oracle=_DRIFT)
def q_drift_tvd(spark, sf_dir):
    """Distribution drift per event type between the first and second
    half of the month: values histogrammed into 10 fixed buckets, and
    the total-variation distance computed from exact integer cross
    products — TVD = sum|cA*tB - cB*tA| / (2*tA*tB), so the only
    float op is ONE final division of exactly-equal inputs on both
    engines. The SAME SQL text is the oracle. (At sf0.01 the halves
    are i.i.d. so tvd is near 0 — the test seeds a shifted window to
    prove sensitivity.)"""
    return _run_sql(spark, sf_dir, "q_drift_tvd", _DRIFT)


_MAD = """
WITH c AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
r1 AS (
  SELECT event_type, event_id, cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
),
m AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(cents * (
           CASE WHEN rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
                THEN 1 ELSE 0 END
           + CASE WHEN rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT)
                  THEN 1 ELSE 0 END)) AS BIGINT) AS med2x
  FROM r1 GROUP BY event_type
),
d AS (
  SELECT c.event_type, c.event_id,
         ABS(2 * c.cents - m.med2x) AS dev
  FROM c JOIN m ON c.event_type = m.event_type
),
r2 AS (
  SELECT event_type, dev,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY dev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type,
         CAST(SUM(dev * (
           CASE WHEN rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
                THEN 1 ELSE 0 END
           + CASE WHEN rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT)
                  THEN 1 ELSE 0 END)) AS BIGINT) AS mad4x
  FROM r2 GROUP BY event_type
)
SELECT m.event_type, m.n AS n_events,
       m.med2x AS median2x_cents,
       mad.mad4x AS mad4x_cents,
       CAST((SELECT COUNT(*) FROM d
             WHERE d.event_type = m.event_type
               AND 2 * d.dev > 3 * mad.mad4x) AS BIGINT) AS n_outliers
FROM m JOIN mad ON m.event_type = mad.event_type
"""

_TABLES["q_anomaly_mad"] = ("events",)


@query("q_anomaly_mad", oracle=_MAD)
def q_anomaly_mad(spark, sf_dir):
    """Robust outlier detection per event type with EXACT integer
    median/MAD: the two-middle weighted order-statistic trick (odd
    counts take the single middle twice — a plain rank-IN halves it,
    the r7 review finding) applied twice, in doubled integer spaces
    (median2x = 2x median of cents, mad4x = 4x the MAD), so the
    3-sigma-equivalent rule 2*|2c - med2x| > 3*mad4x never touches a
    float. Engines' own median()/percentile() interpolate halves
    differently — this sidesteps the convention entirely. The SAME
    SQL text is the oracle; windows partition by event_type."""
    return _run_sql(spark, sf_dir, "q_anomaly_mad", _MAD)
