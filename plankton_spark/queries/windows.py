"""Window functions (SURVEY.md §2.5).

Every ORDER BY inside a window is tie-broken by a unique key so both
engines rank identically (determinism policy §2.0). At scale a window
is one shuffle on its partition key; unpartitioned windows
(q_sort_nulls-style) are driver-bottlenecks and appear here only on
tiny filtered slices.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.operators import global_row_number
from plankton_spark.registry import query


@query(
    "q_win_rownumber",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS rn
    FROM orders WHERE o_custkey < 200
    """,
)
def q_win_rownumber(spark, sf_dir):
    """row_number per customer ordered by (date, key)."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    )


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark, sf_dir):
    """rank + dense_rank over price within status."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_win_ntile_pctrank",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders WHERE o_orderkey < 3000
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_ntile_pctrank(spark, sf_dir):
    """ntile / percent_rank / cume_dist over a global tie-broken order,
    computed WITHOUT a single-partition window (the naive
    Window.orderBy(...) plan funnels every row through one task).

    Uses the shared two-pass global ranking operator
    (operators.global_row_number — range-repartition, broadcast prefix
    offsets, pid-partitioned row_number). The sort key is tie-broken
    by a unique key (§2.0), so rank == row_number and the rank-family
    exprs are closed-form in (rn, n).

    NTILE(k) follows SQL semantics: the first n % k tiles get
    ceil(n/k) rows, the rest floor(n/k).
    """
    o = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 3000)
        .select("o_orderkey", "o_totalprice")
    )
    ranked = global_row_number(
        o,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        out="rn",
        total_out="n",
    ).select("o_orderkey", "n", "rn")
    k = F.lit(4)
    base = (F.col("n") / k).cast("long")  # floor(n/k)
    rem = F.col("n") % k
    in_big = F.col("rn") <= rem * (base + 1)
    quartile = (
        F.when(in_big, ((F.col("rn") - 1) / (base + 1)).cast("long") + 1)
        .otherwise(rem + ((F.col("rn") - rem * (base + 1) - 1) / base).cast("long") + 1)
        .cast("int")
    )
    pct = F.when(F.col("n") > 1, (F.col("rn") - 1) / (F.col("n") - 1)).otherwise(F.lit(0.0))
    return ranked.select(
        "o_orderkey",
        quartile.alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(F.col("rn") / F.col("n"), 6).alias("cume"),
    )


@query(
    "q_win_laglead",
    oracle="""
    SELECT user_id, event_id,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_value
    FROM events WHERE user_id < 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_laglead(spark, sf_dir):
    """lag/lead with defaults over per-user event time."""
    e = read_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 4) AS running_spend
    FROM orders WHERE o_custkey < 200
    """,
)
def q_win_running(spark, sf_dir):
    """Running (cumulative) sum with an explicit row frame."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double"),
            4,
        ).alias("running_spend"),
    )


@query(
    "q_win_moving",
    oracle="""
    SELECT user_id, event_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS moving_avg
    FROM events WHERE user_id < 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_moving(spark, sf_dir):
    """Moving average over a 3-row frame (decimal-sum / count)."""
    e = read_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("moving_avg"),
    )


@query(
    "q_win_rangeframe",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY epoch_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 4) AS spend_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
      FROM orders WHERE o_custkey < 100
    )
    """,
)
def q_win_rangeframe(spark, sf_dir):
    """RANGE frame over epoch-day: trailing 30-day spend per customer.
    (Value-range frames, unlike row frames, absorb same-day ties.)"""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    o = o.withColumn(
        "epoch_day",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double"),
            4,
        ).alias("spend_30d"),
    )


@query(
    "q_win_firstlastval",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER w AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_firstlastval(spark, sf_dir):
    """first/last/nth value with a full-partition frame."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "q_topk_pergroup",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      ) AS rn FROM orders
    ) WHERE rn <= 2
    """,
)
def q_topk_pergroup(spark, sf_dir):
    """Top-2 orders per customer (window rank + filter). At scale the
    rank filter is pushed as a per-partition top-k by Spark's
    WindowGroupLimit optimization — no full sort of each group."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
