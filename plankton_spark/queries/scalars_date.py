"""Date/time scalar functions (SURVEY.md §2.8).

Convention alignment with the oracle:
- Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → +1.
- Date-typed results are emitted as formatted strings (cross-engine
  date/timestamp dtype hashing is unsafe; strings are not).
- months_between has no DuckDB twin; the oracle replicates Spark's
  documented formula (time-of-day parts are all zero in the fixture —
  verified: every o_orderdate is midnight-aligned).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.functions import dsum, sql_sum
from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q_date_parts(spark, sf_dir):
    """year/month/day/quarter/dayofweek/dayofyear extraction."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@query(
    "q_date_trunc",
    oracle=f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           COUNT(*) AS n_orders,
           {sql_sum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY 1
    """,
)
def q_date_trunc(spark, sf_dir):
    """date_trunc to month + revenue rollup per month."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-03-15', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           ROUND((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 3)
                 + (day(o_orderdate) - 15) / 31.0, 6) AS months_since
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q_date_arith(spark, sf_dir):
    """datediff / date_add / add_months / last_day / months_between."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    anchor = F.lit("1995-03-15").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), anchor).alias("days_since"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
        F.date_format(F.add_months(F.col("o_orderdate").cast("date"), 2), "yyyy-MM-dd").alias(
            "plus_2mo"
        ),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.round(F.months_between(F.col("o_orderdate"), anchor), 6).alias("months_since"),
    )


@query(
    "q_date_format",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           COUNT(*) AS n_orders,
           {sql_sum('o_totalprice', 'revenue')}
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def q_date_format(spark, sf_dir):
    """date_format to a year-month bucket string."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )


@query(
    "q_date_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    days AS (
      SELECT unnest(generate_series(
               (SELECT lo FROM bounds), (SELECT hi FROM bounds),
               INTERVAL 1 DAY)) AS d
    ),
    counts AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_orders,
           CAST(counts.n IS NULL AS BOOLEAN) AS is_gap
    FROM days LEFT JOIN counts ON days.d = counts.d
    """,
)
def q_date_gapfill(spark, sf_dir):
    """Time-series gap filling: generate the full calendar between the
    observed min/max dates (sequence + explode — a few thousand rows
    from a 2-row bound frame, never a driver loop), left-join daily
    counts, flag the gaps. The calendar side is tiny and broadcast;
    the counts side is a partial-aggregated shuffle — scale-safe."""
    o = read_table(spark, sf_dir, "orders")
    counts = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return days.join(counts, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
        F.col("n").isNull().alias("is_gap"),
    )
