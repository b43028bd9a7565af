"""Aggregation operators (SURVEY.md §2.4).

All reductions over double columns follow the determinism policy in
``plankton_spark.functions`` (exact decimal accumulation). Group-by
aggregation in Spark is automatically partial+final (map-side
combine), so at 100 TB each of these shuffles only one pre-aggregated
row per (partition, group) — the right plan without hints.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.functions import (
    davg,
    dsum,
    dsum_dec,
    money,
    sql_avg,
    sql_money,
    sql_sum,
    sql_sum_dec,
)
from plankton_spark.io import read_table
from plankton_spark.registry import query

SHIP_CUTOFF = "1998-09-02"


@query(
    "q_agg_group",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_sum('l_quantity', 'sum_qty')},
      {sql_sum('l_extendedprice', 'sum_base_price')},
      {sql_sum_dec(f"{sql_money('l_extendedprice')} * {sql_money('1 - l_discount')}", 'sum_disc_price')},
      {sql_sum_dec(f"{sql_money('l_extendedprice')} * {sql_money('1 - l_discount')} * {sql_money('1 + l_tax')}", 'sum_charge')},
      {sql_avg('l_quantity', 'avg_qty')},
      {sql_avg('l_extendedprice', 'avg_price')},
      {sql_avg('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark, sf_dir):
    """Flagship pricing-summary (TPC-H Q1 shape on the fixture subset).

    Scan → pushed filter → project → hash-aggregate; at scale this is
    one shuffle of ~6 grouped rows per map partition.
    """
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit(SHIP_CUTOFF))
    )
    disc_price = money(F.col("l_extendedprice")) * money(1 - F.col("l_discount"))
    charge = disc_price * money(1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum_dec(disc_price, "sum_disc_price"),
        dsum_dec(charge, "sum_charge"),
        davg(F.col("l_quantity"), "avg_qty"),
        davg(F.col("l_extendedprice"), "avg_price"),
        davg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_agg_global",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      {sql_sum('l_quantity', 'sum_qty')},
      {sql_avg('l_extendedprice', 'avg_price')},
      MIN(l_quantity) AS min_qty,
      MAX(l_quantity) AS max_qty,
      COUNT(l_orderkey) AS n_orderkeys
    FROM lineitem
    """,
)
def q_agg_global(spark, sf_dir):
    """Global (no-group) aggregate: SUM/AVG/MIN/MAX/COUNT in one pass."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity"), "sum_qty"),
        davg(F.col("l_extendedprice"), "avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("l_orderkey").alias("n_orderkeys"),
    )
