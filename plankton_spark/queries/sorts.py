"""Sort / limit / top-k operators (SURVEY.md §2.6).

The driver's hash is order-insensitive, so ordered semantics are made
visible by (a) LIMIT-set membership and (b) emitting the rank. Every
ORDER BY is tie-broken by a unique key (determinism policy §2.0).

Scale note: global ORDER BY + LIMIT k compiles to
TakeOrderedAndProject — per-partition top-k then a k-row merge on the
driver; no global sort materializes even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.functions import money, sql_money
from plankton_spark.io import read_table
from plankton_spark.operators import global_row_number
from plankton_spark.registry import query


@query(
    "q_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def q_sort_multikey(spark, sf_dir):
    """Multi-key sort (ASC, DESC) + LIMIT; set-membership checks order."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "q_sort_nulls",
    oracle="""
    SELECT l_orderkey, l_linenumber, disc_nullable, rn
    FROM (
      SELECT
        l_orderkey,
        l_linenumber,
        NULLIF(l_discount, 0.05) AS disc_nullable,
        ROW_NUMBER() OVER (
          ORDER BY NULLIF(l_discount, 0.05) ASC NULLS FIRST,
                   l_orderkey, l_linenumber
        ) AS rn
      FROM lineitem
      WHERE l_orderkey < 400
    )
    WHERE rn <= 40
    """,
)
def q_sort_nulls(spark, sf_dir):
    """NULLS FIRST semantics over manufactured nulls, rank emitted.

    The filter output grows with the data, so the global ROW_NUMBER is
    computed with the two-pass range-partition design
    (operators.global_row_number) — the naive Window.orderBy(...) plan
    funnels every surviving row through a single task (r6 verdict #2).
    """
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 400)
    disc = F.nullif(F.col("l_discount"), F.lit(0.05))
    ranked = global_row_number(
        li.select("l_orderkey", "l_linenumber", disc.alias("disc_nullable")),
        [
            F.col("disc_nullable").asc_nulls_first(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        out="rn",
    )
    return ranked.where(F.col("rn") <= 40).select(
        "l_orderkey", "l_linenumber", "disc_nullable", "rn"
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10 OFFSET 10
    """,
)
def q_limit_offset(spark, sf_dir):
    """OFFSET + LIMIT pagination over a tie-broken global sort."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_topk_global",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({sql_money('l_extendedprice')} * {sql_money('1 - l_discount')} AS DOUBLE) AS revenue
    FROM lineitem
    ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def q_topk_global(spark, sf_dir):
    """Global top-10 by computed revenue (TakeOrderedAndProject)."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = (money(F.col("l_extendedprice")) * money(1 - F.col("l_discount"))).cast(
        "double"
    )
    return (
        li.select("l_orderkey", "l_linenumber", rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(10)
    )
