"""Projection / filter / predicate operators (SURVEY.md §2.2).

Every predicate here is expressed on base columns so Catalyst pushes
it into the parquet scan (visible as PushedFilters in .explain) —
at 100 TB these queries read only the row groups whose min/max
statistics can match.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.functions import money, sql_money
from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_project_expr",
    oracle=f"""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST({sql_money('l_extendedprice')} * {sql_money('1 - l_discount')} AS DOUBLE) AS revenue,
      l_quantity * 2 AS double_qty,
      'fixed' AS tag
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def q_project_expr(spark, sf_dir):
    """Computed columns: arithmetic expression, alias, literal."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (money(F.col("l_extendedprice")) * money(1 - F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        (F.col("l_quantity") * 2).alias("double_qty"),
        F.lit("fixed").alias("tag"),
    )


@query(
    "q_filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06
    """,
)
def q_filter_cmp(spark, sf_dir):
    """Comparison + BETWEEN predicates (pushed to the parquet scan)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.06)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in(spark, sf_dir):
    """IN-list predicate."""
    o = read_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%a%'
    """,
)
def q_filter_like(spark, sf_dir):
    """LIKE prefix + contains predicates."""
    p = read_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("PROMO%") & F.col("p_name").like("%a%")
    ).select("p_partkey", "p_type")


@query(
    "q_filter_null",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(NULLIF(l_discount, 0.0)) AS n_nonzero_disc,
      CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null
    FROM lineitem
    """,
)
def q_filter_null(spark, sf_dir):
    """IS NULL / IS NOT NULL over manufactured nulls (fixtures have none)."""
    li = read_table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nz).alias("n_nonzero_disc"),
        F.sum(F.when(nz.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(nz.isNotNull(), 1).otherwise(0)).alias("n_not_null"),
    )


@query(
    "q_filter_bool",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE NOT (event_type = 'view') AND (event_type = 'purchase' OR user_id % 2 = 0)
    """,
)
def q_filter_bool(spark, sf_dir):
    """NOT / OR / AND composition."""
    e = read_table(spark, sf_dir, "events")
    return e.where(
        (~(F.col("event_type") == "view"))
        & ((F.col("event_type") == "purchase") | (F.col("user_id") % 2 == 0))
    ).select("event_id", "event_type", "user_id")


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark, sf_dir):
    """DISTINCT projection (hash-aggregate underneath)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_dropdup_subset",
    oracle="""
    SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts, event_id
      ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def q_dropdup_subset(spark, sf_dir):
    """Deterministic row-per-key (first event per user by time).

    dropDuplicates() keeps an arbitrary row; the engine's canonical
    row-per-key is a window + rn=1 so re-runs are stable.
    """
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
        )
    )
