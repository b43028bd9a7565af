"""Subquery operators: scalar, IN, correlated EXISTS, lateral-style
derived tables. Catalyst decorrelates these into joins
(EXISTS→left-semi, NOT IN→anti with null care) — declared through the
SQL entry point (E2) since subqueries are a SQL-surface feature."""

from __future__ import annotations

from plankton_spark.functions import sql_sum
from plankton_spark.io import register_views
from plankton_spark.registry import query


@query(
    "q_subq_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - (SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                        / COUNT(*), 6) FROM orders), 6) AS delta_vs_avg
    FROM orders WHERE o_orderkey < 500
    """,
)
def q_subq_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery (global avg) in a projection."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                            / COUNT(*), 6) FROM orders), 6) AS delta_vs_avg
        FROM orders WHERE o_orderkey < 500
        """
    )


@query(
    "q_subq_in",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 2
    )
    """,
)
def q_subq_in(spark, sf_dir):
    """IN-subquery (decorrelates to left-semi join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@query(
    "q_subq_corr",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT 1.5 * ROUND(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*), 6)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    ) AND o_orderkey < 5000
    """,
)
def q_subq_corr(spark, sf_dir):
    """Correlated scalar subquery: orders 1.5x above their customer's
    average (decorrelates to an aggregate + join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT 1.5 * ROUND(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                       / COUNT(*), 6)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        ) AND o_orderkey < 5000
        """
    )


@query(
    "q_subq_notexists",
    oracle="""
    SELECT n_nationkey, n_name
    FROM nation n
    WHERE NOT EXISTS (
      SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey
    )
    """,
)
def q_subq_notexists(spark, sf_dir):
    """Correlated NOT EXISTS (decorrelates to left-anti join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_nationkey, n_name
        FROM nation n
        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
        """
    )


@query(
    "q_cte_query",
    oracle=f"""
    WITH seg_rev AS (
      SELECT c_mktsegment, {sql_sum('o_totalprice', 'revenue')}
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    ),
    ranked AS (
      SELECT c_mktsegment, revenue,
             RANK() OVER (ORDER BY revenue DESC) AS rnk
      FROM seg_rev
    )
    SELECT c_mktsegment, revenue, rnk FROM ranked WHERE rnk <= 3
    """,
)
def q_cte_query(spark, sf_dir):
    """CTE chain (WITH ... ) through the SQL entry point."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH seg_rev AS (
          SELECT c_mktsegment, {sql_sum('o_totalprice', 'revenue')}
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
        ),
        ranked AS (
          SELECT c_mktsegment, revenue,
                 RANK() OVER (ORDER BY revenue DESC) AS rnk
          FROM seg_rev
        )
        SELECT c_mktsegment, revenue, rnk FROM ranked WHERE rnk <= 3
        """
    )
