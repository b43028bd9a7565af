"""Set operations (SURVEY.md §2.7).

Distinct-set ops group-reduce each side before the compare; *_all
(bag) variants preserve multiplicity. Results are emitted as
(value, multiplicity) so the bag semantics are hash-visible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import query


def _cust_nk(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nk(spark, sf_dir):
    return read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "q_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q_union_all(spark, sf_dir):
    """UNION ALL (bag) — multiplicities emitted."""
    u = _cust_nk(spark, sf_dir).unionByName(_supp_nk(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark, sf_dir):
    """UNION (distinct)."""
    return _cust_nk(spark, sf_dir).union(_supp_nk(spark, sf_dir)).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark, sf_dir):
    """INTERSECT (distinct)."""
    return _cust_nk(spark, sf_dir).intersect(_supp_nk(spark, sf_dir))


@query(
    "q_intersect_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics, min multiplicity per value)."""
    u = _cust_nk(spark, sf_dir).intersectAll(_supp_nk(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark, sf_dir):
    """EXCEPT (distinct): customer nations with no supplier."""
    return _cust_nk(spark, sf_dir).subtract(_supp_nk(spark, sf_dir))


@query(
    "q_except_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q_except_all(spark, sf_dir):
    """EXCEPT ALL (bag difference of multiplicities)."""
    u = _cust_nk(spark, sf_dir).exceptAll(_supp_nk(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt"))
