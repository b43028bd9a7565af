"""Closed-form invariants for the modern-SQL surface (sql_modern.py).

The oracle gate proves Spark == DuckDB on the same SQL text; these
tests pin properties a SHARED bug could break identically on both
engines (round-7 lesson): the recursive walk must reproduce the plain
per-customer aggregate, and the laterals must match their window /
groupBy reformulations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import all_queries
from tests.conftest import SF001


def test_recursive_chain_matches_plain_aggregate(spark):
    """Tail total + chain length from the recursion == plain groupBy:
    the walk visited every order exactly once, in some order, and the
    prefix accumulation ended at the full sum."""
    out = {
        r["o_custkey"]: r
        for r in all_queries()["q_cte_recursive"](spark, SF001).collect()
    }
    plain = {
        r["o_custkey"]: r
        for r in read_table(spark, SF001, "orders")
        .where((F.col("o_custkey") % 7) == 0)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert set(out) == set(plain) and len(out) > 50
    for k, r in out.items():
        assert r["chain_len"] == plain[k]["n"]
        assert r["total_cents"] == plain[k]["cents"]
        # prefix checksum strictly exceeds the tail total for any
        # chain longer than one order (prefixes are positive sums)
        if r["chain_len"] > 1:
            assert r["prefix_checksum_cents"] > r["total_cents"]


def test_recursive_plan_uses_union_loop(spark):
    """The recursion must run through Spark's recursive-CTE executor
    (UnionLoop), not a silent rewrite that caps depth. The registered
    query localCheckpoints (to scope the row-valve conf), which
    replaces its plan with LogicalRDD — so pin the plan on the
    pre-checkpoint SQL the query executes."""
    from plankton_spark.queries import sql_modern

    df = sql_modern._run_sql(spark, SF001, "q_cte_recursive", sql_modern._RECURSIVE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnionLoop" in plan


def test_recursive_row_valve_restored_after_query(spark):
    """q_cte_recursive raises cteRecursionRowLimit to corpus scale for
    its own execution ONLY — after it returns, the session must have
    the default 1e6-row runaway guard back (round-8 verdict #7)."""
    before = spark.conf.get("spark.sql.cteRecursionRowLimit")
    df = all_queries()["q_cte_recursive"](spark, SF001)
    assert df.count() > 50
    assert spark.conf.get("spark.sql.cteRecursionRowLimit") == before
    assert int(before) <= 1_000_000


def test_lateral_matches_window_reformulation(spark):
    out = {
        r["c_custkey"]: r
        for r in all_queries()["q_join_lateral"](spark, SF001).collect()
    }
    o = read_table(spark, SF001, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("cents").desc(), F.col("o_orderkey")
    )
    ref = {
        r["o_custkey"]: r
        for r in o.withColumn("rn", F.row_number().over(w))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias("top"),
            F.max(F.when(F.col("rn") == 1, F.col("o_orderkey"))).alias("topkey"),
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .where((F.col("o_custkey") % 13) == 0)
        .collect()
    }
    assert set(out) == set(ref) and len(out) > 20
    for k, r in out.items():
        assert r["top_price_cents"] == ref[k]["top"]
        assert r["top_orderkey"] == ref[k]["topkey"]
        assert r["n_orders"] == ref[k]["n"]
        assert r["total_cents"] == ref[k]["cents"]


def test_lateral_is_decorrelated(spark):
    """Catalyst must rewrite both laterals into joins (window top-1 +
    aggregate join) — a surviving LateralJoin would re-execute the
    subquery per outer row."""
    df = all_queries()["q_join_lateral"](spark, SF001)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LateralJoin" not in plan
    assert "Join Inner" in plan
