"""Classic TPC-H-shaped multi-join OLAP queries through the SQL
surface (SURVEY.md §2.11 round-7 additions): ONE dialect-neutral SQL
text per query runs verbatim on Spark (temp views over the fixture
parquet) AND as its own DuckDB oracle — the strongest possible parity
statement for the relational core (any divergence in join semantics,
decimal arithmetic, date coercion, or aggregation is a hash
mismatch).

Determinism policy: money arithmetic in DECIMAL (exact, order-free),
final ROUND(CAST(... AS DOUBLE), 4); dates appear only as FILTERS
(emitting them would need dialect-specific formatting); every output
column aliased identically on both engines by construction.

Scale shape (read from .explain, asserted in tests/test_plan_lint.py
like every query): dimension tables broadcast under AQE's threshold,
the fact-side joins shuffle on their keys, aggregations are
partial-combinable hash aggs — the textbook star-join plans Catalyst
picks when the plan is declared relationally.
"""

from __future__ import annotations

from plankton_spark.io import read_table
from plankton_spark.registry import query

_Q3 = """
SELECT l_orderkey,
       o_orderpriority,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DOUBLE), 4) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1997-01-01'
  AND l_shipdate > DATE '1997-01-01'
GROUP BY l_orderkey, o_orderpriority
"""

_Q5 = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_lineitems
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""

_Q10 = """
SELECT c_custkey,
       c_name,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DOUBLE), 4) AS revenue,
       ROUND(CAST(CAST(MAX(c_acctbal) AS DECIMAL(18,4)) AS DOUBLE), 4)
         AS acctbal,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
"""

_TABLES = {
    "q_tpch_q3": ("customer", "orders", "lineitem"),
    "q_tpch_q5": (
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    ),
    "q_tpch_q10": ("customer", "orders", "lineitem", "nation"),
}


def _run_sql(spark, sf_dir, name, sql):
    for t in _TABLES[name]:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("q_tpch_q3", oracle=_Q3)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): BUILDING-segment orders placed
    before the cut whose lineitems shipped after it — 3-way star join
    + revenue agg. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q3", _Q3)


@query("q_tpch_q5", oracle=_Q5)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-way join — customer and
    supplier pinned to the SAME nation inside ASIA, one year of
    orders, revenue per nation. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q5", _Q5)


@query("q_tpch_q10", oracle=_Q10)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): one quarter's returned
    lineitems rolled up to customer revenue with nation attached.
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q10", _Q10)
