"""TPC-DS-shaped window/join queries (SURVEY.md §2 round-8
continuation): the two decision-support shapes the TPC-H suite does
not exercise, fixture-adapted, under the same one-SQL-text contract
as tpch_sql.py (one dialect-neutral text runs verbatim on Spark AND
as its own DuckDB oracle).

- q_tpcds_cumwin (DS Q51's signature): two independently aggregated
  series FULL OUTER joined on (group, month), cumulative windows
  computed OVER THE JOIN result (gaps on either side must carry the
  other side's running total correctly), then a rollup comparing the
  two running series.
- q_tpcds_rankdelta (DS Q44's signature): best-vs-worst rank
  self-join — two opposite-order rankings of the same aggregate
  equi-joined on rank position.

Scale shape: the cumulative windows partition by group (parallel);
the rank windows run over LIMIT-10 subquery results (constant rows
at any scale — allowlisted in plan lint with that justification).
"""

from __future__ import annotations

from plankton_spark.io import read_table
from plankton_spark.registry import query

_CUMWIN = """
WITH u AS (
  SELECT o_custkey % 20 AS grp,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
  GROUP BY o_custkey % 20, CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
),
o2 AS (
  SELECT o_custkey % 20 AS grp,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  WHERE o_orderpriority <> '1-URGENT'
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
  GROUP BY o_custkey % 20, CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
),
j AS (
  SELECT COALESCE(u.grp, o2.grp) AS grp,
         COALESCE(u.m, o2.m) AS m,
         COALESCE(u.cents, 0) AS uc,
         COALESCE(o2.cents, 0) AS oc
  FROM u FULL OUTER JOIN o2 ON u.grp = o2.grp AND u.m = o2.m
),
w AS (
  SELECT grp, m,
         SUM(uc) OVER (PARTITION BY grp ORDER BY m) AS cum_urgent,
         SUM(oc) OVER (PARTITION BY grp ORDER BY m) AS cum_other
  FROM j
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(SUM(CASE WHEN cum_urgent > cum_other THEN 1 ELSE 0 END)
            AS BIGINT) AS months_urgent_ahead,
       CAST(MAX(cum_urgent) AS BIGINT) AS final_urgent_cents,
       CAST(MAX(cum_other) AS BIGINT) AS final_other_cents
FROM w
GROUP BY grp
"""

_RANKDELTA = """
WITH perf AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem
  WHERE l_partkey % 11 = 0
  GROUP BY l_partkey
),
best AS (
  SELECT l_partkey, cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS r
  FROM (SELECT * FROM perf ORDER BY cents DESC, l_partkey LIMIT 10) t
),
worst AS (
  SELECT l_partkey, cents,
         ROW_NUMBER() OVER (ORDER BY cents ASC, l_partkey) AS r
  FROM (SELECT * FROM perf ORDER BY cents ASC, l_partkey LIMIT 10) t
)
SELECT b.r AS rnk,
       b.l_partkey AS best_part, b.cents AS best_cents,
       w.l_partkey AS worst_part, w.cents AS worst_cents
FROM best b JOIN worst w ON b.r = w.r
"""

_TABLES = {
    "q_tpcds_cumwin": ("orders",),
    "q_tpcds_rankdelta": ("lineitem",),
}


def _run_sql(spark, sf_dir, name, sql):
    for t in _TABLES[name]:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("q_tpcds_cumwin", oracle=_CUMWIN)
def q_tpcds_cumwin(spark, sf_dir):
    """TPC-DS Q51 shape (fixture-adapted): urgent vs non-urgent
    monthly revenue series FULL OUTER joined per customer group, with
    the cumulative windows computed AFTER the join — a month present
    on only one side must still advance both running totals
    correctly. Exact cent integers end to end. The SAME SQL text is
    the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_cumwin", _CUMWIN)


@query("q_tpcds_rankdelta", oracle=_RANKDELTA)
def q_tpcds_rankdelta(spark, sf_dir):
    """TPC-DS Q44 shape (fixture-adapted): best and worst parts by
    exact revenue, the two opposite-order top-10s equi-joined on rank
    position. The rankings run over LIMIT-10 subqueries, so the
    unpartitioned window sees a constant 10 rows at any scale (the
    global sort itself is TopK via TakeOrderedAndProject). The SAME
    SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_rankdelta", _RANKDELTA)


_ROLLRANK = """
WITH r AS (
  SELECT n_name, o_orderpriority,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(GROUPING(n_name) AS BIGINT) AS g_nat,
         CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  GROUP BY ROLLUP(n_name, o_orderpriority)
)
SELECT COALESCE(n_name, '(all)') AS nation,
       COALESCE(o_orderpriority, '(all)') AS priority,
       cents,
       g_nat + g_pri AS lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY g_nat + g_pri,
                      CASE WHEN g_pri = 0 THEN n_name END
         ORDER BY cents DESC, COALESCE(n_name, ''),
                  COALESCE(o_orderpriority, '')
       ) AS BIGINT) AS rank_within_parent
FROM r
"""

_TABLES["q_tpcds_rollrank"] = ("orders", "customer", "nation")


@query("q_tpcds_rollrank", oracle=_ROLLRANK)
def q_tpcds_rollrank(spark, sf_dir):
    """TPC-DS Q36 shape (fixture-adapted): ROLLUP over
    (nation, priority) with GROUPING() markers, then RANK WITHIN
    PARENT — the window partitions by hierarchy level AND the parent
    key (CASE over the grouping flag), the interplay of grouping-set
    residues with window partitioning that no other query pins. Rank
    order is made total (cents, then names) so RANK is deterministic.
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_rollrank", _ROLLRANK)
