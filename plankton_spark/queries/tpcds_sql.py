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

from plankton_spark.io import read_table, table_view
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
        table_view(spark, sf_dir, t)
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


# ---------------------------------------------------------------------
# Round-9 suite: the TPC-DS signature shapes TPC-H never exercises
# (round-8 verdict #1) — multi-channel UNION fact reads, wide rollup +
# rank-in-hierarchy, channel INTERSECT, repeated-CTE reachability,
# ratio-comparison self-joins, channel/returns rollup report.
# ---------------------------------------------------------------------

_MULTICHANNEL = """
WITH freq_parts AS (
  SELECT l_partkey
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey
    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY l_partkey
  HAVING COUNT(DISTINCT o_orderkey) > 4
),
spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
best_customers AS (
  SELECT o_custkey FROM spend
  WHERE cents > (SELECT CAST(MAX(cents) / 4 AS BIGINT) FROM spend)
)
SELECT channel,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_sales,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM (
  SELECT 'returned' AS channel, l_extendedprice, o_orderdate
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey
    AND l_returnflag = 'R'
    AND l_partkey IN (SELECT l_partkey FROM freq_parts)
    AND o_custkey IN (SELECT o_custkey FROM best_customers)
  UNION ALL
  SELECT 'kept' AS channel, l_extendedprice, o_orderdate
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey
    AND l_returnflag <> 'R'
    AND l_partkey IN (SELECT l_partkey FROM freq_parts)
    AND o_custkey IN (SELECT o_custkey FROM best_customers)
) u
GROUP BY channel, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
"""

_TABLES["q_tpcds_multichannel"] = ("lineitem", "orders")


@query("q_tpcds_multichannel", oracle=_MULTICHANNEL)
def q_tpcds_multichannel(spark, sf_dir):
    """TPC-DS Q23 shape (fixture-adapted): two filter CTEs — frequent
    parts (HAVING COUNT(DISTINCT orders) over a 2-year slice) and best
    customers (spend above a scalar-subquery threshold of max/4) —
    each consumed TWICE across a UNION ALL of two channel fact reads
    (returned vs kept lineitems), then per-channel-per-year totals.
    Pins semi-join reuse of shared CTEs across union branches: at
    100 TB both IN-subqueries broadcast their distinct key sets, and
    the two fact scans are the only full passes. Exact cent integers;
    the SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_multichannel", _MULTICHANNEL)


_WIDEROLLUP = """
WITH s AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls, o_orderpriority AS pri,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus)
              + GROUPING(o_orderpriority)
              + GROUPING(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT))
              + GROUPING(CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT))
              AS BIGINT) AS lochierarchy
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey
  GROUP BY ROLLUP(l_returnflag, l_linestatus, o_orderpriority,
                  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT))
),
r AS (
  SELECT COALESCE(rf,'(all)') AS rf, COALESCE(ls,'(all)') AS ls,
         COALESCE(pri,'(all)') AS pri,
         COALESCE(yr,-1) AS yr, COALESCE(qtr,-1) AS qtr,
         cents, lochierarchy,
         CAST(RANK() OVER (
           PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0 THEN rf END
           ORDER BY cents DESC, COALESCE(rf,''), COALESCE(ls,''),
                    COALESCE(pri,''), COALESCE(yr,-1), COALESCE(qtr,-1)
         ) AS BIGINT) AS rk
  FROM s
)
SELECT * FROM r WHERE rk <= 5
"""

_TABLES["q_tpcds_widerollup"] = ("lineitem", "orders")


@query("q_tpcds_widerollup", oracle=_WIDEROLLUP)
def q_tpcds_widerollup(spark, sf_dir):
    """TPC-DS Q67 shape (fixture-adapted): 5-level ROLLUP
    (returnflag, linestatus, priority, year, quarter) with a summed
    GROUPING() hierarchy marker, then RANK within each hierarchy level
    partitioned by the top residue (CASE over lochierarchy), top-5 per
    partition. Rank order is total (cents + every residue) so RANK is
    deterministic. The rollup multiplies each input row into 6
    grouping sets — Spark expands then partial-aggregates map-side, so
    the shuffle carries group cells, not rows. The SAME SQL text is
    the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_widerollup", _WIDEROLLUP)


_CROSSITEMS = """
WITH cross_parts AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 45
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N' AND l_quantity >= 45
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45
),
chan AS (
  SELECT l_returnflag AS channel, p_brand,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem, part
  WHERE l_partkey = p_partkey
    AND l_partkey IN (SELECT l_partkey FROM cross_parts)
)
SELECT COALESCE(channel, '(all)') AS channel,
       COALESCE(p_brand, '(all)') AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_sales,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM chan
GROUP BY ROLLUP(channel, p_brand)
"""

_TABLES["q_tpcds_crossitems"] = ("lineitem", "part")


@query("q_tpcds_crossitems", oracle=_CROSSITEMS)
def q_tpcds_crossitems(spark, sf_dir):
    """TPC-DS Q14 shape (fixture-adapted): cross_parts = parts with a
    high-quantity sale in ALL THREE channels (two stacked INTERSECTs —
    Spark plans left-semi joins with distinct on both sides), then a
    channel × brand ROLLUP over only those parts. The IN-subquery
    against the intersected key set broadcasts at any scale (it only
    shrinks as predicates tighten). The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_crossitems", _CROSSITEMS)


_MULTIWH = """
WITH multi AS (
  SELECT DISTINCT l1.l_orderkey
  FROM lineitem l1, lineitem l2
  WHERE l1.l_orderkey = l2.l_orderkey
    AND l1.l_suppkey <> l2.l_suppkey
)
SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  AND o_orderkey IN (SELECT l_orderkey FROM multi)
  AND o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_orderkey IN (SELECT l_orderkey FROM multi)
  )
"""

_TABLES["q_tpcds_multiwh"] = ("lineitem", "orders")


@query("q_tpcds_multiwh", oracle=_MULTIWH)
def q_tpcds_multiwh(spark, sf_dir):
    """TPC-DS Q95 shape (fixture-adapted): the multi-supplier-order
    CTE (lineitem self-join on orderkey with supplier inequality) is
    referenced TWICE — once as a direct semi-join on orders, once
    nested inside the returned-lineitem semi-join — the
    repeated-subquery-materialization signature. The self-join is
    per-order bounded (≤7 lineitems/order at every SF, so the join
    fans out ≤49 rows per order, linear overall). The SAME SQL text is
    the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_multiwh", _MULTIWH)


_QOQ = """
WITH urgent AS (
  SELECT n_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY n_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT)
),
std AS (
  SELECT n_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY n_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT)
)
SELECT u1.n_name AS nation,
       ROUND(CAST(u2.cents AS DOUBLE) / u1.cents, 6) AS urgent_g12,
       ROUND(CAST(u3.cents AS DOUBLE) / u2.cents, 6) AS urgent_g23,
       ROUND(CAST(s2.cents AS DOUBLE) / s1.cents, 6) AS std_g12,
       ROUND(CAST(s3.cents AS DOUBLE) / s2.cents, 6) AS std_g23,
       CASE WHEN CAST(u2.cents AS DECIMAL(19,0)) * CAST(s1.cents AS DECIMAL(19,0))
                 > CAST(s2.cents AS DECIMAL(19,0)) * CAST(u1.cents AS DECIMAL(19,0))
            THEN 1 ELSE 0 END AS urgent_faster_q2,
       CASE WHEN CAST(u3.cents AS DECIMAL(19,0)) * CAST(s2.cents AS DECIMAL(19,0))
                 > CAST(s3.cents AS DECIMAL(19,0)) * CAST(u2.cents AS DECIMAL(19,0))
            THEN 1 ELSE 0 END AS urgent_faster_q3
FROM urgent u1, urgent u2, urgent u3, std s1, std s2, std s3
WHERE u1.n_name = u2.n_name AND u2.n_name = u3.n_name
  AND u1.n_name = s1.n_name AND s1.n_name = s2.n_name AND s2.n_name = s3.n_name
  AND u1.qtr = 1 AND u2.qtr = 2 AND u3.qtr = 3
  AND s1.qtr = 1 AND s2.qtr = 2 AND s3.qtr = 3
"""

_TABLES["q_tpcds_qoq"] = ("orders", "customer", "nation")


@query("q_tpcds_qoq", oracle=_QOQ)
def q_tpcds_qoq(spark, sf_dir):
    """TPC-DS Q31 shape (fixture-adapted): two aggregate series
    (urgent vs standard priority, per nation per quarter), each CTE
    self-joined THREE ways on consecutive quarters, comparing
    quarter-over-quarter growth between the series. Growth ratios are
    emitted as rounded doubles (identical bigint operands divide
    bit-identically on both engines); the faster-growth FLAGS compare
    exactly via DECIMAL(38,0) cross-multiplication — a bigint*bigint
    product overflows at sf>=0.1, so the predicate must never run in
    long arithmetic. Six aliases of two tiny aggregates: all broadcast
    joins at any scale. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_qoq", _QOQ)


_CHANROLLUP = """
WITH sales AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'express'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
              ELSE 'economy' END AS channel,
         n_name,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS sale_cents,
         CASE WHEN l_returnflag = 'R'
              THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS return_cents
  FROM lineitem, orders, customer, nation
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n_nationkey
)
SELECT COALESCE(channel, '(all)') AS channel,
       COALESCE(n_name, '(all)') AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(sale_cents) AS BIGINT) AS sales_cents,
       CAST(SUM(return_cents) AS BIGINT) AS returns_cents,
       CAST(SUM(sale_cents) - SUM(return_cents) AS BIGINT) AS net_cents
FROM sales
GROUP BY ROLLUP(channel, n_name)
"""

_TABLES["q_tpcds_chanrollup"] = ("lineitem", "orders", "customer", "nation")


@query("q_tpcds_chanrollup", oracle=_CHANROLLUP)
def q_tpcds_chanrollup(spark, sf_dir):
    """TPC-DS Q77 shape (fixture-adapted): the cross-channel
    sales-and-returns report — channel derived from order priority,
    returns folded in as a conditional column (sales and returns from
    ONE fact pass, where DS reads separate return tables), ROLLUP over
    (channel, nation) with grand totals. One scan, one rollup shuffle;
    nation/customer dims broadcast. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chanrollup", _CHANROLLUP)


_TIMEBANDS = """
SELECT * FROM
 (SELECT CAST(COUNT(*) AS BIGINT) AS band1 FROM lineitem WHERE l_quantity >= 1  AND l_quantity < 10 AND l_returnflag = 'A') b1,
 (SELECT CAST(COUNT(*) AS BIGINT) AS band2 FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20 AND l_returnflag = 'A') b2,
 (SELECT CAST(COUNT(*) AS BIGINT) AS band3 FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 30 AND l_returnflag = 'A') b3,
 (SELECT CAST(COUNT(*) AS BIGINT) AS band4 FROM lineitem WHERE l_quantity >= 30 AND l_quantity < 40 AND l_returnflag = 'A') b4,
 (SELECT CAST(COUNT(*) AS BIGINT) AS band5 FROM lineitem WHERE l_quantity >= 40 AND l_quantity < 50 AND l_returnflag = 'A') b5,
 (SELECT CAST(COUNT(*) AS BIGINT) AS band6 FROM lineitem WHERE l_quantity >= 50                    AND l_returnflag = 'A') b6
"""


@query("q_tpcds_timebands", oracle=_TIMEBANDS)
def q_tpcds_timebands(spark, sf_dir):
    """TPC-DS Q88 shape (fixture-adapted): N independent band-count
    scalar subqueries over the same fact, cross-joined into one row.
    The ORACLE is the literal 6-subquery text (DuckDB runs 6 scans);
    the SPARK side is the plan you actually want at 100 TB — ONE scan
    with 6 conditional counts (`SUM(CASE WHEN band THEN 1)`), because
    the subqueries differ only in their predicate and Catalyst cannot
    fuse disjoint-filter scalar subqueries itself. 6x less IO by
    construction; identical single row by the gate's hash."""
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "A"
    )
    q = F.col("l_quantity")
    bands = {
        "band1": (q >= 1) & (q < 10),
        "band2": (q >= 10) & (q < 20),
        "band3": (q >= 20) & (q < 30),
        "band4": (q >= 30) & (q < 40),
        "band5": (q >= 40) & (q < 50),
        "band6": q >= 50,
    }
    return li.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in bands.items()
        ]
    )


_CHANRATIO = """
WITH ret AS (
  SELECT o_custkey AS ck, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
),
kept AS (
  SELECT o_custkey AS ck, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey AND l_returnflag <> 'R'
  GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT k.ck AS custkey, k.yr AS yr,
       k.cents AS kept_cents, k.qty AS kept_qty,
       COALESCE(r.cents, 0) AS ret_cents,
       ROUND(CAST(COALESCE(r.cents, 0) AS DOUBLE) / k.cents, 6) AS ret_ratio
FROM kept k LEFT JOIN ret r ON k.ck = r.ck AND k.yr = r.yr
WHERE k.cents > 50000000
"""

_TABLES["q_tpcds_chanratio"] = ("lineitem", "orders")


@query("q_tpcds_chanratio", oracle=_CHANRATIO)
def q_tpcds_chanratio(spark, sf_dir):
    """TPC-DS Q78 shape (fixture-adapted): per-(customer, year)
    aggregates in two channels, LEFT-joined so customers absent from
    the returns channel survive with COALESCE(0) — the null-channel
    handling + cross-channel ratio that Q78 pins. Ratio = double
    division of identical exact bigints, rounded (bit-identical on
    both engines); the join keys carry the shuffle (no skew: customer
    x year). The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chanratio", _CHANRATIO)


_YOY = """
WITH year_total AS (
  SELECT o_custkey AS ck,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'express'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
              ELSE 'economy' END AS channel,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY o_custkey,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'express'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                ELSE 'economy' END,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT e1.ck AS custkey,
       e1.cents AS express_y1, e2.cents AS express_y2,
       s1.cents AS standard_y1, s2.cents AS standard_y2,
       ROUND(CAST(e2.cents AS DOUBLE) / e1.cents, 6) AS express_growth,
       ROUND(CAST(s2.cents AS DOUBLE) / s1.cents, 6) AS standard_growth
FROM year_total e1, year_total e2, year_total s1, year_total s2
WHERE e1.ck = e2.ck AND e1.ck = s1.ck AND s1.ck = s2.ck
  AND e1.channel = 'express' AND e2.channel = 'express'
  AND s1.channel = 'standard' AND s2.channel = 'standard'
  AND e1.yr = 1996 AND e2.yr = 1997
  AND s1.yr = 1996 AND s2.yr = 1997
  AND CAST(e2.cents AS DECIMAL(19,0)) * CAST(s1.cents AS DECIMAL(19,0))
      > CAST(s2.cents AS DECIMAL(19,0)) * CAST(e1.cents AS DECIMAL(19,0))
"""

_TABLES["q_tpcds_yoy"] = ("orders",)


@query("q_tpcds_yoy", oracle=_YOY)
def q_tpcds_yoy(spark, sf_dir):
    """TPC-DS Q4 shape (fixture-adapted): ONE `year_total` CTE
    referenced FOUR times (per customer × channel × year), self-joined
    on customer across (channel, year) slices, keeping customers whose
    express channel grew strictly faster year-over-year than their
    standard channel — Q4's single-CTE-many-consumers signature
    (where Q31/q_tpcds_qoq uses two CTEs and quarters). The growth
    comparison cross-multiplies in DECIMAL(38,0) — exact, and immune
    to the bigint overflow a cents product hits at sf≥0.1. At scale:
    year_total is one fact aggregate (customer-grain, skew-free), the
    four consumers are shuffle-reused equi-joins on ck. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_yoy", _YOY)


# ---------------------------------------------------------------------
# Round-10 suite, second tranche (round-9 verdict #4): the remaining
# TPC-DS signature shapes — the Q64 two-cycle mega self-join, Q47/Q57
# moving-average deviation with partition-crossing neighbors, Q35/Q10
# disjunctive-EXISTS demographics, Q93 returns-adjusted net sales.
# Same one-SQL-text contract: the text below runs verbatim on Spark
# and as its own DuckDB oracle; money is exact cent integers.
# ---------------------------------------------------------------------

_MEGAJOIN = """
WITH sales AS (
  SELECT c_custkey, p_partkey, p_brand, n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem, orders, customer, nation, part
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n_nationkey AND l_partkey = p_partkey
    AND o_orderdate >= DATE '1995-01-01'
    AND o_orderdate < DATE '1997-01-01'
  GROUP BY c_custkey, p_partkey, p_brand, n_name,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT s1.n_name AS nation, s1.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_repeat_pairs,
       CAST(SUM(s1.cents) AS BIGINT) AS cents_y1,
       CAST(SUM(s2.cents) AS BIGINT) AS cents_y2,
       CAST(SUM(s2.qty - s1.qty) AS BIGINT) AS qty_delta
FROM sales s1
JOIN sales s2
  ON s1.c_custkey = s2.c_custkey AND s1.p_partkey = s2.p_partkey
WHERE s1.yr = 1995 AND s2.yr = 1996
GROUP BY s1.n_name, s1.p_brand
"""

_TABLES["q_tpcds_megajoin"] = (
    "lineitem", "orders", "customer", "nation", "part",
)


@query("q_tpcds_megajoin", oracle=_MEGAJOIN)
def q_tpcds_megajoin(spark, sf_dir):
    """TPC-DS Q64 shape (fixture-adapted): ONE five-table sales CTE
    (fact + three dims, per customer x part x brand x year) consumed TWICE and
    self-joined across two sale cycles on (customer, part) — the
    repeat-purchase mega-join that stresses CTE reuse + join planning
    harder than any TPC-H query. Scale shape: the cycle self-join is
    an equi-join on (c_custkey, p_partkey) — shuffle-hash/SMJ
    partitionable, dims broadcast inside the CTE, and the year filter
    cuts each side before the join. Exact cent/qty integers; the SAME
    SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_megajoin", _MEGAJOIN)


_MOVINGAVG = """
WITH v1 AS (
  SELECT n_name,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(SUM(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)))
              OVER (PARTITION BY n_name) AS BIGINT) AS tot_cents,
         CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT)
           AS n_months,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY n_name
           ORDER BY CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
         ) AS BIGINT) AS rn
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
  GROUP BY n_name, CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
)
SELECT v.n_name AS nation, v.m AS mth, v.cents,
       v_lag.cents AS prev_cents, v_lead.cents AS next_cents,
       CAST(v.cents * v.n_months - v.tot_cents AS BIGINT)
         AS dev_scaled
FROM v1 v
JOIN v1 v_lag
  ON v.n_name = v_lag.n_name AND v.rn = v_lag.rn + 1
JOIN v1 v_lead
  ON v.n_name = v_lead.n_name AND v.rn = v_lead.rn - 1
WHERE v.cents * v.n_months * 10 > v.tot_cents * 11
   OR v.cents * v.n_months * 10 < v.tot_cents * 9
"""

_TABLES["q_tpcds_movingavg"] = ("orders", "customer", "nation")


@query("q_tpcds_movingavg", oracle=_MOVINGAVG)
def q_tpcds_movingavg(spark, sf_dir):
    """TPC-DS Q47/Q57 shape (fixture-adapted): monthly series per
    nation with the partition mean and a sequence number computed as
    windows INSIDE the CTE, then the CTE self-joined TWICE on rn +/- 1
    to attach each deviating month's neighbors — the
    lag-via-self-join idiom Q47 uses so the neighbors can come from a
    DIFFERENT filter context than the anchor row. The >10% deviation
    test is integer cross-multiplied (cents * n * 10 vs tot * 11) —
    no division, exact on both engines. Scale shape: windows
    partition by nation (parallel), the self-joins are equi-joins on
    (nation, rn). The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_movingavg", _MOVINGAVG)


_MULTIEXISTS = """
SELECT n_name AS nation, c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acctbal_cents,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
FROM customer, nation
WHERE c_nationkey = n_nationkey
  AND EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
  )
  AND (
    EXISTS (
      SELECT 1 FROM orders o, lineitem
      WHERE l_orderkey = o.o_orderkey AND o.o_custkey = c_custkey
        AND l_returnflag = 'R'
    )
    OR EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 200000
    )
  )
GROUP BY n_name, c_mktsegment
"""

_TABLES["q_tpcds_multiexists"] = (
    "customer", "nation", "orders", "lineitem",
)


@query("q_tpcds_multiexists", oracle=_MULTIEXISTS)
def q_tpcds_multiexists(spark, sf_dir):
    """TPC-DS Q35/Q10 shape (fixture-adapted): customer demographics
    gated by one mandatory EXISTS (active in the window) AND a
    DISJUNCTION of two more correlated EXISTS (returned something OR
    placed a big-ticket order) — the disjunctive-subquery
    decorrelation that TPC-H's Q21/Q22 (conjunctive-only) never
    exercises. Spark plans each EXISTS as a semi-join and the OR as a
    union of semi-join keys — all equi-joins on c_custkey, no
    nested-loop re-execution. Exact cent integers; the SAME SQL text
    is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_multiexists", _MULTIEXISTS)


_RETURNSNET = """
WITH r AS (
  SELECT l_orderkey AS r_orderkey, l_partkey AS r_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_qty
  FROM lineitem
  WHERE l_returnflag = 'R'
  GROUP BY l_orderkey, l_partkey
),
net AS (
  SELECT o_custkey,
         CAST(SUM((CAST(l_quantity AS BIGINT) - COALESCE(r.ret_qty, 0))
              * CAST(ROUND(l_extendedprice * 100 /
                           CAST(l_quantity AS BIGINT)) AS BIGINT))
              AS BIGINT) AS net_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  LEFT JOIN r ON r.r_orderkey = l_orderkey AND r.r_partkey = l_partkey
  WHERE l_returnflag <> 'R'
  GROUP BY o_custkey
)
SELECT o_custkey AS custkey, net_cents
FROM net
ORDER BY net_cents, custkey
LIMIT 20
"""

_TABLES["q_tpcds_returnsnet"] = ("lineitem", "orders")


@query("q_tpcds_returnsnet", oracle=_RETURNSNET)
def q_tpcds_returnsnet(spark, sf_dir):
    """TPC-DS Q93 shape (fixture-adapted): returns-adjusted net sales
    — the sales fact LEFT-joined to a returns side (fixture: 'R'
    lineitems aggregated per (order, part)), each sale's quantity
    reduced by the matched return before pricing, summed per
    customer, lowest-net customers first (total order: net then key,
    so the LIMIT is deterministic). Unit price derives as exact
    rounded cents-per-unit so both engines do identical integer
    arithmetic. Scale shape: the LEFT join is an equi-join on
    (orderkey, partkey) co-partitionable with the fact scan; the
    final LIMIT is TopK (TakeOrderedAndProject), not a global sort.
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_returnsnet", _RETURNSNET)


_FREQBUYER = """
WITH freq_parts AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey HAVING COUNT(*) >= 8
),
spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
best_cust AS (
  SELECT o_custkey FROM spend
  WHERE cents * 2 > (SELECT MAX(cents) FROM spend)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT l_partkey FROM freq_parts)
  AND o_custkey IN (SELECT o_custkey FROM best_cust)
"""

_TABLES["q_tpcds_freqbuyer"] = ("lineitem", "orders")


@query("q_tpcds_freqbuyer", oracle=_FREQBUYER)
def q_tpcds_freqbuyer(spark, sf_dir):
    """TPC-DS Q23 shape (fixture-adapted): sales restricted to
    FREQUENT items AND BEST customers — one HAVING-filtered item CTE,
    one spend CTE whose top band is defined against a SCALAR MAX
    subquery over the SAME CTE (the twice-consumed-aggregate +
    scalar-threshold signature), both applied as IN semi-joins on the
    fact. The 50%-of-max band is integer cross-multiplied (cents * 2 >
    max), exact on both engines. Scale shape: both CTEs are
    partial-aggregatable group-bys; the scalar MAX is a 1-row
    broadcast; the semi-joins are equi-joins. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_freqbuyer", _FREQBUYER)


_MULTISHIP = """
WITH ms AS (
  SELECT DISTINCT l1.l_orderkey
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-07-01'
  AND o_orderkey IN (SELECT l_orderkey FROM ms)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem r
    WHERE r.l_orderkey = o_orderkey AND r.l_returnflag = 'R'
  )
"""

_TABLES["q_tpcds_multiship"] = ("lineitem", "orders")


@query("q_tpcds_multiship", oracle=_MULTISHIP)
def q_tpcds_multiship(spark, sf_dir):
    """TPC-DS Q95 shape (fixture-adapted): orders shipped by MORE THAN
    ONE supplier (the fact self-joined on order key with a supplier
    inequality — Q95's ws_wh idiom) and with NO returns (correlated
    NOT EXISTS on the same fact) inside a date window. Scale shape:
    the self-join is an equi-join on l_orderkey (per-order line
    counts are small constants, so the pair blow-up is bounded);
    the DISTINCT collapses before the semi-join; NOT EXISTS plans as
    an anti-join. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_multiship", _MULTISHIP)


_INVCHAIN = """
WITH demand AS (
  SELECT l.l_partkey AS pk, l.l_quantity AS qty,
         o.o_orderdate AS od, l.l_shipdate AS sd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= DATE '1996-03-01'
    AND o.o_orderdate < DATE '1996-06-01'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 5 DAY
)
SELECT p.p_brand AS brand,
       CAST(EXTRACT(WEEK FROM d.od) AS BIGINT) AS wk,
       CAST(COUNT(*) AS BIGINT) AS n_shortages,
       CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS no_flag,
       CAST(SUM(CASE WHEN s.s_suppkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS flagged
FROM demand d
JOIN lineitem inv
  ON inv.l_partkey = d.pk
 AND inv.l_quantity < d.qty
 AND CAST(EXTRACT(WEEK FROM inv.l_shipdate) AS BIGINT)
     = CAST(EXTRACT(WEEK FROM d.od) AS BIGINT)
 AND EXTRACT(YEAR FROM inv.l_shipdate) = EXTRACT(YEAR FROM d.od)
JOIN part p ON d.pk = p.p_partkey
LEFT JOIN supplier s
  ON inv.l_suppkey = s.s_suppkey AND s.s_acctbal < 0
GROUP BY p.p_brand, CAST(EXTRACT(WEEK FROM d.od) AS BIGINT)
"""

_TABLES["q_tpcds_invchain"] = ("lineitem", "orders", "part", "supplier")


@query("q_tpcds_invchain", oracle=_INVCHAIN)
def q_tpcds_invchain(spark, sf_dir):
    """TPC-DS Q72 shape (fixture-adapted): the inventory mega-join
    with date-chain propagation — demanded lines joined to same-part
    'inventory' lines on a QUANTITY INEQUALITY plus a derived
    week-of-year equality between the two date columns (Q72's
    d1.d_week_seq = d2.d_week_seq), the sale→ship date-offset chain
    (l_shipdate > o_orderdate + 5 days, Q72's d3.d_date > d1.d_date + 5),
    and a conditional LEFT OUTER dim join whose null bucket is
    counted separately (Q72's promotion split). Scale shape: the
    inequality rides a (part, week, year) EQUI join (Catalyst keys
    on the derived expressions — no cartesian), dims broadcast, and
    the date window prunes the demand side before the shuffle. The
    SAME SQL text is the oracle. Week extraction stays inside
    mid-year dates so ISO week-year boundary semantics never
    diverge between engines."""
    return _run_sql(spark, sf_dir, "q_tpcds_invchain", _INVCHAIN)


_CUSTDEV = """
WITH ret AS (
  SELECT c.c_nationkey AS nk, c.c_custkey AS ck,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS amt
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_returnflag = 'R'
  GROUP BY c.c_nationkey, c.c_custkey
)
SELECT r1.ck AS custkey, r1.nk AS nationkey, r1.amt AS ret_cents
FROM ret r1
WHERE r1.amt * 10 * (SELECT COUNT(*) FROM ret r2 WHERE r2.nk = r1.nk)
      > 12 * (SELECT SUM(r3.amt) FROM ret r3 WHERE r3.nk = r1.nk)
ORDER BY r1.amt DESC, r1.ck
LIMIT 25
"""

_TABLES["q_tpcds_custdev"] = ("lineitem", "orders", "customer")


@query("q_tpcds_custdev", oracle=_CUSTDEV)
def q_tpcds_custdev(spark, sf_dir):
    """TPC-DS Q30/Q1 shape (fixture-adapted): customers whose total
    returns exceed 1.2x their nation's average — the signature is
    ONE CTE referenced three times, twice through CORRELATED scalar
    subqueries (Catalyst decorrelates both into per-nation aggregate
    joins; DuckDB does the same), with the 1.2x threshold expressed
    as an exact integer cross-multiplication (amt*10*n > 12*sum) so
    no float average ever materializes. Deterministic total order +
    LIMIT 25 (amt DESC, custkey tiebreak). The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_custdev", _CUSTDEV)


_CHANRANK = """
WITH base AS (
  SELECT CASE WHEN l_linenumber % 3 = 0 THEN 'web'
              WHEN l_linenumber % 3 = 1 THEN 'catalog'
              ELSE 'store' END AS channel,
         l_partkey AS item,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(ROUND(l_quantity) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ret_qty,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS tot_qty,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ret_cents,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS tot_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1997-01-01'
  GROUP BY CASE WHEN l_linenumber % 3 = 0 THEN 'web'
                WHEN l_linenumber % 3 = 1 THEN 'catalog'
                ELSE 'store' END,
           l_partkey
),
ranked AS (
  SELECT channel, item, ret_qty, tot_qty,
         RANK() OVER (PARTITION BY channel
                      ORDER BY CAST(ret_qty AS DOUBLE) / tot_qty DESC,
                               item) AS qty_rank,
         RANK() OVER (PARTITION BY channel
                      ORDER BY CAST(ret_cents AS DOUBLE) / tot_cents DESC,
                               item) AS amt_rank
  FROM base
)
SELECT channel, item, ret_qty, tot_qty,
       CAST(qty_rank AS BIGINT) AS qty_rank,
       CAST(amt_rank AS BIGINT) AS amt_rank
FROM ranked
WHERE qty_rank <= 10 OR amt_rank <= 10
"""

_TABLES["q_tpcds_chanrank"] = ("lineitem",)


@query("q_tpcds_chanrank", oracle=_CHANRANK)
def q_tpcds_chanrank(spark, sf_dir):
    """TPC-DS Q49 shape (fixture-adapted): per-channel
    worst-return-ratio rank lists — each channel's items ranked by
    BOTH the quantity return ratio and the currency return ratio,
    keeping rows in either top-10 (Q49's `return_rank <= 10 OR
    currency_rank <= 10`). Q49 writes this as a UNION of three
    per-channel selects; the scale-right expression is ONE pass with
    PARTITION BY channel windows — same result set, one shuffle
    instead of three scans. Ratios order as IEEE doubles of exact
    integers (identical across engines) with an item tiebreak, so
    ranks are deterministic; emitted columns stay integer-exact.
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chanrank", _CHANRANK)


_BANDBUYERS = """
WITH dn AS (
  SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 5 AND 7
)
SELECT c.c_mktsegment AS segment, dn.cnt AS lines_per_order,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_buyers,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM dn
JOIN orders o ON dn.ok = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY c.c_mktsegment, dn.cnt
"""

_TABLES["q_tpcds_bandbuyers"] = ("lineitem", "orders", "customer")


@query("q_tpcds_bandbuyers", oracle=_BANDBUYERS)
def q_tpcds_bandbuyers(spark, sf_dir):
    """TPC-DS Q34/Q73 shape (fixture-adapted): GROUP-HAVING BAND
    membership — the inner aggregate counts lines per order and keeps
    only orders inside the [5, 7] band (Q34's `cnt BETWEEN 15 AND
    20`), then joins out to the customer dimension and re-aggregates
    per (segment, band value) with a distinct-buyer count. Scale
    shape: the band HAVING collapses the fact BEFORE any join
    (map-side combinable count per order key), the date filter prunes
    orders at the scan, and the dim join broadcasts. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_bandbuyers", _BANDBUYERS)


_CHANBAND = """
WITH base AS (
  SELECT CASE WHEN l_linenumber % 3 = 0 THEN 'web'
              WHEN l_linenumber % 3 = 1 THEN 'catalog'
              ELSE 'store' END AS channel,
         l_partkey AS item,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-07-01'
),
per AS (
  SELECT item,
         CAST(SUM(CASE WHEN channel = 'web' THEN cents ELSE 0 END)
              AS BIGINT) AS web_cents,
         CAST(SUM(CASE WHEN channel = 'catalog' THEN cents ELSE 0 END)
              AS BIGINT) AS cat_cents,
         CAST(SUM(CASE WHEN channel = 'store' THEN cents ELSE 0 END)
              AS BIGINT) AS store_cents
  FROM base GROUP BY item
  HAVING SUM(CASE WHEN channel = 'web' THEN cents ELSE 0 END) > 0
     AND SUM(CASE WHEN channel = 'catalog' THEN cents ELSE 0 END) > 0
     AND SUM(CASE WHEN channel = 'store' THEN cents ELSE 0 END) > 0
)
SELECT item, web_cents, cat_cents, store_cents,
       web_cents + cat_cents + store_cents AS total_cents
FROM per
WHERE 30 * web_cents   BETWEEN 9 * (web_cents + cat_cents + store_cents)
                           AND 11 * (web_cents + cat_cents + store_cents)
  AND 30 * cat_cents   BETWEEN 9 * (web_cents + cat_cents + store_cents)
                           AND 11 * (web_cents + cat_cents + store_cents)
  AND 30 * store_cents BETWEEN 9 * (web_cents + cat_cents + store_cents)
                           AND 11 * (web_cents + cat_cents + store_cents)
"""

_TABLES["q_tpcds_chanband"] = ("lineitem",)


@query("q_tpcds_chanband", oracle=_CHANBAND)
def q_tpcds_chanband(spark, sf_dir):
    """TPC-DS Q58 shape (fixture-adapted): items selling EVENLY across
    all three channels — each channel's revenue within ±10% of the
    item's cross-channel average. Q58 writes three per-channel CTEs
    joined on item with six ratio predicates; the scale-right
    expression is ONE conditional-aggregation pass per item (no
    three-way self-join at all) with the band as exact integer
    cross-multiplications (30·chan BETWEEN 9·total AND 11·total ⇔
    chan/avg ∈ [0.9, 1.1]) — no float ratio ever materializes. The
    SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chanband", _CHANBAND)


_GROWTHCMP = """
WITH sales AS (
  SELECT n.n_name AS nation,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'web' ELSE 'store' END AS channel,
         CAST(EXTRACT(QUARTER FROM o.o_orderdate) AS BIGINT) AS q,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '1996-07-01'
),
per AS (
  SELECT nation, channel, q, CAST(SUM(cents) AS BIGINT) AS cents
  FROM sales GROUP BY nation, channel, q
),
wide AS (
  SELECT nation,
         CAST(SUM(CASE WHEN channel = 'web' AND q = 1
                  THEN cents ELSE 0 END) AS BIGINT) AS w1,
         CAST(SUM(CASE WHEN channel = 'web' AND q = 2
                  THEN cents ELSE 0 END) AS BIGINT) AS w2,
         CAST(SUM(CASE WHEN channel = 'store' AND q = 1
                  THEN cents ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN channel = 'store' AND q = 2
                  THEN cents ELSE 0 END) AS BIGINT) AS s2
  FROM per GROUP BY nation
  HAVING SUM(CASE WHEN channel = 'web' AND q = 1 THEN cents ELSE 0 END) > 0
     AND SUM(CASE WHEN channel = 'store' AND q = 1 THEN cents ELSE 0 END) > 0
)
SELECT nation, w1, w2, s1, s2
FROM wide
WHERE CAST(w2 AS DECIMAL(38,0)) * s1 > CAST(s2 AS DECIMAL(38,0)) * w1
"""

_TABLES["q_tpcds_growthcmp"] = ("orders", "customer", "nation")


@query("q_tpcds_growthcmp", oracle=_GROWTHCMP)
def q_tpcds_growthcmp(spark, sf_dir):
    """TPC-DS Q31 shape (fixture-adapted): regions where the WEB
    channel's quarter-over-quarter growth beat the STORE channel's —
    Q31 joins six per-(county, quarter) CTEs and compares growth
    RATIOS; here both channels' Q1/Q2 series pivot out of ONE
    aggregate pass and the ratio comparison is the exact integer
    cross-product (w2/w1 > s2/s1 ⇔ w2·s1 > s2·w1 for positive
    denominators, enforced by the HAVING) — no division, no float
    drift. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_growthcmp", _GROWTHCMP)


_CHANSETS = """
WITH urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
high AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
),
med AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'
),
all3 AS (
  SELECT o_custkey FROM urgent
  INTERSECT
  SELECT o_custkey FROM high
  INTERSECT
  SELECT o_custkey FROM med
),
only_u AS (
  SELECT o_custkey FROM urgent
  EXCEPT
  SELECT o_custkey FROM high
  EXCEPT
  SELECT o_custkey FROM med
)
SELECT (SELECT COUNT(*) FROM all3) AS n_all_channels,
       (SELECT CAST(SUM(o_custkey) AS BIGINT) FROM all3) AS ck_sum_all,
       (SELECT COUNT(*) FROM only_u) AS n_urgent_only,
       (SELECT CAST(SUM(o_custkey) AS BIGINT) FROM only_u)
         AS ck_sum_urgent_only
"""
_TABLES["q_tpcds_chansets"] = ("orders",)


@query("q_tpcds_chansets", oracle=_CHANSETS)
def q_tpcds_chansets(spark, sf_dir):
    """TPC-DS Q38 + Q87 shape (fixture-adapted): customers present in
    ALL three channels via chained INTERSECT (Q38's signature) and
    customers EXCLUSIVE to one channel via chained EXCEPT (Q87's),
    the four scalar counts attached in one row. At scale: each
    channel side is a DISTINCT hash agg at customer grain; INTERSECT/
    EXCEPT compile to key-partitioned set-op joins (no row blowup —
    both operands are already distinct). The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chansets", _CHANSETS)


_WIDECOND = """
WITH src AS (
  SELECT l_suppkey % 25 AS whg,
         CASE WHEN l_linenumber % 2 = 0 THEN 'air'
              ELSE 'ground' END AS carrier,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS m,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
),
air AS (
  SELECT whg, 'air' AS carrier,
         SUM(CASE WHEN m <= 3 THEN cents ELSE 0 END) AS q1_cents,
         SUM(CASE WHEN m BETWEEN 4 AND 6 THEN cents ELSE 0 END) AS q2_cents,
         SUM(CASE WHEN m BETWEEN 7 AND 9 THEN cents ELSE 0 END) AS q3_cents,
         SUM(CASE WHEN m >= 10 THEN cents ELSE 0 END) AS q4_cents
  FROM src WHERE carrier = 'air' GROUP BY whg
),
ground AS (
  SELECT whg, 'ground' AS carrier,
         SUM(CASE WHEN m <= 3 THEN cents ELSE 0 END) AS q1_cents,
         SUM(CASE WHEN m BETWEEN 4 AND 6 THEN cents ELSE 0 END) AS q2_cents,
         SUM(CASE WHEN m BETWEEN 7 AND 9 THEN cents ELSE 0 END) AS q3_cents,
         SUM(CASE WHEN m >= 10 THEN cents ELSE 0 END) AS q4_cents
  FROM src WHERE carrier = 'ground' GROUP BY whg
),
u AS (SELECT * FROM air UNION ALL SELECT * FROM ground)
SELECT whg,
       COUNT(*) AS n_carriers,
       CAST(SUM(q1_cents) AS BIGINT) AS q1_cents,
       CAST(SUM(q2_cents) AS BIGINT) AS q2_cents,
       CAST(SUM(q3_cents) AS BIGINT) AS q3_cents,
       CAST(SUM(q4_cents) AS BIGINT) AS q4_cents
FROM u GROUP BY whg
"""
_TABLES["q_tpcds_widecond"] = ("lineitem",)


@query("q_tpcds_widecond", oracle=_WIDECOND)
def q_tpcds_widecond(spark, sf_dir):
    """TPC-DS Q66 shape (fixture-adapted): per-warehouse-group WIDE
    CONDITIONAL aggregation — each carrier branch (fixture split:
    l_linenumber parity, standing in for Q66's ship-mode carriers)
    pivots the year into per-quarter revenue columns via CASE sums,
    the branches UNION ALL, and an outer re-aggregation folds them
    per warehouse (Q66's two-subquery-union-reagg signature,
    quarters standing in for its 12 month columns). At scale: both branches are partial-
    combinable hash aggs over ONE scan range with the pivot done by
    expression (no pivot shuffle), the re-agg touches wh-group-grain
    rows only. Exact cents end-to-end. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_widecond", _WIDECOND)


_REVBANDS = """
WITH rev AS (
  SELECT o_custkey AS ck,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT ck,
         CAST((cents - (cents % 5000000)) / 5000000 AS BIGINT) AS segment
  FROM rev
)
SELECT segment,
       COUNT(*) AS n_customers,
       CAST(SUM(ck) AS BIGINT) AS ck_checksum
FROM seg GROUP BY segment HAVING COUNT(*) > 1
"""
_TABLES["q_tpcds_revbands"] = ("orders",)


@query("q_tpcds_revbands", oracle=_REVBANDS)
def q_tpcds_revbands(spark, sf_dir):
    """TPC-DS Q54 shape (fixture-adapted): customer lifetime revenue
    segmented into $50k bands and histogrammed (Q54's revenue-segment
    COUNT signature). The band index derives by exact integer
    arithmetic — (cents - cents % width) / width is an
    exactly-representable integer-valued division in BOTH engines,
    where a bare bigint '/' returns an engine-specific type and
    FLOOR(double) invites boundary drift. At scale: one customer-
    grain hash agg, then a segment-grain re-agg (hundreds of
    groups). The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_revbands", _REVBANDS)


_SHIPRATIO = """
WITH s AS (
  SELECT l_suppkey AS sk,
         SUM(CASE WHEN l_shipdate < DATE '1996-07-01'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS q_before,
         SUM(CASE WHEN l_shipdate >= DATE '1996-07-01'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS q_after
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey
),
banded AS (
  SELECT sk, q_before, q_after FROM s
  WHERE q_before > 0 AND q_after > 0
    AND 3 * q_after >= 2 * q_before
    AND 2 * q_after <= 3 * q_before
)
SELECT su.s_nationkey AS nation,
       COUNT(*) AS n_suppliers,
       CAST(SUM(q_before) AS BIGINT) AS qty_before,
       CAST(SUM(q_after) AS BIGINT) AS qty_after
FROM banded JOIN supplier su ON su.s_suppkey = banded.sk
GROUP BY su.s_nationkey
"""
_TABLES["q_tpcds_shipratio"] = ("lineitem", "supplier")


@query("q_tpcds_shipratio", oracle=_SHIPRATIO)
def q_tpcds_shipratio(spark, sf_dir):
    """TPC-DS Q21 shape (fixture-adapted): per-supplier quantity
    split into before/after a pivot date by conditional sums, keeping
    only suppliers whose after/before ratio falls in [2/3, 3/2] —
    Q21's inventory-ratio band, expressed as exact integer
    cross-products (3·after ≥ 2·before ∧ 2·after ≤ 3·before) instead
    of float division. At scale: one supplier-grain conditional hash
    agg (the date split is an expression, not two scans), the
    dimension join broadcasts, the nation re-agg is 25 groups. The
    SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_shipratio", _SHIPRATIO)


_INVVAR = """
WITH inv AS (
  SELECT l_suppkey AS sk,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS sq2
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY l_suppkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT)
),
flagged AS (
  SELECT sk, m, n, sq, sq2 FROM inv
  WHERE n > 1 AND sq > 0
    AND 4 * n * (n * sq2 - sq * sq) > (n - 1) * sq * sq
)
SELECT f1.m AS m1,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(f1.n) AS BIGINT) AS n1_lines,
       CAST(SUM(f2.n) AS BIGINT) AS n2_lines,
       CAST(SUM(f1.sq) AS BIGINT) AS q1_sum,
       CAST(SUM(f2.sq) AS BIGINT) AS q2_sum
FROM flagged f1
JOIN flagged f2 ON f1.sk = f2.sk AND f2.m = f1.m + 1
GROUP BY f1.m
"""

_TABLES["q_tpcds_invvar"] = ("lineitem",)


@query("q_tpcds_invvar", oracle=_INVVAR)
def q_tpcds_invvar(spark, sf_dir):
    """TPC-DS Q39 shape (fixture-adapted): the inventory-variance
    pair — per (supplier, month) quantity statistics filtered to a
    coefficient-of-variation band, then the SAME stats CTE
    SELF-JOINED on consecutive months (Q39's inv1/inv2 on
    d_moy = d_moy + 1). The cov > 1/2 band is expressed as an exact
    integer cross-product over (n, Σq, Σq²) — 4·n·(n·Σq² − (Σq)²) >
    (n−1)·(Σq)², algebraically 4·s² > mean² with the SAMPLE variance
    — so no float reduction ever happens and the hash is
    deterministic. Scale shape: one supplier×month-grain partial+
    final hash agg, then a tiny equi self-join on (supplier,
    month+1); the date filter prunes at the scan. The SAME SQL text
    is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_invvar", _INVVAR)


_CHANSTATS = """
WITH ch AS (
  SELECT l_partkey AS pk,
         CASE WHEN l_linenumber IN (1, 4) THEN 'air'
              WHEN l_linenumber IN (2, 5) THEN 'post'
              ELSE 'land' END AS chan,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_partkey,
           CASE WHEN l_linenumber IN (1, 4) THEN 'air'
                WHEN l_linenumber IN (2, 5) THEN 'post'
                ELSE 'land' END
)
SELECT pt.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(a.n) AS BIGINT) AS air_lines,
       CAST(SUM(a.sq) AS BIGINT) AS air_qty,
       CAST(SUM(p.n) AS BIGINT) AS post_lines,
       CAST(SUM(p.sq) AS BIGINT) AS post_qty,
       CAST(SUM(l.n) AS BIGINT) AS land_lines,
       CAST(SUM(l.sq) AS BIGINT) AS land_qty
FROM ch a
JOIN ch p ON a.pk = p.pk
JOIN ch l ON a.pk = l.pk
JOIN part pt ON pt.p_partkey = a.pk
WHERE a.chan = 'air' AND p.chan = 'post' AND l.chan = 'land'
GROUP BY pt.p_brand
"""

_TABLES["q_tpcds_chanstats"] = ("lineitem", "part")


@query("q_tpcds_chanstats", oracle=_CHANSTATS)
def q_tpcds_chanstats(spark, sf_dir):
    """TPC-DS Q17 shape (fixture-adapted): items observed in ALL
    THREE channels with per-channel quantity statistics — one
    per-(item, channel) stats CTE self-joined TWICE on item key
    (Q17's store-sales → store-returns → catalog-sales chain), the
    channel split derived from line number (the fixture carries no
    ship mode), rolled up by brand. Scale
    shape: the stats CTE is one partial+final hash agg at item×3
    grain; the two self-joins are equi-joins on item key over
    already-aggregated rows (≤3 per item — no fact×fact blow-up);
    the dim join broadcasts. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chanstats", _CHANSTATS)


_NETCHAIN = """
WITH sale AS (
  SELECT o.o_custkey % 25 AS ckb, l.l_partkey % 200 AS pkb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag <> 'R'
    AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1996-04-01'
  GROUP BY o.o_custkey % 25, l.l_partkey % 200
),
ret AS (
  SELECT o.o_custkey % 25 AS ckb, l.l_partkey % 200 AS pkb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND l.l_shipdate >= DATE '1996-04-01' AND l.l_shipdate < DATE '1996-10-01'
  GROUP BY o.o_custkey % 25, l.l_partkey % 200
),
rebuy AS (
  SELECT o.o_custkey % 25 AS ckb, l.l_partkey % 200 AS pkb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag <> 'R'
    AND l.l_shipdate >= DATE '1996-10-01' AND l.l_shipdate < DATE '1997-04-01'
  GROUP BY o.o_custkey % 25, l.l_partkey % 200
)
SELECT s.pkb % 10 AS item_band,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(SUM(s.cents) AS BIGINT) AS sale_cents,
       CAST(SUM(r.cents) AS BIGINT) AS ret_cents,
       CAST(SUM(b.cents) AS BIGINT) AS rebuy_cents,
       CAST(SUM(s.cents - r.cents + b.cents) AS BIGINT) AS net_cents
FROM sale s
JOIN ret r ON s.ckb = r.ckb AND s.pkb = r.pkb
JOIN rebuy b ON r.ckb = b.ckb AND r.pkb = b.pkb
GROUP BY s.pkb % 10
"""

_TABLES["q_tpcds_netchain"] = ("lineitem", "orders")


@query("q_tpcds_netchain", oracle=_NETCHAIN)
def q_tpcds_netchain(spark, sf_dir):
    """TPC-DS Q25 shape (fixture-adapted): the three-channel
    net-profit mega-join — sold, then RETURNED by the same
    (customer, item) grain in a later window, then RE-PURCHASED in a
    still-later one, net amount = sale − return + re-buy (Q25's
    ss_net_profit + cs_net_profit − sr_net_loss). Customer/item keys
    band (mod 25 / mod 200) so the three-way chain is populated at
    every fixture scale; each leg PRE-AGGREGATES to its band grain
    before the joins, so the chain is a three-way equi-join of
    aggregated legs (≤1 row per band per leg — no fact×fact×fact
    blow-up, the same partial-agg-before-join posture Q25's planner
    wants at 100 TB). Exact cent integers throughout. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_netchain", _NETCHAIN)


# ---------------------------------------------------------------------
# Round-13 suite, sixth tranche (round-12 verdict item 8): Q74
# year-over-year MAX-guarded channel ratios, Q6 scalar-subquery
# state-month filter, Q48 banded OR-of-conjunctions. Same one-SQL-text
# contract; money stays exact cent integers, and every DECISION
# comparison is integer cross-multiplication — doubles appear only in
# emitted ROUND columns (the suite's determinism policy).
# ---------------------------------------------------------------------

_YOYMAX = """
WITH year_total AS (
  SELECT o_custkey AS ck,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 'express' ELSE 'other' END AS channel,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS maxcents
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01'
  GROUP BY o_custkey,
           CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 'express' ELSE 'other' END,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT e1.ck AS custkey,
       e1.maxcents AS express_y1, e2.maxcents AS express_y2,
       t1.maxcents AS other_y1, t2.maxcents AS other_y2,
       ROUND(CAST(e2.maxcents AS DOUBLE) / e1.maxcents, 6)
         AS express_growth,
       ROUND(CAST(t2.maxcents AS DOUBLE) / t1.maxcents, 6)
         AS other_growth
FROM year_total e1, year_total e2, year_total t1, year_total t2
WHERE e1.ck = e2.ck AND e1.ck = t1.ck AND t1.ck = t2.ck
  AND e1.channel = 'express' AND e2.channel = 'express'
  AND t1.channel = 'other' AND t2.channel = 'other'
  AND e1.yr = 1996 AND e2.yr = 1997
  AND t1.yr = 1996 AND t2.yr = 1997
  AND e1.maxcents > 0 AND t1.maxcents > 0
  AND CAST(e2.maxcents AS DECIMAL(19,0)) * CAST(t1.maxcents AS DECIMAL(19,0))
      > CAST(t2.maxcents AS DECIMAL(19,0)) * CAST(e1.maxcents AS DECIMAL(19,0))
"""

_TABLES["q_tpcds_yoymax"] = ("orders",)


@query("q_tpcds_yoymax", oracle=_YOYMAX)
def q_tpcds_yoymax(spark, sf_dir):
    """TPC-DS Q74 shape (fixture-adapted): Q4's single
    year_total-CTE-four-consumers skeleton, but the per-(customer,
    channel, year) total is a MAX (Q74 aggregates max list price, not
    a sum) and the growth comparison carries Q74's POSITIVE-BASE
    GUARD — a customer qualifies only when BOTH channels' first-year
    totals are strictly positive (Q74's CASE WHEN year_total > 0
    guard, which keeps NULL/zero-base ratios out of the comparison
    rather than letting division semantics decide). The decision
    itself cross-multiplies in DECIMAL(19,0) — exact; the emitted
    growth ratios are display-only ROUNDs. At scale: one
    customer-grain aggregate, four shuffle-reused equi-joins on ck.
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_yoymax", _YOYMAX)


_STATEMONTH = """
SELECT n_name AS state, CAST(COUNT(*) AS BIGINT) AS cnt
FROM customer, orders, lineitem, part p, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_partkey = p.p_partkey
  AND c_nationkey = n_nationkey
  AND EXTRACT(MONTH FROM o_orderdate) =
      (SELECT MIN(EXTRACT(MONTH FROM o_orderdate)) FROM orders
       WHERE EXTRACT(YEAR FROM o_orderdate) = 1996)
  AND EXTRACT(YEAR FROM o_orderdate) = 1996
  AND 51 * CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
        * (SELECT COUNT(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
      > 50 * (SELECT SUM(CAST(ROUND(p2.p_retailprice * 100) AS BIGINT))
              FROM part p2 WHERE p2.p_brand = p.p_brand)
GROUP BY n_name
HAVING COUNT(*) >= 10
"""

_TABLES["q_tpcds_statemonth"] = (
    "customer", "orders", "lineitem", "part", "nation",
)


@query("q_tpcds_statemonth", oracle=_STATEMONTH)
def q_tpcds_statemonth(spark, sf_dir):
    """TPC-DS Q6 shape (fixture-adapted): customers-per-state whose
    purchased items price above 1.02x their category average, in the
    month an UNCORRELATED SCALAR SUBQUERY picks — Q6's two-subquery
    signature. nation plays state; part brand plays category; the
    above-average test is CORRELATED scalar subqueries rewritten as
    integer cross-multiplication (51*price*count > 50*sum — exact,
    where a double AVG would be summation-order dependent across
    engines). HAVING COUNT >= 10 is Q6's tail. At scale: the scalar
    subqueries are one-row broadcasts / per-brand aggregates Catalyst
    rewrites to joins; the five-way join keys all equi. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_statemonth", _STATEMONTH)


_ORBANDS = """
SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE (o_orderpriority = '1-URGENT'
       AND l_quantity BETWEEN 1 AND 15
       AND l_discount BETWEEN 0.02 AND 0.04)
   OR (o_orderpriority = '3-MEDIUM'
       AND l_quantity BETWEEN 16 AND 30
       AND l_discount BETWEEN 0.05 AND 0.07)
   OR (o_orderpriority = '5-LOW'
       AND l_quantity BETWEEN 31 AND 50
       AND l_discount BETWEEN 0.08 AND 0.10)
"""

_TABLES["q_tpcds_orbands"] = ("lineitem", "orders")


@query("q_tpcds_orbands", oracle=_ORBANDS)
def q_tpcds_orbands(spark, sf_dir):
    """TPC-DS Q48 shape (fixture-adapted): one fact-dim join filtered
    by an OR of three CONJUNCTION BANDS — each band pairs a dim
    attribute with disjoint quantity and discount ranges (Q48's
    marital-status x income x price bands). The optimizer challenge
    Q48 exists for: the disjunction cannot push as one residual, so
    the engine must either scan-and-filter or split the bands; either
    way results are identical and the aggregate is exact cents.
    Discount literals compare exactly (both engines parse the same
    binary64). The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_orbands", _ORBANDS)


_WINSELECT = """
WITH sales AS (
  SELECT n_name AS state, c_mktsegment AS seg, n_regionkey AS region,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
),
qual AS (
  SELECT state FROM (
    SELECT state,
           RANK() OVER (PARTITION BY region
                        ORDER BY SUM(cents) DESC, state) AS rnk
    FROM sales GROUP BY region, state
  ) ranked WHERE rnk <= 2
),
r AS (
  SELECT state, seg,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(GROUPING(state) + GROUPING(seg) AS BIGINT) AS lochierarchy,
         GROUPING(seg) AS gseg
  FROM sales
  WHERE state IN (SELECT state FROM qual)
  GROUP BY ROLLUP(state, seg)
)
SELECT lochierarchy, state, seg, total_cents,
       CAST(RANK() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN gseg = 0 THEN state END
         ORDER BY total_cents DESC) AS BIGINT) AS rank_within_parent
FROM r
"""

_TABLES["q_tpcds_winselect"] = ("orders", "customer", "nation")


@query("q_tpcds_winselect", oracle=_WINSELECT)
def q_tpcds_winselect(spark, sf_dir):
    """TPC-DS Q70 shape (fixture-adapted): the IN-subquery whose
    predicate is itself a WINDOW FUNCTION (states ranking top-2 by
    revenue WITHIN THEIR REGION — Q70's rank-in-subquery signature,
    which Catalyst must plan as window-then-semi-join, not a pushable
    filter), feeding a ROLLUP whose rank partitions on
    GROUPING()-derived lochierarchy + a CASE NULL-ing the parent key
    at subtotal rows (Q70's rank_within_parent idiom exactly).
    nation plays state, region its hierarchy, mktsegment the county.
    Exact cent integers; RANK (not ROW_NUMBER) so revenue ties get
    equal ranks deterministically on both engines; the in-subquery
    rank carries a state tiebreak so top-2 is a deterministic SET.
    Scale shape: both windows partition (region / lochierarchy+state
    — no single-partition exchange); the semi-join broadcasts a
    <=2-per-region state list. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_winselect", _WINSELECT)


# Portable weekday: Spark's EXTRACT has DOW_ISO but no ISODOW, DuckDB
# the reverse, and their DOW/DAYOFWEEK fields disagree on the Sunday
# origin (Spark 1, DuckDB 0). Both agree on DOY, so the ISO weekday is
# derived from the day-of-year plus a per-year anchor (1996-01-01 is a
# Monday, 1997-01-01 a Wednesday) — exact integer arithmetic, no
# engine-specific field names, valid for the two years the query pins.
_WEEKPIVOT = """
WITH daily AS (
  SELECT n_name AS state,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS wk,
         MOD(CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT)
             + CASE CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                 WHEN 1996 THEN 6 WHEN 1997 THEN 1 END, 7) + 1 AS dow,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01'
),
weekly AS (
  SELECT state, yr, wk,
         SUM(CASE WHEN dow = 1 THEN cents ELSE 0 END) AS mon,
         SUM(CASE WHEN dow = 2 THEN cents ELSE 0 END) AS tue,
         SUM(CASE WHEN dow = 3 THEN cents ELSE 0 END) AS wed,
         SUM(CASE WHEN dow = 4 THEN cents ELSE 0 END) AS thu,
         SUM(CASE WHEN dow = 5 THEN cents ELSE 0 END) AS fri,
         SUM(CASE WHEN dow = 6 THEN cents ELSE 0 END) AS sat,
         SUM(CASE WHEN dow = 7 THEN cents ELSE 0 END) AS sun
  FROM daily
  WHERE wk BETWEEN 5 AND 48
  GROUP BY state, yr, wk
)
SELECT y1.state AS state, y1.wk AS wk,
       CAST(y1.mon AS BIGINT) AS mon_y1,
       CAST(y2.mon - y1.mon AS BIGINT) AS mon_delta,
       CAST(y1.tue AS BIGINT) AS tue_y1,
       CAST(y2.tue - y1.tue AS BIGINT) AS tue_delta,
       CAST(y1.wed AS BIGINT) AS wed_y1,
       CAST(y2.wed - y1.wed AS BIGINT) AS wed_delta,
       CAST(y1.thu AS BIGINT) AS thu_y1,
       CAST(y2.thu - y1.thu AS BIGINT) AS thu_delta,
       CAST(y1.fri AS BIGINT) AS fri_y1,
       CAST(y2.fri - y1.fri AS BIGINT) AS fri_delta,
       CAST(y1.sat AS BIGINT) AS sat_y1,
       CAST(y2.sat - y1.sat AS BIGINT) AS sat_delta,
       CAST(y1.sun AS BIGINT) AS sun_y1,
       CAST(y2.sun - y1.sun AS BIGINT) AS sun_delta
FROM weekly y1 JOIN weekly y2
  ON y1.state = y2.state AND y1.wk = y2.wk
WHERE y1.yr = 1996 AND y2.yr = 1997
"""

_TABLES["q_tpcds_weekpivot"] = ("orders", "customer", "nation")


@query("q_tpcds_weekpivot", oracle=_WEEKPIVOT)
def q_tpcds_weekpivot(spark, sf_dir):
    """TPC-DS Q59/Q2 shape (fixture-adapted): weekly sales PIVOTED BY
    WEEKDAY via conditional aggregation, the pivoted series SELF-JOINED
    on (store, week-index) across adjacent years, one comparison
    column per weekday — Q59's fourteen-column signature. nation
    plays store; the year-over-year comparison is an exact integer
    DELTA per weekday (Q59 divides; a cent-sum difference carries the
    same information without the cross-engine double-division
    hazard). The weekday derives from DOY + a per-year anchor (see
    the module comment above _WEEKPIVOT — Spark and DuckDB share no
    day-of-week EXTRACT field). ISO-week boundary days (late-Dec
    dates whose EXTRACT(WEEK) wraps to 1) fall outside the wk 5..48
    band identically on both engines. Scale shape: one groupBy on
    (state, yr, wk) with map-side partials over the 7 CASE sums, then
    an equi self-join keyed (state, wk) — dimension-bounded output
    (25 states x 44 weeks). The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_weekpivot", _WEEKPIVOT)


# Q9's literal structure: one CASE of UNCORRELATED scalar subqueries
# per bucket (Spark 4.1's decorrelator rejects the tidier
# correlated-against-an-inline-bucket-table form with non-equi
# correlates — "key not found" during DecorrelateInnerQuery — so the
# bounds are inlined per arm exactly as Q9 itself writes them). The
# text is generated once at import into a STATIC string; both engines
# see the identical SQL.
def _bucketcase_sql() -> str:
    arms = []
    for bucket, lo, hi, mult in (
        (1, 1, 11, 4),
        (2, 11, 21, 6),
        (3, 21, 31, 4),
        (4, 31, 41, 6),
        (5, 41, 51, 4),
    ):
        band = f"l_quantity >= {lo} AND l_quantity < {hi}"
        arms.append(
            f"SELECT {bucket} AS bucket,\n"
            f"  CASE WHEN {mult} * (SELECT COUNT(*) FROM lineitem"
            f" WHERE {band})\n"
            f"         > (SELECT COUNT(*) FROM lineitem)\n"
            f"    THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice"
            f" * 100) AS BIGINT)) AS BIGINT)\n"
            f"          FROM lineitem WHERE {band})\n"
            f"    ELSE (SELECT CAST(SUM(CAST(ROUND(l_extendedprice"
            f" * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)\n"
            f"          FROM lineitem WHERE {band})\n"
            f"  END AS chosen_cents"
        )
    return "\nUNION ALL\n".join(arms)


_BUCKETCASE = _bucketcase_sql()

_TABLES["q_tpcds_bucketcase"] = ("lineitem",)


@query("q_tpcds_bucketcase", oracle=_BUCKETCASE)
def q_tpcds_bucketcase(spark, sf_dir):
    """TPC-DS Q9 shape (fixture-adapted): five quantity buckets, each
    emitting ONE of two aggregates chosen by a CASE whose predicate
    is ITSELF a scalar subquery over the same fact (Q9's
    count-above-threshold-picks-which-average signature — fifteen
    scalar subqueries against one table, the scan-reuse stress). The
    threshold is RELATIVE (bucket_count x mult vs total count, exact
    integer cross-multiply), so branch selection is scale-stable
    where Q9's literal thresholds would flip between sf0.01 and sf1;
    averages become exact cent sums (gross vs discounted — same
    either-or information, no double division). All 15 subqueries are
    uncorrelated (see the comment above _bucketcase_sql: Spark 4.1's
    decorrelator rejects the inline-bucket-table form); each plans as
    a one-row aggregate over a two-column pruned scan. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_bucketcase", _BUCKETCASE)


_DIMBOOL = """
SELECT DISTINCT p1.p_name AS product_name
FROM part p1
WHERE p1.p_size BETWEEN 10 AND 40
  AND (SELECT COUNT(*) FROM part p2
       WHERE p2.p_brand = p1.p_brand
         AND ((p2.p_type = 'ECONOMY'  AND p2.p_size BETWEEN 1  AND 10)
           OR (p2.p_type = 'SMALL'    AND p2.p_size BETWEEN 11 AND 20)
           OR (p2.p_type = 'STANDARD' AND p2.p_size BETWEEN 21 AND 30)
           OR (p2.p_type = 'LARGE'    AND p2.p_size BETWEEN 31 AND 40))) > 0
"""

_TABLES["q_tpcds_dimbool"] = ("part",)


@query("q_tpcds_dimbool", oracle=_DIMBOOL)
def q_tpcds_dimbool(spark, sf_dir):
    """TPC-DS Q41 shape (fixture-adapted): a DIMENSION-ONLY query
    whose filter is a CORRELATED COUNT subquery over the same
    dimension carrying Q41's OR-of-conjunction boolean blob (color x
    units x size bands → type x size bands here), correlated on the
    manufacturer family (p_brand plays i_manufact). The optimizer
    work Q41 exists for: decorrelate the equality-correlated COUNT
    into a per-brand aggregate join, and simplify-or-split the
    disjunction; > 0 makes it semantically an EXISTS that engines may
    or may not rewrite. DISTINCT product names, deterministic set
    (no LIMIT — Q41's LIMIT 100 would cut on name ties). Dimension
    tables stay small at any SF, so both the subquery and the outer
    scan are broadcast-sized. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_dimbool", _DIMBOOL)


_PROMORATIO = """
WITH promo AS (
  SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
),
total AS (
  SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
)
SELECT CAST(promo.cents AS BIGINT) AS promo_cents,
       CAST(total.cents AS BIGINT) AS total_cents,
       ROUND(100 * CAST(promo.cents AS DOUBLE) / CAST(total.cents AS DOUBLE),
             6) AS promo_pct
FROM promo, total
"""

_TABLES["q_tpcds_promoratio"] = ("lineitem", "orders", "part")


@query("q_tpcds_promoratio", oracle=_PROMORATIO)
def q_tpcds_promoratio(spark, sf_dir):
    """TPC-DS Q61 shape (fixture-adapted): promotional vs total
    revenue as TWO INDEPENDENT one-row aggregate CTEs cross-joined
    into a ratio — Q61's signature is that the promo side carries an
    EXTRA join (promotion; part's PROMO type here) the total side
    does not, so the engine runs two different join trees and
    combines single rows (vs Q14's one-pass conditional aggregate).
    Revenue is exact cents; the display ratio divides two cent sums
    (corpus-sized denominator — the watch-class-safe category). At
    scale both CTEs are independent scan+join+agg pipelines that
    parallelize fully; the final cross join is 1x1. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_promoratio", _PROMORATIO)


_DEVAVG = """
WITH m AS (
  SELECT o_custkey % 25 AS grp,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01'
  GROUP BY o_custkey % 25,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
),
w AS (
  SELECT grp, y, mo, cents,
         SUM(cents) OVER (PARTITION BY grp, y) AS ytotal,
         COUNT(*) OVER (PARTITION BY grp, y) AS ymonths,
         LAG(cents) OVER (PARTITION BY grp ORDER BY y, mo) AS prev_cents,
         LEAD(cents) OVER (PARTITION BY grp ORDER BY y, mo) AS next_cents
  FROM m
)
SELECT grp, y, mo,
       CAST(cents AS BIGINT) AS cents,
       CAST(ytotal AS BIGINT) AS ytotal,
       CAST(prev_cents AS BIGINT) AS prev_cents,
       CAST(next_cents AS BIGINT) AS next_cents
FROM w
WHERE ymonths = 12
  AND 10 * ABS(12 * cents - ytotal) > ytotal
ORDER BY grp, y, mo
"""

_TABLES["q_tpcds_devavg"] = ("orders",)


@query("q_tpcds_devavg", oracle=_DEVAVG)
def q_tpcds_devavg(spark, sf_dir):
    """TPC-DS Q47/Q57 shape (fixture-adapted): monthly revenue per
    customer group filtered to months DEVIATING >10% from their
    year's average, each emitted WITH its LAG and LEAD neighbor
    months — the three-window signature (a year-partitioned
    aggregate window plus two offset windows ordered ACROSS year
    boundaries) Q47 exists to stress. The deviation predicate is
    exact integer cross-multiplication: |monthly/avg - 1| > 0.1 ⟺
    10·|12·cents - ytotal| > ytotal (no doubles anywhere); Q47's
    full-year guard is ymonths = 12. Neighbor columns are NULL at
    series edges — deterministically. At scale all three windows
    share ONE (grp) hash partitioning; rows per (grp, y, mo) cell
    shrink with SF so the window state is calendar-bounded. The
    SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_devavg", _DEVAVG)


_TIMESLOTS = """
SELECT
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 1 AND l_quantity < 7
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s1,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 7 AND l_quantity < 13
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s2,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 13 AND l_quantity < 19
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s3,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 19 AND l_quantity < 25
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s4,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 25 AND l_quantity < 31
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s5,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 31 AND l_quantity < 37
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s6,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 37 AND l_quantity < 43
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s7,
  (SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
   WHERE l_quantity >= 43 AND l_quantity < 50
     AND o_orderpriority IN ('1-URGENT', '2-HIGH')) AS s8
"""

_TABLES["q_tpcds_timeslots"] = ("lineitem", "orders")


@query("q_tpcds_timeslots", oracle=_TIMESLOTS)
def q_tpcds_timeslots(spark, sf_dir):
    """TPC-DS Q88 shape (fixture-adapted): EIGHT independent
    single-row COUNT aggregates over disjoint bands (Q88's
    half-hour time slots → quantity bands here), each carrying its
    own fact-dim join, cross-joined into ONE wide row — the
    scan-reuse / subquery-factoring stress: a naive plan scans the
    fact table eight times, a good one shares or at least pipelines
    the scans (Spark runs eight parallel subquery jobs; the bands
    are disjoint so counts partition the filtered fact). All counts
    are exact integers; the 1x1x...x1 cross join is free. The SAME
    SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_timeslots", _TIMESLOTS)


_CHANDECLINE = """
WITH chan AS (
  SELECT l_partkey % 50 AS fam,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS y,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_returnflag = 'N'
  UNION ALL
  SELECT l_partkey % 50 AS fam,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS y,
         -CAST(l_quantity AS BIGINT) AS qty,
         -CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_returnflag = 'R'
),
yr AS (
  SELECT fam, y,
         CAST(SUM(qty) AS BIGINT) AS qty,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM chan
  WHERE y IN (1996, 1997)
  GROUP BY fam, y
)
SELECT c.fam AS fam,
       p.qty AS prev_qty, c.qty AS curr_qty,
       p.cents AS prev_cents, c.cents AS curr_cents,
       CAST(c.cents - p.cents AS BIGINT) AS delta_cents
FROM yr c JOIN yr p ON c.fam = p.fam AND c.y = 1997 AND p.y = 1996
WHERE p.qty > 0 AND c.qty * 10 < p.qty * 9
ORDER BY delta_cents, fam
"""

_TABLES["q_tpcds_chandecline"] = ("lineitem",)


@query("q_tpcds_chandecline", oracle=_CHANDECLINE)
def q_tpcds_chandecline(spark, sf_dir):
    """TPC-DS Q75 shape (fixture-adapted): NET sales per item family
    and year assembled as a UNION ALL where RETURNS enter as
    NEGATIVE rows (Q75's sales-minus-returns signature — returnflag
    'R' rows negate quantity and cents), aggregated per (family,
    year), self-joined current-vs-prior year, and filtered to
    families whose net quantity DECLINED below 90% — as exact
    integer cross-multiplication (curr·10 < prev·9), with the
    monetary delta surfaced. Deterministic order by (delta, fam).
    At scale: one fact scan feeds both union arms (column-pruned to
    4 columns), the aggregate shuffles 50 families x 2 years, and
    the self-join is metadata-sized. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_chandecline", _CHANDECLINE)


_UNIONCHAN = """
WITH dim AS (
  SELECT p_partkey FROM part WHERE p_type = 'PROMO'
),
arm1 AS (
  SELECT l_partkey % 40 AS fam, 1 AS arm,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '1-URGENT'
    AND l_partkey IN (SELECT p_partkey FROM dim)
),
arm2 AS (
  SELECT l_partkey % 40 AS fam, 2 AS arm,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '2-HIGH'
    AND l_partkey IN (SELECT p_partkey FROM dim)
),
arm3 AS (
  SELECT l_partkey % 40 AS fam, 3 AS arm,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '3-MEDIUM'
    AND l_partkey IN (SELECT p_partkey FROM dim)
),
u AS (
  SELECT * FROM arm1 UNION ALL SELECT * FROM arm2 UNION ALL SELECT * FROM arm3
)
SELECT fam,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(COUNT(DISTINCT arm) AS BIGINT) AS n_arms,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM u GROUP BY fam
ORDER BY total_cents DESC, fam
LIMIT 25
"""

_TABLES["q_tpcds_unionchan"] = ("lineitem", "orders", "part")


@query("q_tpcds_unionchan", oracle=_UNIONCHAN)
def q_tpcds_unionchan(spark, sf_dir):
    """TPC-DS Q33/Q56/Q60 shape (fixture-adapted): THREE channel
    arms, each a fact-dim join restricted by the SAME IN-subquery
    dimension set (Q33's manufacturer-restriction CTE → the PROMO
    part set here), UNION ALL'd and re-aggregated per item family —
    the repeated-subtree factoring stress (a good engine evaluates
    the shared dim subquery once and may share the fact scan; the
    semi-join should broadcast). Top-25 by exact cent total with
    family tiebreak; n_arms pins that every family aggregates across
    all three channels. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_unionchan", _UNIONCHAN)


_EXCESSDISC = """
WITH d AS (
  SELECT l_partkey,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS dc,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
)
SELECT CAST(SUM(cents) AS BIGINT) AS excess_cents,
       CAST(COUNT(*) AS BIGINT) AS n_excess,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM d
WHERE 10 * dc * (SELECT COUNT(*) FROM d d2 WHERE d2.l_partkey = d.l_partkey)
      > 13 * (SELECT SUM(dc) FROM d d2 WHERE d2.l_partkey = d.l_partkey)
"""

_TABLES["q_tpcds_excessdisc"] = ("lineitem", "orders")


@query("q_tpcds_excessdisc", oracle=_EXCESSDISC)
def q_tpcds_excessdisc(spark, sf_dir):
    """TPC-DS Q92/Q32 shape (fixture-adapted): rows whose discount
    exceeds 1.3x the AVERAGE discount of their part — written as TWO
    CORRELATED SCALAR SUBQUERIES over the same CTE (Q92's
    'excess discount' signature), which both engines must
    decorrelate into per-part aggregate joins. The 1.3x threshold is
    exact integer cross-multiplication (10·dc·count > 13·sum_dc —
    no division, no doubles), so the row selection is bit-stable at
    any scale. One-row output: excess cents, row count, distinct
    parts. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_excessdisc", _EXCESSDISC)


_ZIPJOIN = """
WITH zips AS (
  SELECT DISTINCT SUBSTR(n_name, 1, 3) AS z
  FROM nation WHERE n_regionkey IN (1, 2)
  INTERSECT
  SELECT SUBSTR(n_name, 1, 3) AS z
  FROM nation JOIN customer ON c_nationkey = n_nationkey
  GROUP BY SUBSTR(n_name, 1, 3) HAVING COUNT(*) > 10
)
SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE SUBSTR(n_name, 1, 3) IN (SELECT z FROM zips)
  AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
ORDER BY mo
"""

_TABLES["q_tpcds_zipjoin"] = ("orders", "customer", "nation")


@query("q_tpcds_zipjoin", oracle=_ZIPJOIN)
def q_tpcds_zipjoin(spark, sf_dir):
    """TPC-DS Q8 shape (fixture-adapted): monthly revenue for
    customers whose geography key matches a COMPUTED-SUBSTRING set
    built by an INTERSECT of two differently-derived dimension
    subqueries (Q8's zip-prefix ∩ preferred-customer-zips → region
    membership ∩ populous nation-name prefixes here). The shape
    stresses (a) join/filter keys that are EXPRESSIONS over dim
    columns — no stats, no pushdown shortcut — and (b) set INTERSECT
    feeding a semi-join. Dims stay broadcast-sized at any SF; exact
    cent sums; deterministic month ordering. The SAME SQL text is
    the oracle."""
    return _run_sql(spark, sf_dir, "q_tpcds_zipjoin", _ZIPJOIN)
