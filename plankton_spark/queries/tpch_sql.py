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

from plankton_spark.io import read_table, table_view
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
        table_view(spark, sf_dir, t)
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


_Q4 = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""

_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(vol) AS DOUBLE), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey
    AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

_Q14 = """
SELECT ROUND(100 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         THEN CAST(l_extendedprice AS DECIMAL(18,4))
              * (1 - CAST(l_discount AS DECIMAL(18,4)))
         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
         AS promo_pct,
       COUNT(*) AS n_lineitems
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1996-02-01'
"""

_Q18 = """
SELECT c_custkey, o_orderkey,
       ROUND(CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,4)) AS DOUBLE), 4)
         AS totalprice,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS qty_cents
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 18000
  )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey
"""

_TABLES.update(
    {
        "q_tpch_q4": ("orders", "lineitem"),
        "q_tpch_q7": (
            "supplier", "lineitem", "orders", "customer", "nation",
        ),
        "q_tpch_q14": ("lineitem", "part"),
        "q_tpch_q18": ("customer", "orders", "lineitem"),
    }
)


@query("q_tpch_q4", oracle=_Q4)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted to the fixture's
    columns: one quarter's orders having at least one lineitem shipped
    more than 60 days after the order date — correlated EXISTS
    becomes a semi-join. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q4", _Q4)


@query("q_tpch_q7", oracle=_Q7)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bidirectional trade between two
    nations, revenue per (supplier nation, customer nation, ship
    year) — the nation dimension joins twice under different roles.
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q7", _Q7)


@query("q_tpch_q14", oracle=_Q14)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): PROMO share of one month's
    revenue — conditional decimal aggregation and a ratio computed
    double-on-double (identical inputs → identical IEEE division).
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q14", _Q14)


@query("q_tpch_q18", oracle=_Q18)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    clears a threshold (IN over a grouped subquery — a semi-join on an
    aggregate), rolled up with customer identity. Quantities in
    cent-exact integers. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q18", _Q18)


_Q6 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey AS ck, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""

_Q19 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 21)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        AND l_quantity >= 10 AND l_quantity <= 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        AND l_quantity >= 20 AND l_quantity <= 40))
"""

_Q22 = """
SELECT cntrycode, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (
      SELECT AVG(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer
      WHERE c_acctbal > 0.00 AND c_nationkey % 7 IN (0, 1, 2, 3)
    )
    AND c_nationkey % 7 IN (0, 1, 2, 3)
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= DATE '2000-01-01'
    )
) custsale
GROUP BY cntrycode
"""

_TABLES.update(
    {
        "q_tpch_q6": ("lineitem",),
        "q_tpch_q13": ("customer", "orders"),
        "q_tpch_q19": ("lineitem", "part"),
        "q_tpch_q22": ("customer", "orders"),
    }
)


@query("q_tpch_q6", oracle=_Q6)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): the pure scan-side query —
    every predicate pushes to the parquet reader, one global decimal
    agg, zero joins. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q6", _Q6)


@query("q_tpch_q13", oracle=_Q13)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    with an ON-clause filter on the RIGHT side (customers with zero
    qualifying orders must survive with count 0) folded into a
    distribution histogram. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q13", _Q13)


@query("q_tpch_q19", oracle=_Q19)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, fixture-adapted brands): a
    disjunction of brand x size x quantity windows that must evaluate
    AFTER the join (no single-side pushdown) — the classic
    OR-of-conjunctions join predicate. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q19", _Q19)


@query("q_tpch_q22", oracle=_Q22)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity, fixture-adapted country
    codes): scalar AVG subquery threshold + NOT EXISTS anti-join on
    RECENT orders (every fixture customer has SOME order, so the
    classic no-orders form would be an empty-set test), rolled up per
    derived country code. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q22", _Q22)


_Q8 = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN vol
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share,
       COUNT(*) AS n_lineitems
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4))) AS vol,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1,
       nation n2, region
  WHERE p_partkey = l_partkey
    AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA'
    AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""

_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       ROUND(CAST(total_rev AS DOUBLE), 4) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
"""

_Q17 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
             AS DOUBLE) / 7.0, 4) AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#1'
  AND l_quantity * 100 < (
    SELECT 0.2 * AVG(l2.l_quantity * 100)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""

_TABLES.update(
    {
        "q_tpch_q8": (
            "part", "supplier", "lineitem", "orders", "customer",
            "nation", "region",
        ),
        "q_tpch_q15": ("supplier", "lineitem"),
        "q_tpch_q17": ("lineitem", "part"),
    }
)


@query("q_tpch_q8", oracle=_Q8)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): the 8-way join — nation
    twice under different roles, region-filtered customers, one
    nation's share of PROMO-part revenue per order year. The SAME SQL
    text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q8", _Q8)


@query("q_tpch_q15", oracle=_Q15)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): the revenue view re-joined against
    its own MAX via a scalar subquery — exact-decimal revenue makes
    the equality deterministic. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q15", _Q15)


@query("q_tpch_q17", oracle=_Q17)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): a correlated scalar
    AVG subquery per part (the optimizer's rewrite-to-aggregate-join
    showcase), quantities compared in cent-exact integers against
    0.2x the per-part mean. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q17", _Q17)


_MOMENTS = """
WITH c AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS q
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(q AS DECIMAL(38,0))) AS s1,
         SUM(CAST(q * q AS DECIMAL(38,0))) AS s2,
         SUM(CAST(q * q * q AS DECIMAL(38,0))) AS s3,
         SUM(CAST(q * q * q * q AS DECIMAL(38,0))) AS s4
  FROM c GROUP BY l_returnflag
),
stats AS (
  SELECT l_returnflag, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM m
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
             / ((r2 - mu * mu) * SQRT(r2 - mu * mu)), 6) AS skewness,
       ROUND((r4 - 4 * mu * r3 + 6 * mu * mu * r2
              - 3 * mu * mu * mu * mu)
             / ((r2 - mu * mu) * (r2 - mu * mu)) - 3, 6)
         AS excess_kurtosis
FROM stats
"""

_TABLES.update({"q_agg_moments": ("lineitem",)})


@query("q_agg_moments", oracle=_MOMENTS)
def q_agg_moments(spark, sf_dir):
    """Population skewness + excess kurtosis per group from EXACT
    integer raw moments: cent quantities' power sums accumulate as
    DECIMAL(38,0) (order-free, overflow-free — q^4 <= 6.25e14 per
    term), and only the FINAL closed-form combination runs in
    doubles, written with sqrt/*/÷ only (no POW — libm pow is not
    guaranteed cross-engine-identical; sqrt is IEEE-exact). The SAME
    SQL text is the oracle, so Spark's and DuckDB's whole pipelines
    must agree to 6dp. Engines' own skewness()/kurtosis() builtins
    differ in bias-correction conventions — raw moments sidestep the
    convention entirely."""
    return _run_sql(spark, sf_dir, "q_agg_moments", _MOMENTS)


_CORR = """
WITH c AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS d
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(d AS DECIMAL(38,0))) AS sd,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
         SUM(CAST(d * d AS DECIMAL(38,0))) AS sdd,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(x * d AS DECIMAL(38,0))) AS sxd
  FROM c GROUP BY l_returnflag
),
r AS (
  SELECT l_returnflag, n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
         CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS md,
         CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS rxx,
         CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) AS ryy,
         CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE) AS rdd,
         CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) AS rxy,
         CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE) AS rxd
  FROM m
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       ROUND((rxy - mx * my)
             / (SQRT(rxx - mx * mx) * SQRT(ryy - my * my)), 6)
         AS corr_qty_price,
       ROUND((rxd - mx * md)
             / (SQRT(rxx - mx * mx) * SQRT(rdd - md * md)), 6)
         AS corr_qty_discount
FROM r
"""

_TABLES.update({"q_agg_corr": ("lineitem",)})


@query("q_agg_corr", oracle=_CORR)
def q_agg_corr(spark, sf_dir):
    """Pearson correlation matrix entries per group from EXACT integer
    cross moments (the q_agg_moments machinery extended to Σxy):
    quantity-price and quantity-discount correlations with all power
    and cross sums in DECIMAL(38,0), the closed form in sqrt/mul/div
    doubles. One SQL text serves both engines — their corr() builtins
    use streaming co-moment updates whose FP accumulation order is
    partition-dependent, which raw exact moments sidestep."""
    return _run_sql(spark, sf_dir, "q_agg_corr", _CORR)


# --- round 8: the seven remaining TPC-H shapes (fixture-adapted) ----------
#
# The fixture schema has no partsupp table and no
# l_commitdate/l_receiptdate/l_shipmode columns, so Q2/Q9/Q11/Q16/Q20
# derive a partsupp surrogate from lineitem (the part-supplier
# relationship with exact cent-integer cost/quantity aggregates) and
# Q12/Q21 use ship-lag vs o_orderdate as the lateness surrogate.  What
# each query PINS is its hard optimizer shape: correlated MIN (Q2),
# group-vs-global-scalar threshold (Q11), nested IN-over-aggregate with
# a correlated scalar (Q20), multi-way EXISTS + NOT EXISTS (Q21) — the
# decorrelation paths no other query in the suite exercises.

_Q2 = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS ps_supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_brand, s_name, n_name,
       ROUND(CAST(CAST(s_acctbal AS DECIMAL(18,4)) AS DOUBLE), 4)
         AS acctbal,
       ps_supplycost AS supplycost_cents
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps_partkey
  AND s_suppkey = ps_suppkey
  AND p_size BETWEEN 10 AND 20
  AND p_type = 'PROMO'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM ps ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey
      AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE'
  )
"""

_Q9 = """
SELECT nation, o_year,
       ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))
           - CAST(p_retailprice AS DECIMAL(18,4))
             * CAST(ROUND(l_quantity) AS DECIMAL(4,0)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey
    AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey
    AND s_nationkey = n_nationkey
    AND p_name LIKE '%e%'
) profit
GROUP BY nation, o_year
"""

_Q11 = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS ps_value
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT ps_partkey,
       ROUND(CAST(SUM(ps_value) AS DOUBLE), 4) AS part_value
FROM ps, supplier, nation
WHERE ps_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
GROUP BY ps_partkey
HAVING SUM(ps_value) * 1000 > (
  SELECT SUM(ps2.ps_value)
  FROM ps ps2, supplier s2, nation n2
  WHERE ps2.ps_suppkey = s2.s_suppkey
    AND s2.s_nationkey = n2.n_nationkey
    AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
)
"""

_Q12 = """
SELECT l_returnflag AS ret_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
"""

_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) ps, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""

_Q20 = """
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_suppkey IN (
  SELECT agg.suppkey
  FROM (
    SELECT l_suppkey AS suppkey, l_partkey AS partkey,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_cents
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'red%')
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_suppkey, l_partkey
  ) agg
  WHERE agg.qty_cents * 5 > (
    SELECT SUM(CAST(ROUND(l2.l_quantity * 100) AS BIGINT))
    FROM lineitem l2
    WHERE l2.l_partkey = agg.partkey
      AND l2.l_shipdate >= DATE '1996-01-01'
      AND l2.l_shipdate < DATE '1997-01-01'
  )
)
AND s_nationkey = n_nationkey
AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4',
               'NATION_5')
"""

_Q21 = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3, orders o2
    WHERE l3.l_orderkey = l1.l_orderkey
      AND o2.o_orderkey = l3.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
  )
  AND s_nationkey = n_nationkey
GROUP BY s_name
"""

_TABLES.update(
    {
        "q_tpch_q2": ("part", "lineitem", "supplier", "nation", "region"),
        "q_tpch_q9": ("part", "supplier", "lineitem", "orders", "nation"),
        "q_tpch_q11": ("lineitem", "supplier", "nation"),
        "q_tpch_q12": ("orders", "lineitem"),
        "q_tpch_q16": ("lineitem", "part", "supplier"),
        "q_tpch_q20": ("supplier", "nation", "lineitem", "part"),
        "q_tpch_q21": ("supplier", "lineitem", "orders", "nation"),
    }
)


@query("q_tpch_q2", oracle=_Q2)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier, fixture-adapted): partsupp is
    derived from lineitem as MIN cent-exact price per (part, supplier);
    the correlated MIN scalar subquery — re-joining region-filtered
    suppliers per outer part — is THE decorrelate-to-aggregate-join
    shape Q2 exists to test. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q2", _Q2)


@query("q_tpch_q9", oracle=_Q9)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit, fixture-adapted): profit =
    exact-decimal revenue minus retail-cost-times-quantity, rolled up
    per supplier nation and order year across a 5-way join with a
    part-name LIKE filter. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q9", _Q9)


@query("q_tpch_q11", oracle=_Q11)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock, fixture-adapted): per-part value
    from a 3-nation supplier group must clear a fraction of the SAME
    aggregate computed globally — the group-vs-global-scalar HAVING
    threshold, kept integer-exact by multiplying the group side by 500
    instead of dividing the global side. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q11", _Q11)


@query("q_tpch_q12", oracle=_Q12)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping-mode priority, fixture-adapted): lineitems
    shipped >30 days after ordering in one year, bucketed by return
    flag (the fixture's mode surrogate), counting high- vs low-priority
    orders via dual conditional sums. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q12", _Q12)


@query("q_tpch_q16", oracle=_Q16)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (part-supplier relationship count, fixture-adapted):
    COUNT(DISTINCT supplier) per brand/type/size over the DISTINCT
    lineitem-derived relationship, excluding suppliers from a NOT IN
    subquery (negative account balance as the complaint surrogate).
    The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q16", _Q16)


@query("q_tpch_q20", oracle=_Q20)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion, fixture-adapted): the
    nested-IN-over-aggregate — suppliers IN (grouped lineitem aggregate
    WHERE its qty clears a CORRELATED per-part scalar total), parts
    pre-filtered by name via another IN. Three subquery levels, kept
    integer-exact with a x5 compare. The SAME SQL text is the
    oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q20", _Q20)


@query("q_tpch_q21", oracle=_Q21)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting, fixture-adapted):
    for finished orders, the supplier who shipped late (>60-day lag as
    the receipt>commit surrogate) while SOME other supplier fed the
    same order (EXISTS → semi-join) and NO other supplier was also late
    (NOT EXISTS → anti-join) — the multi-way semi/anti decorrelation
    stack. The SAME SQL text is the oracle."""
    return _run_sql(spark, sf_dir, "q_tpch_q21", _Q21)
