"""Join operators (SURVEY.md §2.3).

Physical strategy is Catalyst's call (sort-merge by default, AQE may
switch to broadcast at runtime); q_join_broadcast pins the broadcast
path explicitly because every dimension table here is far below the
broadcast threshold — at 100 TB, dims like nation/region/part-subset
must never shuffle the fact side.

The as-of join is implemented the scale-correct way: union both
sides on (key, time) and carry the latest order forward with
last(ignorenulls) over a time-ordered window — one shuffle by key,
zero row blowup, instead of the naive condition-join + filter whose
intermediate is |events| x |orders-per-key|.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.functions import D2_MONEY, dsum, sql_sum
from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_join_inner",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_sum('o_totalprice', 'revenue')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark, sf_dir):
    """Inner equi-join fact→dim, aggregated per segment."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # narrow money image (functions.D2_MONEY): o_totalprice is
            # 2-decimal < 10^6, so the sum buffer compacts to a long
            # with a bit-identical result (optimization round 13)
            dsum(F.col("o_totalprice"), "revenue", dec=D2_MONEY),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark, sf_dir):
    """LEFT OUTER: customers kept even with zero orders."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_right",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def q_join_right(spark, sf_dir):
    """RIGHT OUTER mirror of q_join_left."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_full",
    oracle="""
    WITH big_nations AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
      FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 50
    ), west AS (
      SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 1
    )
    SELECT
      COALESCE(n_nationkey, nationkey) AS nationkey,
      n_name,
      n_cust
    FROM west FULL OUTER JOIN big_nations ON n_nationkey = nationkey
    """,
)
def q_join_full(spark, sf_dir):
    """FULL OUTER with key coalescing (both unmatched sides survive)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    big = (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .where(F.col("n_cust") > 50)
    )
    west = n.where(F.col("n_regionkey") <= 1).select("n_nationkey", "n_name")
    j = west.join(big, west.n_nationkey == big.nationkey, "full")
    return j.select(
        F.coalesce("n_nationkey", "nationkey").alias("nationkey"),
        "n_name",
        "n_cust",
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def q_join_semi(spark, sf_dir):
    """LEFT SEMI: customers with >=1 urgent order (no fact columns leak)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark, sf_dir):
    """LEFT ANTI: customers with no orders at all."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark, sf_dir):
    """Explicit cartesian product (5 x 25)."""
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {sql_sum('l_extendedprice', 'revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Fact ⋈ broadcast(dim): pins BroadcastHashJoin — the 100 TB shape
    (the fact side never shuffles; dim ships to every executor once)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # narrow money image — see q_join_inner's note
            dsum(F.col("l_extendedprice"), "revenue", dec=D2_MONEY),
        )
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT n_name, COUNT(*) AS n_pairs
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def q_join_theta(spark, sf_dir):
    """Non-equi (theta) condition riding on an equi key: Catalyst uses
    the equi part for the shuffle and applies the inequality post-match,
    so this stays a hash/merge join, not a nested loop."""
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    j = s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
    ).join(n, F.col("n_nationkey") == s.s_nationkey)
    return j.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "q_join_range",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_lines
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderstatus
    """,
)
def q_join_range(spark, sf_dir):
    """Equi + time-range join: lineitems shipped within 30 days of the
    order date. The equi key carries the shuffle; the range predicate
    filters post-match."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT event_id, o_orderkey AS asof_orderkey
    FROM (
      SELECT e.event_id, o.o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey % 15 = e.user_id AND o.o_orderdate <= e.ts
    )
    WHERE rn = 1
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: latest order (by o_orderdate, tie-broken by key desc)
    at or before each event, per derived key user_id = o_custkey % 15.

    Spark has no native ASOF JOIN; the scalable plan is the
    union-and-carry-forward trick: tag both sides, union on
    (key, time), sort within key, and carry the last-seen order id
    forward with last(ignorenulls). One shuffle, no pair blowup.
    """
    e = read_table(spark, sf_dir, "events")
    o = read_table(spark, sf_dir, "orders")
    orders_side = o.select(
        (F.col("o_custkey") % 15).alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),
        F.col("o_orderkey").alias("orderkey"),
        F.lit(None).cast("long").alias("event_id"),
    )
    events_side = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("orderkey"),
        "event_id",
    )
    # Order by (t, side, orderkey): at equal timestamps orders sort
    # before events (<=' semantics) and the largest orderkey wins ties.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = orders_side.unionByName(events_side)
    carried = u.withColumn("asof_orderkey", F.last("orderkey", ignorenulls=True).over(w))
    return (
        carried.where(F.col("side") == 1)
        .where(F.col("asof_orderkey").isNotNull())
        .select("event_id", "asof_orderkey")
    )


@query(
    "q_join_multikey",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, b.l_quantity
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    WHERE a.l_orderkey < 500
    """,
)
def q_join_multikey(spark, sf_dir):
    """Composite-key equi self-join (exactly 1:1 on the PK pair)."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(F.col("a.l_orderkey"), F.col("a.l_linenumber"), F.col("b.l_quantity"))


@query(
    "q_join_selfdedup",
    oracle="""
    SELECT a.n_regionkey, a.n_name AS name_a, b.n_name AS name_b
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey
                 AND a.n_nationkey < b.n_nationkey
    """,
)
def q_join_selfdedup(spark, sf_dir):
    """Unordered-pair self-join (a.key < b.key kills mirror duplicates)."""
    n = read_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_regionkey"),
        F.col("a.n_name").alias("name_a"),
        F.col("b.n_name").alias("name_b"),
    )


@query(
    "q_join_asof_tol",
    oracle="""
    WITH e2 AS (
      SELECT event_id, user_id, event_type,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2
      FROM events
    ),
    c AS (SELECT event_id, user_id, ts2 FROM e2 WHERE event_type = 'click'),
    err AS (SELECT user_id, ts2 FROM e2 WHERE event_type = 'error')
    SELECT c.event_id,
           CAST(EPOCH(c.ts2) - MAX(EPOCH(err.ts2)) AS BIGINT)
             AS secs_since_error
    FROM c
    JOIN err
      ON err.user_id = c.user_id
     AND err.ts2 <= c.ts2
     AND err.ts2 >= c.ts2 - INTERVAL 30 MINUTE
    GROUP BY c.event_id, c.ts2
    """,
)
def q_join_asof_tol(spark, sf_dir):
    """As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`):
    each click is matched to the SAME user's most recent error at or
    before it, and the match is dropped when that error is older than
    30 minutes — the ops-analytics "was this click within the blast
    radius of an error" primitive.

    Same scalable union-and-carry plan as q_join_asof (one shuffle on
    user_id, no pair blowup — the oracle's range join is the
    quadratic shape this plan avoids): tag both sides, sort within
    user by (time, side), carry the last error timestamp forward with
    last(ignorenulls), then apply the tolerance as a plain filter on
    the carried timestamp. Output is integer seconds — exact."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.date_trunc("second", "ts").alias("ts2"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("k"),
        F.col("ts2").alias("t"),
        F.lit(0).alias("side"),
        F.col("ts2").alias("err_t"),
        F.lit(None).cast("long").alias("event_id"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        F.col("ts2").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("err_t"),
        "event_id",
    )
    # (t, side): at equal timestamps the error sorts first (<= match)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "err_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = errors.unionByName(clicks).withColumn(
        "last_err", F.last("err_t", ignorenulls=True).over(w)
    )
    secs = F.unix_timestamp("t") - F.unix_timestamp("last_err")
    return (
        carried.where(F.col("side") == 1)
        .where(F.col("last_err").isNotNull())
        .where(secs <= 30 * 60)
        .select("event_id", secs.cast("long").alias("secs_since_error"))
    )


RANGE_BIN_W = 100_000  # bin width in cents for the blocked range join
RANGE_IV_SPAN = 50_000_000  # interval starts wrap inside [0, span)
RANGE_IV_LEN = 150_000  # interval length in cents


@query(
    "q_join_range_binned",
    oracle=f"""
    WITH iv AS (
      SELECT c_custkey,
             CAST((c_custkey * 37) % {RANGE_IV_SPAN} AS BIGINT) AS lo,
             CAST((c_custkey * 37) % {RANGE_IV_SPAN} + {RANGE_IV_LEN}
                  AS BIGINT) AS hi
      FROM customer
    ),
    o AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT iv.c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o.cents) AS BIGINT) AS total_cents
    FROM iv JOIN o ON o.cents >= iv.lo AND o.cents < iv.hi
    GROUP BY iv.c_custkey
    """,
)
def q_join_range_binned(spark, sf_dir):
    """PURE interval join (no equi key to ride on — the one join
    family where q_join_theta/q_join_range's equi-carries-the-shuffle
    pattern doesn't apply) made hash-joinable by BINNING (round-8
    verdict #9): per-customer price intervals of fixed length vs the
    orders price axis.

    Both sides bucket into fixed-width bins; an interval of length L
    covers ceil(L/W)+1 <= 3 bins (W=100k, L=150k), so the interval
    side explodes at most 3x and the join becomes an EQUI join on the
    bin id — shuffle-partitioned, AQE-skew-splittable — with the exact
    range predicate applied post-match. The plan must show a hash/
    merge join, never BroadcastNestedLoopJoin: with N orders and M
    customer intervals a BNL is O(N*M) over everything, while binning
    is output-proportional plus the 3x expansion. This is the calendar
    -bucket pattern for date intervals, on an exact integer axis.

    The oracle is the NAIVE inequality join — same answer, different
    plan, which is the whole claim."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % RANGE_IV_SPAN).cast("long").alias("lo"),
        (((F.col("c_custkey") * 37) % RANGE_IV_SPAN) + RANGE_IV_LEN)
        .cast("long")
        .alias("hi"),
    )
    iv = c.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"lo DIV {RANGE_BIN_W}"),
                F.expr(f"(hi - 1) DIV {RANGE_BIN_W}"),
            )
        ),
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .withColumn("bin", F.expr(f"cents DIV {RANGE_BIN_W}"))
    )
    j = o.join(iv, "bin").where(
        (F.col("cents") >= F.col("lo")) & (F.col("cents") < F.col("hi"))
    )
    return j.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
