"""Stats-driven CBO join reorder (round-8 verdict #3): with catalog
tables carrying ANALYZE TABLE stats and the get_spark session confs
(cbo.enabled + cbo.joinReorder.enabled), Catalyst must REORDER a
deliberately badly-ordered multi-join — and stop reordering when the
stats aren't there. This is the assertion that fails if stats stop
driving join order."""

from __future__ import annotations

import os
import re

import pytest

from plankton_spark import catalog

SF001 = "/root/testdata/sf0.01"

# syntactically BAD order: fact x fact first (lineitem against orders),
# selective dimension filter (customer acctbal) last — a cost-blind
# planner keeps the written order; stats make orders x customer first
# (selective) then lineitem the obvious plan
_BAD_ORDER_SQL = """
SELECT COUNT(*) AS n FROM cbo_lineitem
JOIN cbo_orders ON l_orderkey = o_orderkey
JOIN cbo_customer ON o_custkey = c_custkey
WHERE c_acctbal > 9900
"""


def _relation_order(spark) -> list[str]:
    plan = (
        spark.sql(_BAD_ORDER_SQL)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    return re.findall(r"cbo_(\w+)", plan)


@pytest.fixture()
def cbo_tables(spark):
    for t in ("customer", "orders", "lineitem"):
        catalog.register(
            spark, f"cbo_{t}", os.path.join(SF001, f"{t}.parquet"), "parquet"
        )
    yield
    for t in ("customer", "orders", "lineitem"):
        catalog.unregister(spark, f"cbo_{t}")


def test_session_has_cbo_on(spark):
    assert spark.conf.get("spark.sql.cbo.enabled") == "true"
    assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"


def test_stats_drive_join_reorder(spark, cbo_tables):
    # without stats: the written (bad) order survives
    no_stats = _relation_order(spark)
    assert no_stats == ["lineitem", "orders", "customer"], no_stats

    for t in ("customer", "orders", "lineitem"):
        catalog.analyze(spark, f"cbo_{t}")

    with_stats = _relation_order(spark)
    assert with_stats != no_stats, "stats present but join order unchanged"
    # the selective orders x customer pair must join before the
    # lineitem fact is touched
    assert with_stats.index("lineitem") == 2, with_stats


def test_reorder_preserves_answer(spark, cbo_tables):
    for t in ("customer", "orders", "lineitem"):
        catalog.analyze(spark, f"cbo_{t}")
    n_cbo = spark.sql(_BAD_ORDER_SQL).collect()[0]["n"]
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    try:
        n_plain = spark.sql(_BAD_ORDER_SQL).collect()[0]["n"]
    finally:
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    assert n_cbo == n_plain
