"""Catalog registration as a declared query (SURVEY.md §2 round-9,
verdict #4): every table format the engine ships becomes a bare SQL
name via plankton_spark.catalog.register, and ONE spark.sql text
joins across all four — no read_* call at the query site.

The registered names: a parquet CATALOG table (external location,
native pushdown), and planktable / deltalog / iceberglog TEMP VIEWS
(snapshot-pinned at registration — see catalog.py's docstring for
the at-scale rationale)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from plankton_spark import catalog
from plankton_spark.io import read_table, table_path
from plankton_spark.queries.scans import _scratch
from plankton_spark.registry import query


@query(
    "q_catalog_table",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_orderkey < 2000
    )
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(li.cents) AS BIGINT) AS revenue_cents
    FROM li
    JOIN orders   ON li.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY n_name
    """,
)
def q_catalog_table(spark, sf_dir):
    """All four formats queried BY NAME in one SQL text: orders as a
    parquet catalog table, lineitem (keys < 2000) as a planktable
    view, customer as a deltalog view, nation as an iceberglog view —
    the engine-written logs round-trip through their own readers into
    Spark's name resolution, and a star join runs across the mix. The
    oracle recomputes from the raw fixtures, so a wrong registration
    (stale snapshot, wrong path, dropped rows) is a hash mismatch.

    Plan note: the parquet catalog table keeps native pushdown (the
    o_orderpriority filter reaches the scan); nation/customer views
    broadcast; the planktable view's file list was pinned at
    registration — exactly the analysis-time-resolution contract
    catalog.register documents."""
    from plankton_spark.sources.delta_log import DeltaLogWriter
    from plankton_spark.sources.iceberg_meta import IcebergWriter
    from plankton_spark.table_format import PlankTable

    # author the three format fixtures (idempotent per sf_dir)
    li_root = _scratch(sf_dir, "catalog_planktable_lineitem")
    if not os.path.isdir(os.path.join(li_root, "_plank_log")):
        shutil.rmtree(li_root, ignore_errors=True)
        PlankTable(spark, li_root).create(
            read_table(spark, sf_dir, "lineitem")
            .where(F.col("l_orderkey") < 2000)
            .select(
                "l_orderkey",
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .alias("cents"),
            )
        )
    cu_root = _scratch(sf_dir, "catalog_deltalog_customer")
    if not os.path.isdir(os.path.join(cu_root, "_delta_log")):
        shutil.rmtree(cu_root, ignore_errors=True)
        DeltaLogWriter(spark, cu_root).create(
            read_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            )
        )
    na_root = _scratch(sf_dir, "catalog_iceberglog_nation")
    if not os.path.isdir(os.path.join(na_root, "metadata")):
        shutil.rmtree(na_root, ignore_errors=True)
        IcebergWriter(spark, na_root).create(
            read_table(spark, sf_dir, "nation").select(
                "n_nationkey", "n_name"
            )
        )

    catalog.register(
        spark, "cat_orders", table_path(sf_dir, "orders"), "parquet"
    )
    catalog.register(spark, "cat_lineitem", li_root, "planktable")
    catalog.register(spark, "cat_customer", cu_root, "deltalog")
    catalog.register(spark, "cat_nation", na_root, "iceberglog")

    return spark.sql(
        """
        SELECT n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM cat_lineitem
        JOIN cat_orders   ON l_orderkey = o_orderkey
        JOIN cat_customer ON o_custkey = c_custkey
        JOIN cat_nation   ON c_nationkey = n_nationkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY n_name
        """
    )
