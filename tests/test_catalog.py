"""plankton_spark.catalog: SQL-name registration for all four table
formats — mechanism choice (catalog table vs temp view), snapshot
pinning semantics, time-travel kwargs, refusals, unregister."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from plankton_spark import catalog
from plankton_spark.table_format import PlankTable

SF0001 = "/root/testdata/sf0.001"


def _plank(spark, tmp_path, rows):
    root = str(tmp_path / "pt")
    t = PlankTable(spark, root)
    t.create(spark.createDataFrame(rows, "k long, v string"))
    return root, t


def test_parquet_catalog_table(spark, tmp_path):
    catalog.register(
        spark, "cat_t_orders", os.path.join(SF0001, "orders.parquet"), "parquet"
    )
    try:
        n = spark.sql("SELECT COUNT(*) AS n FROM cat_t_orders").collect()[0]["n"]
        assert n == spark.read.parquet(
            os.path.join(SF0001, "orders.parquet")
        ).count()
        # it's a real catalog table, not a view
        assert spark.catalog.tableExists("cat_t_orders")
    finally:
        catalog.unregister(spark, "cat_t_orders")
    assert not spark.catalog.tableExists("cat_t_orders")


def test_planktable_view_snapshot_pinned(spark, tmp_path):
    root, t = _plank(spark, tmp_path, [(1, "a"), (2, "b")])
    catalog.register(spark, "cat_t_pt", root, "planktable")
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_t_pt").collect()[0]["n"] == 2
    # commit AFTER registration: the view is snapshot-pinned
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_t_pt").collect()[0]["n"] == 2
    # re-register advances to current
    catalog.register(spark, "cat_t_pt", root, "planktable")
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_t_pt").collect()[0]["n"] == 3
    catalog.unregister(spark, "cat_t_pt")


def test_planktable_view_time_travel_kwarg(spark, tmp_path):
    root, t = _plank(spark, tmp_path, [(1, "a")])
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    catalog.register(spark, "cat_t_v0", root, "planktable", version=0)
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_t_v0").collect()[0]["n"] == 1
    catalog.unregister(spark, "cat_t_v0")


def test_register_returns_dataframe(spark, tmp_path):
    root, _ = _plank(spark, tmp_path, [(1, "a")])
    df = catalog.register(spark, "cat_t_df", root, "planktable")
    assert df.count() == 1
    catalog.unregister(spark, "cat_t_df")


def test_bad_name_and_format_refuse(spark, tmp_path):
    with pytest.raises(ValueError, match="identifier"):
        catalog.register(spark, "bad-name", "/x", "parquet")
    with pytest.raises(ValueError, match="unknown format"):
        catalog.register(spark, "t", "/x", "orc")
    with pytest.raises(ValueError, match="no kwargs"):
        catalog.register(spark, "t", "/x", "parquet", version=1)


def test_unregister_is_idempotent(spark):
    catalog.unregister(spark, "cat_never_registered")  # no raise


def test_register_path_with_quote(spark, tmp_path):
    """Review #5 regression: a single quote in the LOCATION path must
    be escaped, not break (or inject into) the CREATE statement."""
    import shutil

    src = os.path.join(SF0001, "nation.parquet")
    qdir = tmp_path / "o'brien"
    qdir.mkdir()
    shutil.copyfile(src, str(qdir / "nation.parquet"))
    catalog.register(spark, "cat_t_quote", str(qdir), "parquet")
    try:
        n = spark.sql("SELECT COUNT(*) AS n FROM cat_t_quote").collect()[0]["n"]
        assert n == spark.read.parquet(src).count()
    finally:
        catalog.unregister(spark, "cat_t_quote")


def test_analyze_rejects_bad_column_names(spark):
    with pytest.raises(ValueError, match="identifier"):
        catalog.analyze(spark, "whatever", columns=["a; DROP TABLE x"])


def test_refresh_follows_commits(spark, tmp_path):
    """round-9 verdict #5: refresh(name) re-resolves the format log at
    call time — a post-register commit stays invisible without it and
    becomes visible after it."""
    root, t = _plank(spark, tmp_path, [(1, "a"), (2, "b")])
    catalog.register(spark, "cat_t_rf", root, "planktable")
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_t_rf").collect()[0]["n"] == 2
    catalog.refresh(spark, "cat_t_rf")
    assert spark.sql("SELECT COUNT(*) AS n FROM cat_t_rf").collect()[0]["n"] == 3
    catalog.unregister(spark, "cat_t_rf")


def test_refresh_honors_time_travel_pin(spark, tmp_path):
    """An explicit version= pin survives refresh (re-resolving a
    time-travel registration is a no-op by construction)."""
    root, t = _plank(spark, tmp_path, [(1, "a")])
    catalog.register(spark, "cat_t_rfv0", root, "planktable", version=0)
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    catalog.refresh(spark, "cat_t_rfv0")
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM cat_t_rfv0").collect()[0]["n"] == 1
    )
    catalog.unregister(spark, "cat_t_rfv0")


def test_refresh_unregistered_refuses(spark):
    with pytest.raises(ValueError, match="not registered"):
        catalog.refresh(spark, "cat_t_never_registered")


def test_refresh_parquet_registration(spark, tmp_path):
    out = str(tmp_path / "pq")
    spark.createDataFrame([(1,)], "k long").write.parquet(out)
    catalog.register(spark, "cat_t_rfpq", out, "parquet")
    df = catalog.refresh(spark, "cat_t_rfpq")
    assert df.count() == 1
    catalog.unregister(spark, "cat_t_rfpq")


def test_reregister_format_flip_drops_shadowing_view(spark, tmp_path):
    """ADVICE r9 #4: a temp view from a prior view-format registration
    shadows a catalog table of the same name — re-registering as
    parquet must drop it (and the symmetric flip must drop the
    table)."""
    root, t = _plank(spark, tmp_path, [(1, "a"), (2, "b")])
    catalog.register(spark, "cat_t_flip", root, "planktable")
    out = str(tmp_path / "flip_pq")
    spark.createDataFrame([(10, "x"), (11, "y"), (12, "z")],
                          "k long, v string").write.parquet(out)
    catalog.register(spark, "cat_t_flip", out, "parquet")
    # resolves to the PARQUET table now, not the stale pinned view
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM cat_t_flip").collect()[0]["n"] == 3
    )
    assert spark.catalog.tableExists("cat_t_flip")
    # flip back to a view: the catalog table must not linger either
    catalog.register(spark, "cat_t_flip", root, "planktable")
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM cat_t_flip").collect()[0]["n"] == 2
    )
    catalog.unregister(spark, "cat_t_flip")
    assert not spark.catalog.tableExists("cat_t_flip")


def test_register_deltalog_with_row_ids_kwarg(spark, tmp_path):
    """Format-reader kwargs pass through registration: a row-tracked
    Delta table registered with with_row_ids=True exposes _row_id via
    SQL, and refresh() re-resolves with the same kwargs."""
    from plankton_spark.sources.delta_log import DeltaLogWriter

    root = str(tmp_path / "rt_cat")
    w = DeltaLogWriter(spark, root)
    w.create(
        spark.createDataFrame([(i, "a") for i in range(5)], "k long, v string"),
        row_tracking=True,
    )
    catalog.register(spark, "cat_t_rtids", root, "deltalog", with_row_ids=True)
    got = spark.sql(
        "SELECT MAX(_row_id) AS m FROM cat_t_rtids"
    ).collect()[0]["m"]
    assert got == 4
    w.append(spark.createDataFrame([(99, "z")], "k long, v string"))
    catalog.refresh(spark, "cat_t_rtids")
    got = spark.sql(
        "SELECT MAX(_row_id) AS m FROM cat_t_rtids"
    ).collect()[0]["m"]
    assert got == 5
    catalog.unregister(spark, "cat_t_rtids")
