"""Round-13 optimization internals: each change must be value-identical
to the formulation it replaced (the driver re-hashes every declared
query, so these pins are the fast local tripwire).

Covers: io.table_rows (footer count == count job), io.read_table
resolved-relation reuse (same handle, same data, no result caching),
functions.lit_array (type- and value-identity vs the F.lit loop), and
the q_agg_pivot conditional-aggregation rewrite (value-identity vs the
.pivot() form it replaced).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.functions import lit_array
from plankton_spark.io import TABLES, read_table, table_rows
from tests.conftest import SF0001, SF001


def test_table_rows_matches_count_job(spark):
    for sf in (SF0001, SF001):
        for name in ("lineitem", "events", "embeddings"):
            assert table_rows(sf, name) == read_table(spark, sf, name).count()


def test_read_table_reuses_resolved_handle(spark):
    a = read_table(spark, SF0001, "orders")
    b = read_table(spark, SF0001, "orders")
    assert a is b  # one resolution per (session, path)
    # different sf dir → different handle (no cross-path aliasing)
    c = read_table(spark, SF001, "orders")
    assert c is not a
    # the handle is a plan, not a result: actions still scan parquet
    assert a.count() == table_rows(SF0001, "orders")
    assert set(a.columns) == {f.name for f in a.schema.fields}


def test_read_table_cache_covers_all_tables(spark):
    for name in TABLES:
        assert read_table(spark, SF0001, name) is read_table(
            spark, SF0001, name
        )


def test_lit_array_type_and_value_identity(spark):
    df = spark.range(1)
    cases = [
        ("ints", [1, -2, 2147483647], "array<int>"),
        ("longs", [1, 2**40, -(2**35)], "array<bigint>"),
        (
            "doubles",
            [0.1, -1e-30, 1e20, 2.5, 0.0, 123456.789012345, 1e-05],
            "array<double>",
        ),
    ]
    for label, vals, want_type in cases:
        old = F.array(*[F.lit(v) for v in vals])
        new = lit_array(vals)
        row = df.select(old.alias("o"), new.alias("n"))
        types = dict(row.dtypes)
        assert types["o"] == types["n"] == want_type, label
        got = row.collect()[0]
        assert list(got["o"]) == list(got["n"]), label


def test_lit_array_nested_matches_flit_nesting(spark):
    vals = [[0.1, 2.0, -3.5], [1e-5, 7.25, 0.0]]
    old = F.array(*[F.array(*[F.lit(v) for v in p]) for p in vals])
    new = lit_array(vals)
    row = spark.range(1).select(old.alias("o"), new.alias("n"))
    types = dict(row.dtypes)
    assert types["o"] == types["n"] == "array<array<double>>"
    got = row.collect()[0]
    assert [list(x) for x in got["o"]] == [list(x) for x in got["n"]]


def test_agg_pivot_matches_pivot_form(spark):
    """The conditional-aggregation rewrite must reproduce the .pivot()
    plan's values bit-for-bit (including the missing-category → 0 and
    decimal-sum rounding paths)."""
    from plankton_spark.queries.aggregations import EVENT_TYPES
    from plankton_spark.registry import all_queries

    new = all_queries()["q_agg_pivot"](spark, SF0001)
    e = read_table(spark, SF0001, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(18,4)")))
    )
    cols = [F.col("user_id")] + [
        F.round(F.coalesce(F.col(t), F.lit(0)).cast("double"), 4).alias(t)
        for t in EVENT_TYPES
    ]
    old = pivoted.select(*cols)
    assert new.schema == old.schema
    key = lambda r: r["user_id"]  # noqa: E731
    assert sorted(new.collect(), key=key) == sorted(old.collect(), key=key)


def test_agg_pivot_single_exchange(spark):
    from plankton_spark.registry import all_queries

    df = all_queries()["q_agg_pivot"](spark, SF0001)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("+- Exchange") + plan.count(": Exchange") == 1, plan
