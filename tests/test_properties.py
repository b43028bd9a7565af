"""Property-based invariants (SURVEY.md §5.2.5, hypothesis).

Pure-Python properties run per-example; Spark-backed properties use a
handful of generated frames (Spark jobs are too slow for hundreds of
hypothesis examples — the SQL semantics are already differentially
tested against DuckDB by the oracle gate)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from plankton_spark.framework import fingerprint

params = st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.one_of(st.integers(-1000, 1000), st.text(max_size=8), st.booleans(), st.none()),
    max_size=5,
)


@given(params)
@settings(deadline=None)
def test_fingerprint_is_stable_and_order_free(p):
    f1 = fingerprint("op", p)
    f2 = fingerprint("op", dict(reversed(list(p.items()))))
    assert f1 == f2
    assert len(f1) == 64


@given(params, params)
@settings(deadline=None)
def test_fingerprint_distinguishes_params(p1, p2):
    if p1 != p2:
        assert fingerprint("op", p1) != fingerprint("op", p2)


@given(st.lists(st.decimals(allow_nan=False, allow_infinity=False,
                            min_value=-10**6, max_value=10**6, places=2),
                min_size=1, max_size=50))
@settings(deadline=None)
def test_decimal_sum_is_order_insensitive(xs):
    """The determinism policy's foundation: decimal addition is exact,
    so any accumulation order gives the same result."""
    assert sum(xs, Decimal(0)) == sum(reversed(xs), Decimal(0))


@pytest.fixture(scope="module")
def small_frames(spark):
    rows = [(i, i % 7, float(i) / 3.0) for i in range(200)]
    a = spark.createDataFrame(rows, "id long, k long, v double")
    b = spark.createDataFrame(rows[::2], "id long, k long, v double")
    return a, b


def test_union_all_counts_add(spark, small_frames):
    a, b = small_frames
    assert a.unionByName(b).count() == a.count() + b.count()


def test_intersect_within_both(spark, small_frames):
    a, b = small_frames
    inter = a.intersect(b)
    assert inter.count() <= min(a.count(), b.count())
    assert inter.exceptAll(a).count() == 0
    assert inter.exceptAll(b).count() == 0


def test_except_union_partition(spark, small_frames):
    """a = (a EXCEPT ALL b) ⊎ (a INTERSECT ALL b) as multisets."""
    a, b = small_frames
    left = a.exceptAll(b).count() + a.intersectAll(b).count()
    assert left == a.count()


def test_topk_is_subset_of_sort(spark, small_frames):
    a, _ = small_frames
    topk = a.orderBy(F.col("v").desc(), "id").limit(10)
    full = a.orderBy(F.col("v").desc(), "id").collect()
    assert [r["id"] for r in topk.collect()] == [r["id"] for r in full[:10]]


def test_dedup_idempotent(spark, small_frames):
    a, _ = small_frames
    d1 = a.select("k").distinct()
    assert d1.distinct().count() == d1.count()


def test_window_topk_matches_groupby_max(spark, small_frames):
    from pyspark.sql import Window

    a, _ = small_frames
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), "id")
    top1 = (
        a.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("k", "v")
    )
    mx = a.groupBy("k").agg(F.max("v").alias("v"))
    assert sorted(map(tuple, top1.collect())) == sorted(map(tuple, mx.collect()))
