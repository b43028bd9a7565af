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


# --- round-8 continuation-2 properties -------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.decimals(
                allow_nan=False, allow_infinity=False,
                min_value=0, max_value=10**4, places=2,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 16),  # salt fan-out
)
@settings(deadline=None)
def test_salted_twophase_agg_is_lossless(rows, n_salt):
    """Pure-Python model of q_agg_skewsalt: splitting a group's rows
    across ANY salt assignment and merging exact partials equals the
    direct aggregate — decimal addition is associative+commutative."""
    direct: dict[int, Decimal] = {}
    for i, (k, v) in enumerate(rows):
        direct[k] = direct.get(k, Decimal(0)) + v
    partial: dict[tuple[int, int], Decimal] = {}
    for i, (k, v) in enumerate(rows):
        s = hash((i, k)) % n_salt
        partial[(k, s)] = partial.get((k, s), Decimal(0)) + v
    merged: dict[int, Decimal] = {}
    for (k, _s), v in partial.items():
        merged[k] = merged.get(k, Decimal(0)) + v
    assert merged == direct


@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=80),
    st.lists(st.integers(0, 9), min_size=1, max_size=80),
)
@settings(deadline=None)
def test_integer_tvd_bounds_and_extremes(a, b):
    """q_drift_tvd's integer cross-product formula: result in [0, 1],
    0 iff identical distributions, 1 iff disjoint supports."""
    ca = {x: a.count(x) for x in set(a)}
    cb = {x: b.count(x) for x in set(b)}
    ta, tb = len(a), len(b)
    num = sum(
        abs(ca.get(x, 0) * tb - cb.get(x, 0) * ta)
        for x in set(ca) | set(cb)
    )
    tvd = num / (2 * ta * tb)
    assert 0.0 <= tvd <= 1.0 + 1e-12
    same_dist = all(
        ca.get(x, 0) * tb == cb.get(x, 0) * ta for x in set(ca) | set(cb)
    )
    assert (tvd == 0.0) == same_dist
    if not set(ca) & set(cb):
        assert abs(tvd - 1.0) < 1e-12


@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.decimals(
                allow_nan=False, allow_infinity=False,
                min_value=0, max_value=10**4, places=2,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    st.data(),
)
@settings(deadline=None)
def test_ivm_retraction_merge_equals_recompute(rows, data):
    """q_ivm_agg's algebra: base agg + (insert/delete weighted delta)
    == full recompute, for ANY partition of changes — counts and
    exact sums form an abelian group under retraction."""
    n = len(rows)
    del_idx = set(
        data.draw(st.lists(st.integers(0, n - 1), max_size=n, unique=True))
    )
    inserts = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 30),
                st.decimals(
                    allow_nan=False, allow_infinity=False,
                    min_value=0, max_value=10**4, places=2,
                ),
            ),
            max_size=20,
        )
    )
    def agg(rs):
        out: dict[int, list] = {}
        for k, v in rs:
            e = out.setdefault(k, [0, Decimal(0)])
            e[0] += 1
            e[1] += v
        return {k: (c, s) for k, (c, s) in out.items() if c > 0}

    v2 = [r for i, r in enumerate(rows) if i not in del_idx] + inserts
    base = agg(rows)
    merged: dict[int, list] = {k: [c, s] for k, (c, s) in base.items()}
    for i in sorted(del_idx):
        k, v = rows[i]
        merged[k][0] -= 1
        merged[k][1] -= v
    for k, v in inserts:
        e = merged.setdefault(k, [0, Decimal(0)])
        e[0] += 1
        e[1] += v
    merged_clean = {k: (c, s) for k, (c, s) in merged.items() if c > 0}
    assert merged_clean == agg(v2)


@given(
    idx=st.lists(
        st.integers(min_value=0, max_value=(1 << 40)), max_size=400
    ),
)
@settings(max_examples=200, deadline=None)
def test_puffin_dv_blob_roundtrip_property(idx):
    """deletion-vector-v1 framing is lossless and canonical for ANY
    64-bit index set: encode → decode == sorted unique input, across
    bucket boundaries (values above 2^32 exercise multi-bucket
    portable roaring serialization)."""
    from plankton_spark.sources import puffin

    assert puffin.dv_blob_indexes(puffin.dv_blob(idx)) == sorted(set(idx))


@given(
    sets=st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 20), max_size=50),
        min_size=1,
        max_size=8,
    ),
    props=st.dictionaries(
        st.text(min_size=1, max_size=10), st.text(max_size=10), max_size=3
    ),
)
@settings(max_examples=50, deadline=None)
def test_puffin_file_roundtrip_property(tmp_path_factory, sets, props):
    """A Puffin file with N DV blobs round-trips: footer JSON
    preserves blob order/types/properties, every (offset, length)
    addresses exactly its own blob, and decode returns each input
    set."""
    from plankton_spark.sources import puffin

    path = str(tmp_path_factory.mktemp("puf") / "t.puffin")
    blobs = [
        {
            "type": "deletion-vector-v1",
            "data": puffin.dv_blob(s),
            "properties": {"cardinality": str(len(set(s)))},
        }
        for s in sets
    ]
    metas = puffin.write_puffin(path, blobs, properties=props)
    footer = puffin.read_footer(path)
    assert footer["properties"] == dict(props)
    assert len(footer["blobs"]) == len(sets)
    for meta, s in zip(metas, sets):
        assert puffin.dv_indexes(path, meta["offset"], meta["length"]) == sorted(set(s))
