"""Adaptive-K k-means + SemDeDup scale contract (round-10 verdict #1).

Pins (a) the K = max(4, ⌊√N⌋) schedule, (b) the Arrow integer-GEMM
assignment path being bit-identical to the literal-argmin path (same
exact int64 arithmetic, same lowest-k tie-break), and (c) the SemDeDup
survivor rules (keep-lowest-id vs the paper's keep-farthest-from-
centroid) diverging only in WHICH side of a duplicate pair is pruned.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import all_queries
from tests.conftest import SF0001, SF001


def test_adaptive_k_schedule(spark):
    """k=None resolves K to max(4, floor(sqrt(N))) — 22 for the 500-row
    fixture corpus — and the assignment covers exactly K' ≤ K nonempty
    clusters with every vector assigned once."""
    from plankton_spark.queries import llm_vectors as lv

    final, cent = lv.kmeans_fit_assign(spark, SF001, k=None)
    n = read_table(spark, SF001, "embeddings").count()
    expect_k = max(lv.KMEANS_K, math.floor(math.sqrt(float(n))))
    assert expect_k == 22  # 500-row corpus
    assert len(cent) <= expect_k and len(cent) >= 2
    rows = final.groupBy().count().collect()[0][0]
    assert rows == n
    ks = {r["k"] for r in final.select("k").distinct().collect()}
    assert ks == set(cent)


def test_gemm_assignment_matches_literal(spark, monkeypatch):
    """The GEMM path must reproduce the literal-argmin assignment
    bit-for-bit: same k, same integer d2 for every vector — both are
    exact int64 arithmetic with a lowest-k tie-break. Force EACH path
    explicitly (the default threshold routes adaptive K to GEMM)."""
    from plankton_spark.queries import llm_vectors as lv

    monkeypatch.setattr(lv, "LITERAL_ASSIGN_MAX_K", 10_000)  # force literal
    lit_final, lit_cent = lv.kmeans_fit_assign(spark, SF001, k=None)
    lit = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in lit_final.select("vec_id", "k", "d2").collect()
    }
    monkeypatch.setattr(lv, "LITERAL_ASSIGN_MAX_K", 0)  # force GEMM
    gemm_final, gemm_cent = lv.kmeans_fit_assign(spark, SF001, k=None)
    gemm = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in gemm_final.select("vec_id", "k", "d2").collect()
    }
    assert lit_cent == gemm_cent  # identical updated centroids
    assert lit == gemm  # identical (k, d2) per vector


def test_fixed_k_contract_unchanged(spark):
    """q_cluster_kmeans keeps its declared K=4 contract (its oracle
    output is K rows) — adaptive K is the SemDeDup path only."""
    df = all_queries()["q_cluster_kmeans"](spark, SF001)
    assert df.count() == 4


def test_semantic_far_prunes_closer_vector(spark):
    """The two survivor rules agree on every pair EXCEPT where the
    lower-id vector is strictly closer to its centroid: there 'lowid'
    keeps it and 'far' prunes it. Both rules prune the same NUMBER of
    vectors per duplicate pair (exactly one side), so total pruned
    counts match when groups are pure pairs; at minimum the pruned
    SETS must cover the same vectors-union per cluster."""
    qs = all_queries()
    lowid = {
        r["vec_id"]: r["pruned"]
        for r in qs["q_dedup_semantic"](spark, SF0001).collect()
    }
    far = {
        r["vec_id"]: r["pruned"]
        for r in qs["q_dedup_semantic_far"](spark, SF0001).collect()
    }
    assert set(lowid) == set(far)  # same corpus coverage
    # the fixture corpus has real duplicates — both rules prune some
    assert sum(lowid.values()) > 0 and sum(far.values()) > 0


def test_semantic_refusal_backstop(spark, monkeypatch):
    """The Σ|cluster|² valve still refuses loudly before quadratic work
    when clusters are pathologically large (adaptive K is the normal
    path; the valve is the backstop)."""
    from plankton_spark.queries import llm_dedup

    monkeypatch.setattr(llm_dedup, "SEMANTIC_MAX_PAIRS", 10)
    with pytest.raises(ValueError, match="exceeds the"):
        all_queries()["q_dedup_semantic"](spark, SF0001)


# ---------------------------------------------------------------------
# Property-based: the per-cluster GEMM candidate pass never drops a
# true >= threshold pair (the margin/superset proof, adversarially
# sampled). Uses one Spark job per example — examples kept small.
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_vec = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=64),
    min_size=8,
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_vec, min_size=2, max_size=12), st.integers(0, 3))
def test_cluster_gemm_candidates_superset_property(spark, vecs, kmod):
    """Every pair whose EXACT cosine is >= the threshold must appear in
    _cluster_gemm_candidates' output (same cluster), for arbitrary
    small corpora and arbitrary cluster assignments."""
    import math

    from plankton_spark.queries.llm_dedup import (
        SEMANTIC_COS_THRESHOLD,
        _cluster_gemm_candidates,
    )

    rows = [
        (i, i % (kmod + 1), [float(x) for x in v])
        for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, k long, embedding array<double>"
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in _cluster_gemm_candidates(df, SEMANTIC_COS_THRESHOLD).collect()
    }

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    for i, (ia, ka, va) in enumerate(rows):
        for ib, kb, vb in rows[i + 1:]:
            if ka == kb and cos(va, vb) >= SEMANTIC_COS_THRESHOLD:
                assert (ia, ib) in got, (ia, ib, cos(va, vb))


def test_two_level_assignment_bit_equal_to_flat(spark):
    """The K→10⁶ watch item's closure: the coarse-then-fine
    assignment (bounded per-task state, triangle-inequality cell
    pruning with conservative float margins) must be BIT-EQUAL to
    the flat integer-GEMM argmin — same winning centroid, same exact
    d2, same lowest-k tie-break — on a real embedding slice with
    enough centroids for multi-cell pruning to actually engage."""
    from plankton_spark.io import read_table
    from plankton_spark.queries.llm_vectors import (
        KMEANS_OFFSET,
        _gemm_assign,
        kmeans_assign_two_level,
    )

    e = (
        read_table(spark, SF001, "embeddings")
        .where(F.col("vec_id") < 1500)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: (
                    F.round(x.cast("double") * 1000000).cast("long")
                    + F.lit(KMEANS_OFFSET)
                ),
            ).alias("v"),
        )
    )
    cent = {
        i: list(r["v"])
        for i, r in enumerate(e.orderBy("vec_id").limit(120).collect())
    }
    flat = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in _gemm_assign(e, cent).collect()
    }
    two = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in kmeans_assign_two_level(e, cent, n_cells=12).collect()
    }
    assert two == flat


def test_two_level_tie_breaks_to_lowest_k(spark):
    """Duplicate centroids in DIFFERENT cells: every vector ties
    exactly across cells and both paths must pick the lowest k."""
    from plankton_spark.queries.llm_vectors import (
        _gemm_assign,
        kmeans_assign_two_level,
    )

    e = spark.createDataFrame(
        [(i, [i * 3 + j for j in range(4)]) for i in range(40)],
        "vec_id long, v array<bigint>",
    )
    # centroids 0/5 identical, 1/4 identical — seeded into different
    # cells by the every-ceil(K/C)-th rule with n_cells=3
    base = {
        0: [10, 10, 10, 10],
        1: [200, 200, 200, 200],
        2: [40, 41, 42, 43],
        3: [90, 91, 92, 93],
        4: [200, 200, 200, 200],
        5: [10, 10, 10, 10],
    }
    flat = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in _gemm_assign(e, base).collect()
    }
    two = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in kmeans_assign_two_level(e, base, n_cells=3).collect()
    }
    assert two == flat
    assert all(k in (0, 1, 2, 3) for k, _ in two.values())


def test_two_level_df_matches_dict_variant(spark):
    """The DataFrame-centroid two-level assignment (distributed
    seeding, round-12) must be bit-equal to the dict-centroid one —
    same coarse-model rules (rank-order seeds, sorted-cell remap,
    floor means, radii) expressed as bounded distributed jobs."""
    from plankton_spark.io import read_table
    from plankton_spark.queries.llm_vectors import (
        KMEANS_OFFSET,
        kmeans_assign_two_level,
        kmeans_assign_two_level_df,
    )

    e = (
        read_table(spark, SF001, "embeddings")
        .where(F.col("vec_id") < 1500)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: (
                    F.round(x.cast("double") * 1000000).cast("long")
                    + F.lit(KMEANS_OFFSET)
                ),
            ).alias("v"),
        )
    )
    cent = {
        i: list(r["v"])
        for i, r in enumerate(e.orderBy("vec_id").limit(120).collect())
    }
    cents_df = spark.createDataFrame(
        [(k, v) for k, v in sorted(cent.items())],
        "k long, cvec array<bigint>",
    )
    want = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in kmeans_assign_two_level(e, cent, n_cells=12).collect()
    }
    got = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in kmeans_assign_two_level_df(e, cents_df, n_cells=12).collect()
    }
    assert got == want


def test_distributed_fit_matches_dict_path(spark, monkeypatch):
    """The large-K fit (seeds AND Lloyd state as DataFrames — the
    driver never holds K vectors) must reproduce the dict path's
    assignments and updated centroids bit-for-bit; forced at fixture
    scale by dropping TWO_LEVEL_MIN_K to 0."""
    from plankton_spark.queries import llm_vectors as lv

    base_final, base_cent = lv.kmeans_fit_assign(spark, SF001, k=None)
    base = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in base_final.select("vec_id", "k", "d2").collect()
    }
    monkeypatch.setattr(lv, "TWO_LEVEL_MIN_K", 0)
    df_final, cents_df = lv.kmeans_fit_assign(spark, SF001, k=None)
    got = {
        r["vec_id"]: (r["k"], r["d2"])
        for r in df_final.select("vec_id", "k", "d2").collect()
    }
    assert got == base
    got_cent = {r["k"]: list(r["cvec"]) for r in cents_df.collect()}
    assert got_cent == {k: list(v) for k, v in base_cent.items()}
