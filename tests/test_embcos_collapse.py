"""q_dedup_embcos duplicate-collapse pipeline: the collapsed path
(unique-vector GEMM + membership expansion) must produce EXACTLY the
same pairs and cosines as the uncollapsed two-phase path on a
duplicate-heavy corpus — the sf10 soak shape (100 identical copies of
every vector) scaled down."""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.queries.llm_dedup import (
    collapse_duplicate_vectors,
    embcos_pairs,
    gemm_candidates,
    rescore_pairs_exact,
)

SF0001 = "/root/testdata/sf0.001"
THRESHOLD = 0.4
N_COPIES = 3


def _duplicated_corpus(spark):
    """sf0.001 embeddings (500 vectors) x 3 key-shifted copies —
    every vector has 2 byte-identical twins, mirroring the sf10
    duplicate-heavy soak corpus."""
    base = read_table(spark, SF0001, "embeddings").select("vec_id", "embedding")
    copies = [
        base.select((F.col("vec_id") + F.lit(k * 100_000)).alias("vec_id"), "embedding")
        for k in range(N_COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def test_collapse_groups_identical_vectors(spark):
    e = _duplicated_corpus(spark)
    members, uniq = collapse_duplicate_vectors(e)
    assert uniq.count() == 500
    sizes = members.groupBy("rep_id").count().select("count").distinct().collect()
    assert [r["count"] for r in sizes] == [N_COPIES]
    # representative is the min vec_id of its group — i.e. a base id
    assert members.where(F.col("rep_id") >= 100_000).count() == 0


def test_collapsed_pipeline_matches_uncollapsed_exactly(spark):
    e = _duplicated_corpus(spark)
    collapsed = embcos_pairs(spark, e, THRESHOLD).select(
        "vec_a", "vec_b", "cosine"
    )
    direct = (
        rescore_pairs_exact(e, gemm_candidates(spark, e, THRESHOLD))
        .where(F.col("cosine") >= THRESHOLD)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )
    c_rows = {(r.vec_a, r.vec_b): r.cosine for r in collapsed.collect()}
    d_rows = {(r.vec_a, r.vec_b): r.cosine for r in direct.collect()}
    assert set(c_rows) == set(d_rows), (
        f"pair sets differ: only-collapsed={sorted(set(c_rows) - set(d_rows))[:5]} "
        f"only-direct={sorted(set(d_rows) - set(c_rows))[:5]}"
    )
    assert c_rows == d_rows  # bit-identical rounded cosines
    # sanity on the structure: with 66 base pairs >= 0.4 and 3 copies,
    # cross-group pairs are 66*9 and intra-group pairs 500*3 (C(3,2))
    assert len(c_rows) == 66 * N_COPIES * N_COPIES + 500 * 3


def test_intra_group_pairs_score_exactly_one(spark):
    e = _duplicated_corpus(spark)
    pairs = embcos_pairs(spark, e, THRESHOLD)
    # twins of the same base vector differ by a multiple of 100_000
    intra = pairs.where(
        (F.col("vec_b") - F.col("vec_a")) % 100_000 == 0
    )
    bad = intra.where(F.col("cosine") != 1.0).count()
    assert bad == 0


def test_null_embeddings_survive_collapse(spark):
    """groupBy buckets NULL embeddings into one group but a plain
    equi-join would DROP those rows (NULL != NULL) — the null-safe
    join-back must keep them with a rep (r7 review #6)."""
    from plankton_spark.queries.llm_dedup import collapse_duplicate_vectors

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0, 2.0]), (4, None)],
        "vec_id long, embedding array<float>",
    )
    members, uniq = collapse_duplicate_vectors(df)
    rows = {r.vec_id: r.rep_id for r in members.collect()}
    assert rows == {1: 1, 2: 2, 3: 1, 4: 2}
    assert sorted(r.vec_id for r in uniq.collect()) == [1, 2]


def test_embcos_unique_ceiling_refuses(spark):
    """Past the declared unique-count ceiling the exact pipeline must
    refuse loudly (pointing at the approx paths), not launch O(U²)."""
    import pytest

    from plankton_spark.queries.llm_dedup import embcos_pairs

    e = read_table(spark, SF0001, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="q_knn_lsh"):
        embcos_pairs(spark, e, 0.4, max_uniques=1)


def test_embcos_within_ceiling_runs(spark):
    """At or under the ceiling the exact path runs normally."""
    from plankton_spark.queries.llm_dedup import embcos_pairs

    e = read_table(spark, SF0001, "embeddings").select("vec_id", "embedding")
    out = embcos_pairs(spark, e, 0.4, max_uniques=1_000)
    assert out.columns == ["vec_a", "vec_b", "cosine"]
    out.collect()  # executes the full three-phase pipeline


def test_semantic_dedup_ceiling_refuses(spark, monkeypatch):
    """q_dedup_semantic's refusal contract: when the k-means clusters
    imply more within-cluster pair evaluations than the declared
    ceiling, it must refuse BEFORE any quadratic work (the embcos
    EMBCOS_MAX_UNIQUES pattern) — the fix at scale is more clusters
    or the approximate paths."""
    import pytest

    from plankton_spark.queries import llm_dedup
    from plankton_spark.registry import all_queries

    monkeypatch.setattr(llm_dedup, "SEMANTIC_MAX_PAIRS", 10)
    with pytest.raises(ValueError, match="exceeds the"):
        all_queries()["q_dedup_semantic"](spark, "/root/testdata/sf0.001")


def test_gemm_topk_checkpoint_threshold_switch(spark, monkeypatch):
    """Round-13: the blocked-GEMM survivor frame checkpoints past
    GEMM_TOPK_CHECKPOINT_MIN_ROWS (code, not prose) — and the switch
    is RESULT-INVISIBLE: candidate pairs bit-equal on both sides of
    the threshold, with the checkpoint observably taken only above
    it."""
    from pyspark.sql.classic.dataframe import DataFrame

    from plankton_spark.io import read_table
    from plankton_spark.queries import llm_vectors as lv

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    calls = []
    orig = DataFrame.localCheckpoint

    def spy(self, eager=True):
        calls.append(eager)
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)

    monkeypatch.setattr(lv, "GEMM_TOPK_CHECKPOINT_MIN_ROWS", 1 << 60)
    below = sorted(
        map(tuple, lv._gemm_topk_candidates(spark, e, 10, 5).collect())
    )
    assert calls == []  # below threshold: no checkpoint job

    monkeypatch.setattr(lv, "GEMM_TOPK_CHECKPOINT_MIN_ROWS", 0)
    above = sorted(
        map(tuple, lv._gemm_topk_candidates(spark, e, 10, 5).collect())
    )
    assert calls == [True]  # above: exactly one eager checkpoint
    assert below == above  # bit-equal candidates either way
