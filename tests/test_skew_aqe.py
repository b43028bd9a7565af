"""AQE skew-join demonstration (SURVEY.md §4.2 — "AQE: skew-join
split" as a key 100 TB lever).

A hot key is the canonical scale failure: one shuffle partition gets
~all the rows and a single task runs for hours while 999 executors
idle. Spark's adaptive skew-join split (OptimizeSkewedJoin) detects
the oversized partition at the shuffle-stage boundary and splits it
across tasks — no salting code needed when AQE can see the skew.

This test manufactures a hot key, lowers the skew thresholds so the
local fixture sizes trip the same code path a 100 TB run would, and
asserts (a) the executed plan actually took the skew-split branch
(`skew=true` on the sort-merge join) and (b) results are identical to
the non-adaptive plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local-scale equivalents of the 100 TB defaults (256m/5x): any
    # shuffle partition > 64k and > 2x median is considered skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    # force a shuffle join: broadcast would hide the skew entirely
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # keep the post-shuffle coalescer from merging the probe side away
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
}


def _skewed_frames(spark):
    # fact: key 0 carries 200k rows, keys 1..49 carry 200 each
    hot = spark.range(200_000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(10_000).select(
        (F.col("id") % 49 + 1).alias("k"), (F.col("id") % 89).cast("double").alias("v")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return fact, dim


def _with_confs(spark, confs):
    saved = {}
    for key, val in confs.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, val)
    return saved


def _restore_confs(spark, saved):
    for key, val in saved.items():
        if val is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val)


def test_aqe_splits_skewed_join_partition(spark):
    saved = _with_confs(spark, SKEW_CONFS)
    try:
        fact, dim = _skewed_frames(spark)
        joined = fact.join(dim, "k").groupBy("name").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)")).alias("sv"),
        )
        rows = {r["name"]: (r["n"], r["sv"]) for r in joined.collect()}
        # (a) the adaptive plan really split the hot partition
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # (b) value-identical to the non-adaptive execution
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plain = fact.join(dim, "k").groupBy("name").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)")).alias("sv"),
        )
        assert {r["name"]: (r["n"], r["sv"]) for r in plain.collect()} == rows
        assert rows["name_0"][0] == 200_000
    finally:
        _restore_confs(spark, saved)


BLOOM_CONFS = {
    # runtime bloom-filter join pruning: build a bloom filter from the
    # FILTERED small side and inject a might_contain() predicate on
    # the big side BEFORE its shuffle — at 100 TB this drops most of
    # the probe-side shuffle traffic for selective dim filters. Local
    # thresholds lowered so fixture sizes trip the same rule.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    # parquet-backed so the application side has a real scan size
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 97).alias("v")
    ).write.parquet(fact_p)
    spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    ).write.parquet(dim_p)
    saved = _with_confs(spark, BLOOM_CONFS)
    try:
        fact, dim = spark.read.parquet(fact_p), spark.read.parquet(dim_p)
        sel_dim = dim.where(F.col("k") < 10)  # selective dim filter
        joined = fact.join(sel_dim, "k").groupBy("name").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        rows = {r["name"]: r["n"] for r in joined.collect()}
        assert len(rows) == 10 and all(n == 200 for n in rows.values())
    finally:
        _restore_confs(spark, saved)


def test_lsh_bucket_skew_guard(spark):
    """Planted degenerate LSH bucket: 200 docs share one band signature
    (e.g. 200 near-empty boilerplate pages). Unguarded, the band
    self-join materializes all 200*200 = 40k pairs in ONE task — the
    shape that dies first at 100 TB. The guard must (a) keep the
    candidate set EXACTLY identical and (b) bound the per-cell pair
    count at ~cap^2."""
    from plankton_spark.queries.llm_dedup import _lsh_cells, lsh_band_candidates

    cap = 10
    rows = [(i, 0, 42) for i in range(200)] + [(1000 + i, 1, 7) for i in range(5)]
    band_rows = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_hash long"
    )

    # (a) exactness: every in-bucket pair, nothing else, each once
    cand = lsh_band_candidates(band_rows, cap=cap)
    got = [(r.doc_a, r.doc_b) for r in cand.collect()]
    expect = {(i, j) for i in range(200) for j in range(i + 1, 200)}
    expect |= {(1000 + i, 1000 + j) for i in range(5) for j in range(i + 1, 5)}
    assert len(got) == len(set(got)), "duplicate candidate pairs emitted"
    assert set(got) == expect

    # (b) bounded cells: the wide bucket is split ~20 ways; no grid
    # cell's A-side x B-side pair count may approach the 40k blowup
    side_a, side_b = _lsh_cells(band_rows, cap)
    keys = ["band_idx", "band_hash", "pa", "pb"]
    ca = side_a.groupBy(*keys).agg(F.count(F.lit(1)).alias("na"))
    cb = side_b.groupBy(*keys).agg(F.count(F.lit(1)).alias("nb"))
    cells = ca.join(cb, keys)
    worst_side, worst_pairs = cells.select(
        F.greatest(F.max("na"), F.max("nb")), F.max(F.col("na") * F.col("nb"))
    ).first()
    # expected sub-bucket width is cap (hash variance allows ~3x)
    assert worst_side <= 3 * cap, f"sub-bucket width {worst_side} > {3 * cap}"
    assert worst_pairs <= 9 * cap * cap, f"cell pair count {worst_pairs}"

    # narrow bucket degenerates to the plain join: single (0, 0) cell
    narrow = cells.where(F.col("band_idx") == 1).collect()
    assert [(c.pa, c.pb, c.na, c.nb) for c in narrow] == [(0, 0, 5, 5)]
