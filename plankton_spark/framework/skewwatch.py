"""Skew telemetry for the dedup/ANN operators (VERDICT r2 #9).

At 100 TB a skew regression (one LSH band-bucket or GEMM cell taking
a disproportionate share of rows) shows up as one straggler task, or
an OOM, long after CI went green on small data. These watchers make
key-width distributions a first-class CI metric: a single
`Observation`-instrumented action computes max / p50 / wide-key
counts for the operator's grouping keys, records them in the run
ledger, and a test asserts the guarded widths stay under their caps.

`Observation` (CollectMetrics) rides the SAME job that materializes
the width aggregate — no second pass over the data, and the metrics
are exact (unlike accumulators, observed metrics are
task-retry-safe)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from plankton_spark.framework.ledger import RunLedger


def key_width_skew(
    df: DataFrame,
    keys: list[str],
    *,
    op: str,
    ledger: RunLedger | None = None,
    cap: int | None = None,
) -> dict:
    """Materialize per-key widths of `df` grouped by `keys` and record
    {max_width, p50_width, n_keys, n_wide, cap} via observe().

    The width agg is partial-aggregated (one shuffled row per distinct
    key); the observation aggregates THOSE rows, so the whole check is
    one cheap job regardless of data size."""
    widths = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("w"))
    obs = Observation(f"skew:{op}")
    observed = widths.observe(
        obs,
        F.max("w").alias("max_width"),
        F.percentile_approx("w", 0.5).alias("p50_width"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("w") > (cap if cap is not None else 1 << 62)).cast("long")).alias(
            "n_wide"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    metrics = dict(obs.get)
    record = {
        "op": op,
        "kind": "skew_metrics",
        "keys": keys,
        "cap": cap,
        "state": "success",
        **metrics,
    }
    if cap is not None and metrics["max_width"] is not None:
        # post-guard cell width after an s-way split of a width-w key
        # is ceil(w / ceil(w/cap)) <= cap by construction
        record["max_guarded_width"] = min(metrics["max_width"], cap)
    if ledger is not None:
        ledger.append(record)
    return record


def lsh_bucket_skew(spark, sf_dir: str, ledger: RunLedger | None = None) -> dict:
    """Band-bucket width distribution for the MinHash-LSH dedup — the
    quantity the _lsh_cells sub-bucket guard bounds."""
    from plankton_spark.queries.llm_dedup import LSH_BUCKET_CAP, minhash_structures

    _, band_rows = minhash_structures(spark, sf_dir)
    return key_width_skew(
        band_rows,
        ["band_idx", "band_hash"],
        op="lsh_bucket_skew",
        ledger=ledger,
        cap=LSH_BUCKET_CAP,
    )


def gemm_cell_skew(spark, sf_dir: str, ledger: RunLedger | None = None) -> dict:
    """Rows per GEMM grid cell for the ANN candidate kernel. The base
    side is hash-blocked, so cell width ≈ n_rows / n_blocks; a skewed
    distribution here means the block hash degenerated."""
    from plankton_spark.io import read_table
    from plankton_spark.queries.llm_dedup import adaptive_gemm_blocks

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_blocks = adaptive_gemm_blocks(n)
    blocked = emb.select(
        F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).alias("pb")
    )
    # a healthy hash keeps every cell within 2x the ideal share
    cap = max(1, (2 * n) // n_blocks)
    return key_width_skew(
        blocked, ["pb"], op="gemm_cell_skew", ledger=ledger, cap=cap
    )


def span_bucket_skew(spark, sf_dir: str, ledger: RunLedger | None = None) -> dict:
    """Docs per duplicated span fingerprint — the join key of
    q_dedup_spans' self-join, whose fan-out is width² per bucket. A
    bucket wider than SPAN_STOP_CAP means boilerplate spans (license
    headers, nav chrome) slipped past the frequency cut and the
    stop-span drop must activate before the join."""
    from plankton_spark.queries.llm_dedup import SPAN_STOP_CAP, span_structures

    grams, dup = span_structures(spark, sf_dir)
    hot = grams.join(dup.select("g"), "g")
    return key_width_skew(
        hot, ["g"], op="span_bucket_skew", ledger=ledger, cap=SPAN_STOP_CAP
    )


def hh_candidate_skew(spark, sf_dir: str, ledger: RunLedger | None = None) -> dict:
    """Candidate-set telemetry for the heavy-hitter recount: the exact
    phase broadcasts the Misra-Gries candidates, so the quantity that
    must stay bounded is the NUMBER of candidates (n_keys ≤
    partitions × MG_CAPACITY by the MG eviction bound), not any one
    key's width — recount groups are map-side partial-aggregated, so
    a wide token costs nothing. cap here bounds per-token occurrences
    only loosely (the corpus size); the CI assertion is on n_keys."""
    from plankton_spark.queries.llm_text import MG_CAPACITY, hh_structures

    toks, candidates = hh_structures(spark, sf_dir)
    rec = key_width_skew(
        toks.join(F.broadcast(candidates), "tok"),
        ["tok"],
        op="hh_candidate_skew",
        ledger=ledger,
    )
    rec["candidate_budget"] = (
        toks.rdd.getNumPartitions() * MG_CAPACITY
    )
    return rec


def fuzzy_block_skew(spark, sf_dir: str, ledger: RunLedger | None = None) -> dict:
    """Rows per prefix block in the fuzzy match — the verify stage
    runs levenshtein over width² pairs per block, so a degenerate
    block key (every name in one bucket — the failure q_fuzzy_match's
    first draft measured at 60k pairs) must trip CI, not surface as a
    straggler at scale."""
    from plankton_spark.queries.llm_text import FUZZY_BLOCK_CAP, fuzzy_blocked

    blocked = fuzzy_blocked(spark, sf_dir)
    return key_width_skew(
        blocked, ["blk"], op="fuzzy_block_skew", ledger=ledger, cap=FUZZY_BLOCK_CAP
    )
