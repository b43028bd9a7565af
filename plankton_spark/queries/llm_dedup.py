"""Deduplication operators (SURVEY.md §2.11 + north-star brief):
exact hash, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale design (the whole point of these):
- Exact dedup: one hash-groupBy — shuffles digests, not documents.
- MinHash-LSH: shingle→64 minhashes→8 bands of 8; candidate pairs
  come from tiny band-bucket self-joins instead of the O(n²)
  crossJoin. At 100 TB the candidate set is the only pairwise work.
  The DuckDB oracle *is* the O(n²) brute force — at sf0.01 LSH must
  reproduce it exactly (planted near-dups sit at J≈0.99, where the
  8×8 banding miss probability is ~4e-9; there are no pairs between
  J=0.1 and J=0.8 to create recall noise — verified in-session).
- SimHash: 16-bit signatures from per-token sha256 bits; bucket
  collisions are the candidate generator.
- Embedding cosine near-dup: exact-decimal dot products so Spark and
  the oracle agree bitwise; the LSH-bucketed variant lives in
  llm_vectors.q_knn_lsh.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from plankton_spark import cache
from plankton_spark.functions import driver_scalar, lit_array_sql
from plankton_spark.io import ensure_view, read_table
from plankton_spark.functions import round_ratio6
from plankton_spark.registry import query

N_PERM = 64
# Banding tuned for NEGLIGIBLE recall loss at the 0.8 verification
# threshold (round-13 sf1 soak finding: 8 bands x 8 rows missed 10 of
# 2,550 true pairs — per-pair miss (1-0.8^8)^8 ≈ 3.8% at s=0.8, so
# passing smaller fixtures was distribution luck, not a guarantee).
# 21 bands x 3 rows (63 of the 64 permutations): per-pair miss
# (1-s^3)^21 ≤ 3.1e-7 at s=0.8 — expected misses stay ≪1 through
# ~10^6 threshold-grazing pairs; candidate FPs only add verification
# work (the exact-Jaccard check keeps results identical). The LSH
# recall bound is probabilistic BY CONSTRUCTION; these parameters
# put the failure odds far below fixture scales rather than
# pretending exactness is structural.
N_BANDS = 21
ROWS_PER_BAND = 3
JACCARD_THRESHOLD = 0.8

# Skew guard for the LSH candidate self-join: a band bucket wider than
# this is grid-split into ceil(width/cap) sub-buckets so no single join
# task materializes more than ~cap^2 candidate pairs. 1024 keeps the
# worst task at ~1M pairs (~16 MB of id-pairs) regardless of corpus
# degeneracy — boilerplate-heavy web crawls routinely put 1e6+ docs in
# one bucket, which unguarded is 1e12 pairs in ONE task.
LSH_BUCKET_CAP = 1024


def _lsh_cells(band_rows, cap):
    """Sub-bucketed join sides for the LSH candidate self-join.

    Buckets with width <= cap keep n_sub=1 and degenerate to the plain
    (band_idx, band_hash) equi-join. Wider buckets get each doc a
    stable sub-bucket g = xxhash64(doc_id) mod n_sub, and the self-join
    becomes an upper-triangle grid of sub-bucket cells (the same
    decomposition as gemm_candidates): side A of cell (pa, pb) carries
    sub-bucket pa's docs, side B sub-bucket pb's, pa <= pb. Every
    unordered doc pair lands in exactly one cell (both orientations in
    a diagonal cell — the caller dedups), so the candidate set is
    IDENTICAL to the unguarded join; only the task granularity changes.

    Width detection is a partial-aggregated groupBy (shuffles one row
    per distinct bucket, not per doc) filtered to width > cap — by
    definition of skew that survivor set is tiny, so it broadcasts and
    the docs themselves are never shuffled for the width lookup.

    NOTE: the `wide` agg appears as an identical subplan under both
    join sides; "one shuffled row per distinct bucket" holds because
    Spark's ReuseExchange dedupes the two occurrences. If the per-side
    plans ever diverge (e.g. a projection pushed below the agg), the
    width scan would run twice — checkpoint `wide` in that case.
    """
    wide = (
        band_rows.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_w"))
        .where(F.col("bucket_w") > cap)
        .select(
            "band_idx",
            "band_hash",
            F.ceil(F.col("bucket_w") / cap).cast("int").alias("n_sub"),
        )
    )
    rows = (
        band_rows.join(F.broadcast(wide), ["band_idx", "band_hash"], "left")
        .withColumn("n_sub", F.coalesce("n_sub", F.lit(1)))
        .withColumn(
            # multi-arg seed form (no arithmetic → no ANSI overflow risk)
            # while staying decorrelated from gemm_candidates' unseeded hash
            "g",
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(0x5DEECE66)), F.col("n_sub")).cast("int"),
        )
    )
    side_a = rows.select(
        "band_idx",
        "band_hash",
        F.col("g").alias("pa"),
        F.explode(F.sequence(F.col("g"), F.col("n_sub") - 1)).alias("pb"),
        F.col("doc_id").alias("ida"),
    )
    side_b = rows.select(
        "band_idx",
        "band_hash",
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("pa"),
        F.col("g").alias("pb"),
        F.col("doc_id").alias("idb"),
    )
    return side_a, side_b


def lsh_band_candidates(band_rows, cap=LSH_BUCKET_CAP):
    """Distinct candidate pairs (doc_a < doc_b) from LSH band buckets,
    skew-guarded by the same sub-bucket grid as _lsh_cells. Replication
    cost for a bucket split s ways is ~(s/2 + 1) copies per doc per
    join side (s + 1 total across both sides) — linear in width, vs
    the quadratic single-task blowup it prevents.

    Built as ONE spark.sql text over a temp view (optimization round
    13): the DataFrame formulation cost ~300 ms of py4j plan-
    construction latency per invocation (~700 round trips at ~0.4 ms);
    the SQL parses in one call to the identical logical plan. The
    decomposition mirrors _lsh_cells line for line (that helper stays
    as the unit-tested reference — tests/test_skew_aqe.py pins this
    derivation against it and against the unguarded join)."""
    spark = band_rows.sparkSession
    ensure_view(band_rows, "_lsh_band_rows_v")
    return spark.sql(
        f"WITH {_lsh_candidates_cte(cap, '_lsh_band_rows_v')}\n"
        "SELECT doc_a, doc_b FROM cand"
    )


def _lsh_candidates_cte(cap, from_view):
    """The band-bucket candidate derivation as a CTE chain (text ends
    with ``cand(doc_a, doc_b)``) so lsh_band_candidates and the merged
    q_dedup_minhash text parse ONE source of truth (round 13)."""
    return f"""wide AS (
          SELECT band_idx, band_hash,
                 CAST(CEIL(COUNT(*) / {cap}) AS INT) AS n_sub
          FROM {from_view}
          GROUP BY band_idx, band_hash
          HAVING COUNT(*) > {cap}
        ),
        rows AS (
          SELECT /*+ BROADCAST(w) */ r.doc_id,
                 r.band_idx, r.band_hash,
                 COALESCE(w.n_sub, 1) AS n_sub,
                 CAST(pmod(xxhash64(r.doc_id, {0x5DEECE66}),
                           COALESCE(w.n_sub, 1)) AS INT) AS g
          FROM {from_view} r
          LEFT JOIN wide w
            ON r.band_idx = w.band_idx AND r.band_hash = w.band_hash
        ),
        side_a AS (
          SELECT band_idx, band_hash, g AS pa,
                 explode(sequence(g, n_sub - 1)) AS pb,
                 doc_id AS ida
          FROM rows
        ),
        side_b AS (
          SELECT band_idx, band_hash,
                 explode(sequence(0, g)) AS pa, g AS pb,
                 doc_id AS idb
          FROM rows
        ),
        cand AS (
          SELECT DISTINCT least(ida, idb) AS doc_a,
                          greatest(ida, idb) AS doc_b
          FROM side_a a
          JOIN side_b b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.pa = b.pa AND a.pb = b.pb
          WHERE ida != idb
        )"""


@query(
    "q_dedup_exact",
    oracle="""
    WITH h AS (
      SELECT doc_id, sha256(lower(text)) AS fp FROM documents
    ),
    keep AS (
      SELECT fp, MIN(doc_id) AS survivor, COUNT(*) AS n_copies
      FROM h GROUP BY fp
    )
    SELECT CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_removed,
           CAST(MIN(survivor) AS BIGINT) AS min_survivor
    FROM keep
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup on normalized-content sha256; keep min doc_id.
    (The fixture has zero exact dups — the op must be a no-op here.)"""
    d = read_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.sha2(F.lower("text"), 256).alias("fp"))
    keep = h.groupBy("fp").agg(
        F.min("doc_id").alias("survivor"), F.count(F.lit(1)).alias("n_copies")
    )
    return keep.agg(
        F.sum("n_copies").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        (F.sum("n_copies") - F.count(F.lit(1))).cast("long").alias("n_removed"),
        F.min("survivor").cast("long").alias("min_survivor"),
    )


_SHINGLES_SQL = """
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, GREATEST(LENGTH(string_split(text,' ')) - 4, 1)),
           i -> array_to_string((string_split(text,' '))[i:i+4], ' ')))) AS shingle
  FROM documents
"""

# Blocked exact-Jaccard pair derivation for the dedup oracles (round-13
# verdict item 2 — the sf0.1-deferred oracles): instead of the all-pairs
# O(N²) join, candidate pairs come from a SHARED-SHINGLE self-join — a
# LOSSLESS block, because Jaccard >= 0.8 > 0 forces a non-empty
# intersection, i.e. at least one shared shingle (shingle lists are
# never empty: GREATEST(...,1) always yields one slice). Verification
# on the candidates is the same exact integer-threshold Jaccard, so the
# pair set is IDENTICAL to the brute-force formulation — just computed
# in O(sum per-shingle doc-pair collisions) instead of O(N²) (sf0.1:
# 1 460 candidates vs 12.5M all-pairs). CTE body only (callers prepend
# WITH / WITH RECURSIVE); exposes `pairs(doc_a, doc_b, i, u)`.
_BLOCKED_PAIRS_SQL = f"""
    sh AS ({_SHINGLES_SQL}),
    sets AS (SELECT doc_id, list(DISTINCT shingle) AS s FROM sh GROUP BY doc_id),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             LENGTH(list_intersect(sa.s, sb.s)) AS i,
             LENGTH(sa.s) + LENGTH(sb.s)
               - LENGTH(list_intersect(sa.s, sb.s)) AS u
      FROM cand c
      JOIN sets sa ON sa.doc_id = c.doc_a
      JOIN sets sb ON sb.doc_id = c.doc_b
    ),
    pairs AS (SELECT doc_a, doc_b, i, u FROM scored WHERE 5 * i >= 4 * u)
"""


@query(
    "q_dedup_minhash",
    oracle=f"""
    WITH {_BLOCKED_PAIRS_SQL}
    SELECT doc_a, doc_b,
           CAST((2 * i * 1000000 + u) // (2 * u) AS DOUBLE) / 1000000.0
             AS jaccard
    FROM pairs
    """,
)
def q_dedup_minhash(spark, sf_dir):
    """MinHash + LSH near-dup pairs, exact-verified.

    Pipeline: distinct 5-gram shingles → 64 seeded xxhash64 min-hashes
    per doc → 8 bands × 8 rows → band-bucket self-join for candidates
    → exact Jaccard verification ≥ 0.8. The oracle derives the SAME
    pair set via shared-shingle blocking + exact verification
    (_BLOCKED_PAIRS_SQL — lossless at any positive threshold, and
    what keeps the oracle tractable at sf0.1+); LSH must match it
    exactly at this threshold.
    """
    sets, band_rows = minhash_structures(spark, sf_dir)
    # Exact verification on the hashed shingle arrays (same Jaccard —
    # xxhash64 collisions among ~500 shingles are ~1e-16 — but long
    # intersection beats 25-char string intersection). Candidate
    # derivation + verification parse as ONE SQL text (round 13: one
    # parse and two temp views instead of two parses, five views and
    # the alias selects — same plan, ~0.1 s less driver latency per
    # build; the candidate CTE chain is the same _lsh_candidates_cte
    # text lsh_band_candidates runs standalone, and the verify tail is
    # round_ratio6's exact int64 half-up form).
    ensure_view(sets, "_mh_sets_v")
    ensure_view(band_rows, "_lsh_band_rows_v")
    return spark.sql(f"""
        WITH {_lsh_candidates_cte(LSH_BUCKET_CAP, '_lsh_band_rows_v')},
        scored AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(size(array_intersect(a.hs, b.hs)) AS BIGINT)
                   AS n_inter,
                 size(a.hs) + size(b.hs) AS n_tot
          FROM cand c
          JOIN _mh_sets_v a ON c.doc_a = a.doc_id
          JOIN _mh_sets_v b ON c.doc_b = b.doc_id
        ),
        thresh AS (
          SELECT doc_a, doc_b, n_inter,
                 n_tot - n_inter AS n_union
          FROM scored
        )
        SELECT doc_a, doc_b,
               CAST((n_inter * 2000000 + n_union) DIV (n_union * 2)
                    AS DOUBLE) / 1000000.0 AS jaccard
        FROM thresh
        WHERE n_inter * 5 >= n_union * 4
    """)


# Single-slot handle memo for the (sets, band_rows) pair — the
# scale_patterns._pair_edges / io.read_table precedent: the
# constructor is a pure function of (session, sf_dir) (deterministic
# expressions over one fixture table), yet each rebuild pays the
# F.expr parses of the signature/band texts plus persist_swap's
# sameSemantics comparison (~0.15 s of py4j driver latency per bench
# invocation). The memo returns the SAME unexecuted persisted handles;
# no data and no results are cached beyond the judged persist_swap
# generation, and a different sf_dir (or a new session) rebuilds.
_MH_MEMO: dict[tuple[str, str], tuple] = {}


def minhash_structures(spark, sf_dir):
    """(sets, band_rows) for the MinHash-LSH pipeline — shared by
    q_dedup_minhash and the skew watcher (framework/skewwatch.py).

    sets: (doc_id, hs: hashed shingles), persisted.
    band_rows: (doc_id, band_idx, band_hash), persisted.

    The shingle STRINGS are a transient expression intermediate, not a
    persisted column (optimization round 13): no consumer reads them —
    verification intersects the hashed arrays — and storing them made
    the cached structure 4x larger (12.8 -> 3.1 MB at sf0.1) for zero
    reads. The DuckDB oracle keeps its own string-set form; xxhash64
    collisions among ~500 shingles/doc are ~1e-16 (see q_dedup_minhash
    docstring)."""
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    got = _MH_MEMO.get(memo_key)
    if got is not None:
        return got
    d = read_table(spark, sf_dir, "documents")
    # Scale-adaptive populate spread (guide §2.5, unsplittable input):
    # the shingle+hash and 64-permutation populates below are CPU-bound
    # row-parallel jobs, but a single-row-group parquet scan yields ONE
    # task regardless of maxPartitionBytes, serializing ~7 s of compute
    # at sf0.1. Spread the rows over a FEW tasks before the heavy
    # projections — only when the scan's own split count is below the
    # target (at real scale splits >> spread and this no-ops, costing
    # nothing). Width is a small constant, NOT core count: the populate
    # win saturates by ~4 tasks while every extra cached partition adds
    # per-task overhead to the nine downstream candidate/verify stages
    # (measured knee at sf0.1/local[32]: populate 6.9->2.1 s at P=4
    # with warm exec unchanged; P>=8 regresses warm ~0.1-0.2 s).
    # Env-parameterized for other deployments; results are
    # partitioning-invariant (hash spread on the key, oracle-checked).
    spread = int(os.environ.get("SPARK_GRAFT_MINHASH_SPREAD", "4"))
    target = min(spread, spark.sparkContext.defaultParallelism)
    if target > 1 and d.rdd.getNumPartitions() < target:
        d = d.repartition(target, "doc_id")
    toks = F.split("text", " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 4, F.lit(1)))
    sh_arr = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 5)))
    )
    # persist(): without it Catalyst's project-collapse would inline
    # the shingle/hash array construction into all 64 minhash
    # expressions (64x recompute); the cached arrays are also reused
    # twice more by the verification joins below. persist_swap bounds
    # the cache to one generation across repeated invocations.
    sets = cache.persist_swap(
        "q_dedup_minhash:sets",
        d.select(
            "doc_id",
            F.transform(sh_arr, lambda sgl: F.xxhash64(sgl)).alias("hs"),
        ),
    )

    # Min-hashes via universal hashing: each shingle is string-hashed
    # ONCE (hs above); permutation i is h -> (a_i*(h mod M) + b_i) mod M
    # with 31-bit constants so products fit a long under ANSI mode (the
    # outer mod is what makes the permutations independent — without it
    # argmin(a*h+b) = argmin(h) for every i). The whole signature is
    # ONE nested higher-order expression (seq(64) x shingles), not 64
    # generated projections: keeps the codegen method small enough to
    # JIT — the 64-column formulation compiled to a huge interpreted-
    # only method and was ~10x slower on a warm JVM (measured).
    M = 2147483647  # 2^31 - 1
    # The signature and band-hash expressions are built as SINGLE
    # parsed SQL strings (optimization round 13): the nested
    # higher-order construction cost hundreds of py4j round trips of
    # plan-construction latency per invocation; the parsed text is the
    # same expression tree (verified value-identical via the oracle
    # gate and pinned in tests/test_r13_optimizations.py). Semantics
    # unchanged from the commented formulation below: permutation i is
    # h -> pmod(pmod(h, M) * a_i + b_i, M) (the outer mod is what makes
    # the permutations independent), constants inline via
    # lit_array_sql, and the band hash is a polynomial fold over each
    # 8-slot slice (31-bit safe).
    a_sql = lit_array_sql(
        [(0x9E3779B9 * (2 * i + 1)) % M | 1 for i in range(N_PERM)]
    )
    b_sql = lit_array_sql([(0xC2B2AE3D * (i + 1)) % M for i in range(N_PERM)])
    sig = F.expr(
        f"transform(sequence(0, {N_PERM - 1}), i -> array_min(transform(hs, "
        f"h -> pmod(pmod(h, {M}) * element_at({a_sql}, i + 1) "
        f"+ element_at({b_sql}, i + 1), {M}))))"
    )

    bands_arr = F.expr(
        f"transform(sequence(0, {N_BANDS - 1}), b -> named_struct("
        f"'band_idx', b, "
        f"'band_hash', aggregate(slice(sig, b * {ROWS_PER_BAND} + 1, "
        f"{ROWS_PER_BAND}), CAST(0 AS BIGINT), "
        f"(acc, x) -> pmod(acc * 1000003 + x, {M}))))"
    )
    # persist(): band_rows is consumed three times (bucket-width count
    # for the skew guard + both self-join sides); without it the
    # 64-minhash signature — the dominant compute — re-runs per
    # consumer. 3 longs x 8 bands per doc, far smaller than the text.
    band_rows = cache.persist_swap(
        "q_dedup_minhash:band_rows",
        sets.select("doc_id", sig.alias("sig"))
        .select("doc_id", F.explode(bands_arr).alias("bb"))
        .select("doc_id", F.col("bb.band_idx"), F.col("bb.band_hash")),
    )
    _MH_MEMO.clear()  # one generation pinned — mirror persist_swap
    _MH_MEMO[memo_key] = (sets, band_rows)
    return sets, band_rows


def _simhash_bits_sql() -> str:
    cols = []
    for b in range(16):
        d = f"(instr('0123456789abcdef', substring(h, {b + 1}, 1)) - 1)"
        cols.append(
            f"CAST(SUM(CASE WHEN ({d} % 2) = 1 THEN 1 ELSE -1 END) > 0 AS INTEGER)"
            f" * {1 << b}"
        )
    return " + ".join(cols)


@query(
    "q_dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, sha256(unnest(string_split(text, ' '))) AS h FROM documents
    ),
    sigs AS (
      SELECT doc_id, CAST({_simhash_bits_sql()} AS BIGINT) AS simhash16
      FROM tok GROUP BY doc_id
    )
    SELECT s.doc_id, s.simhash16, CAST(c.n AS BIGINT) AS bucket_size
    FROM sigs s
    JOIN (SELECT simhash16, COUNT(*) AS n FROM sigs GROUP BY simhash16) c
      USING (simhash16)
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """SimHash(16-bit) from per-token sha256 bits; bucket sizes are
    the near-dup candidate signal (identical signatures collide)."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t")).select(
        "doc_id", F.sha2(F.col("t"), 256).alias("h")
    )
    hexval = lambda b: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring("h", b + 1, 1)
    ) - 1
    bit_terms = [
        F.when((hexval(b) % 2) == 1, 1).otherwise(-1).alias(f"w{b}") for b in range(16)
    ]
    weighted = tok.select("doc_id", *bit_terms)
    sig_expr = None
    agg = weighted.groupBy("doc_id").agg(
        *[F.sum(f"w{b}").alias(f"s{b}") for b in range(16)]
    )
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, 1 << b).otherwise(0)
        sig_expr = term if sig_expr is None else sig_expr + term
    sigs = agg.select("doc_id", sig_expr.cast("long").alias("simhash16"))
    buckets = sigs.groupBy("simhash16").agg(F.count(F.lit(1)).alias("bucket_size"))
    return sigs.join(buckets, "simhash16").select(
        "doc_id", "simhash16", F.col("bucket_size").cast("long")
    )


@query(
    "q_sim_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST((2 * (LENGTH(list_intersect(a.toks, b.toks))) * 1000000 + (LENGTH(a.toks) + LENGTH(b.toks) - LENGTH(list_intersect(a.toks, b.toks)))) // (2 * (LENGTH(a.toks) + LENGTH(b.toks) - LENGTH(list_intersect(a.toks, b.toks)))) AS DOUBLE) / 1000000.0 AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE 2 * LENGTH(list_intersect(a.toks, b.toks))
          >= LENGTH(a.toks) + LENGTH(b.toks)
             - LENGTH(list_intersect(a.toks, b.toks))
    """,
)
def q_sim_jaccard(spark, sf_dir):
    """Pairwise token-set (1-gram) Jaccard ≥ 0.5 on a bounded slice.
    (Pairwise by construction — the scalable path is q_dedup_minhash.)"""
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    t = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    pairs = a.crossJoin(b).where(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("long")
    union = F.size("ta") + F.size("tb") - inter
    return (
        pairs.withColumn("n_inter", inter)
        .withColumn("n_union", union)
        .where(F.col("n_inter") * 2 >= F.col("n_union"))
        .select(
            "doc_a",
            "doc_b",
            round_ratio6(F.col("n_inter"), F.col("n_union")).alias("jaccard"),
        )
    )


_DOT_DECIMAL = "decimal(30,12)"


def explode_comps(df, id_col: str, emb_col: str, out_id: str, out_x: str):
    """(id, i, x_double) component rows — the join-friendly layout for
    pairwise vector math (built-in hash aggregates instead of
    higher-order folds, which generate JIT-hostile giant methods)."""
    return df.select(
        F.col(id_col).alias(out_id), F.posexplode(emb_col).alias("i", out_x)
    ).withColumn(out_x, F.col(out_x).cast("double"))


def vector_norms(comps, id_col: str, x_col: str, out: str):
    """sqrt of exact-decimal sum of squares per vector."""
    return comps.groupBy(id_col).agg(
        F.sqrt(
            F.sum((F.col(x_col) * F.col(x_col)).cast(_DOT_DECIMAL)).cast("double")
        ).alias(out)
    )


def pair_cosines(embeddings, a_filter=None, pair_cond=None):
    """All-pairs cosine via component-join: explode both sides on the
    dimension index, join on i (+ the pair condition), decimal-sum the
    products per pair, normalize. Everything is built-in codegen
    (scan→join→hash-agg); this is the shape that scales out — and the
    exact mirror of the SQL_PAIR_COSINE oracle."""
    a = embeddings if a_filter is None else embeddings.where(a_filter)
    ac = explode_comps(a, "vec_id", "embedding", "vec_a", "xa")
    bc = explode_comps(embeddings, "vec_id", "embedding", "vec_b", "xb")
    cond = (F.col("i") == F.col("j"))
    bc = bc.withColumnRenamed("i", "j")
    if pair_cond is not None:
        cond = cond & pair_cond
    dots = (
        ac.join(bc, cond)
        .groupBy("vec_a", "vec_b")
        .agg(F.sum((F.col("xa") * F.col("xb")).cast(_DOT_DECIMAL)).cast("double").alias("dot"))
    )
    comps_all = explode_comps(embeddings, "vec_id", "embedding", "vec_id", "x")
    norms = vector_norms(comps_all, "vec_id", "x", "nrm")
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "vec_a")
        .join(F.broadcast(nb), "vec_b")
        .select("vec_a", "vec_b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"))
    )


GEMM_BLOCKS = 4
# adaptive blocking target: keep each grid cell's two blocks around
# this many rows so the per-task cos matrix (rows² float64) stays
# ~128 MB — small enough for executor memory, big enough for BLAS
GEMM_TARGET_BLOCK_ROWS = 4096


def adaptive_gemm_blocks(n_rows: int) -> int:
    """Blocks for an all-pairs GEMM over `n_rows` vectors: at least
    GEMM_BLOCKS (task parallelism on small data), and enough that a
    block stays near GEMM_TARGET_BLOCK_ROWS — the '100 TB: raise
    n_blocks until a cell fits one task' rule made automatic."""
    return max(GEMM_BLOCKS, -(-n_rows // GEMM_TARGET_BLOCK_ROWS))


def gemm_candidates(spark, embeddings, threshold, margin=1e-6, n_blocks=None):
    """No-false-negative cosine candidate pairs via grid-blocked GEMM.

    Fully distributed — nothing is collected to the driver. Each vector
    gets a stable hash block id (pmod(xxhash64(vec_id), n_blocks));
    side A of grid cell (p, q) carries block p's rows, side B block q's,
    and only the upper triangle p <= q is materialized (the unordered
    pair {x, y} lands in exactly one cell). One applyInPandas task per
    cell runs a single BLAS matmul over its two blocks. Replication is
    ~(n_blocks/2 + 1)× per side — the inherent cost of all-pairs work
    split so every block fits in one executor; at 100 TB you raise
    n_blocks until ~(corpus/n_blocks) rows fit per task, and the plan
    shape (exchange on (pa, pb) → grouped GEMM) is unchanged.

    Float64 relative error on a 64-dim dot product is ~1e-15, so
    `threshold - margin` with margin=1e-6 cannot drop a true pair;
    the caller removes false positives with an exact-decimal rescore
    (dot_cosine), keeping results bit-identical to the brute-force
    oracle. Emits only (vec_a < vec_b) pairs, each exactly once.

    n_blocks=None auto-scales via adaptive_gemm_blocks (a metadata
    count — parquet footers, no data read); the output is identical
    for ANY blocking, so this never changes results.
    """
    if n_blocks is None:
        n_blocks = adaptive_gemm_blocks(embeddings.count())
    e = embeddings.select(
        "vec_id",
        "embedding",
        F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).alias("blk"),
    )
    # Upper-triangle grid: block p serves as side A of cells (p, p..max),
    # block q as side B of cells (0..q, q).
    side_a = e.select(
        F.col("blk").alias("pa"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("pb"),
        F.lit(0).alias("side"),
        "vec_id",
        "embedding",
    )
    side_b = e.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("pa"),
        F.col("blk").alias("pb"),
        F.lit(1).alias("side"),
        "vec_id",
        "embedding",
    )
    cells = side_a.unionByName(side_b)
    cut = threshold - margin

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        a_pdf = pdf[pdf["side"] == 0]
        b_pdf = pdf[pdf["side"] == 1]
        empty = pd.DataFrame(
            {"vec_a": np.array([], dtype=np.int64), "vec_b": np.array([], dtype=np.int64)}
        )
        if a_pdf.empty or b_pdf.empty:
            return empty
        a_ids = a_pdf["vec_id"].to_numpy(dtype=np.int64)
        b_ids = b_pdf["vec_id"].to_numpy(dtype=np.int64)
        # np.stack over the Arrow-decoded ndarrays — NOT a per-row
        # list() conversion, which was the measured kernel hot spot at
        # sf10 (a Python loop over every replicated row).
        a_mat = np.stack(a_pdf["embedding"].to_numpy()).astype(np.float64)
        b_mat = np.stack(b_pdf["embedding"].to_numpy()).astype(np.float64)
        # Pre-normalize the (rows x dim) sides once — O(rows·dim) — so
        # the matmul emits cosines directly. The old outer-norm division
        # was an O(rows²) pass, as many flops as the GEMM itself.
        a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_nrm = np.sqrt((b_mat * b_mat).sum(axis=1))
        a_mat /= np.where(a_nrm == 0.0, 1.0, a_nrm)[:, None]
        b_mat /= np.where(b_nrm == 0.0, 1.0, b_nrm)[:, None]
        cos = a_mat @ b_mat.T
        ra, cb = np.nonzero((cos >= cut) & (a_ids[:, None] != b_ids[None, :]))
        if ra.size == 0:
            return empty
        # Canonicalize to (min, max); the diagonal cell sees each pair in
        # both orientations — np.unique collapses them to one row.
        va = np.minimum(a_ids[ra], b_ids[cb])
        vb = np.maximum(a_ids[ra], b_ids[cb])
        pairs = np.unique(np.stack([va, vb], axis=1), axis=0)
        return pd.DataFrame({"vec_a": pairs[:, 0], "vec_b": pairs[:, 1]})

    return cells.groupBy("pa", "pb").applyInPandas(kernel, "vec_a bigint, vec_b bigint")


RESCORE_BROADCAST_ROWS = 500_000


def rescore_pairs_exact(embeddings, cand, broadcast_rows=RESCORE_BROADCAST_ROWS):
    """Attach both embedding arrays to a candidate-pair frame and
    compute the exact-decimal cosine.

    The candidate set's size depends on the CORPUS, not the query: a
    sparse-dup corpus yields a tiny frame (broadcast it into two
    streams of the big embeddings table — no vector shuffle), but a
    duplicate-heavy corpus yields millions of pairs (every copy-pair
    crosses the threshold), and force-broadcasting that — especially
    the second join, whose build side already carries one 64-float
    array per row — OOMs the driver. So: persist the id-pairs (16 B/
    row), count them (one metadata-cheap job against the persisted
    frame), and pick broadcast vs shuffled hash joins accordingly.
    Either plan is value-identical; this is purely join-strategy
    selection, the same call AQE can't make here because the frame's
    size is unknown until the GEMM prefilter runs. (Callers whose
    candidate set is bounded BY CONSTRUCTION — the top-k margin cut —
    splice the same join shape into their own parsed SQL with a static
    broadcast hint instead: see llm_vectors._brute_force_topk.)"""
    cand = cache.persist_swap("rescore:candidates", cand)
    n_cand = cand.count()
    ea = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    if n_cand <= broadcast_rows:
        with_a = ea.join(F.broadcast(cand), "vec_a")  # stream embeddings, broadcast pairs
        paired = eb.join(F.broadcast(with_a), "vec_b")  # still candidate-sized
    else:
        with_a = ea.join(cand, "vec_a")  # shuffled hash join: pairs >> vectors
        paired = eb.join(with_a, "vec_b")
    return paired.select("vec_a", "vec_b", dot_cosine("emb_a", "emb_b").alias("cosine"))


def dot_cosine_sql(a_col: str, b_col: str) -> str:
    """The exact-decimal cosine as SQL text (see dot_cosine) — for
    callers that splice it into a larger parsed statement."""
    dec = _DOT_DECIMAL

    def fold(arr_expr: str) -> str:
        return (
            f"CAST(aggregate({arr_expr}, CAST(0 AS {dec}), "
            f"(acc, x) -> CAST(acc + x AS {dec})) AS DOUBLE)"
        )

    prod = (
        f"zip_with({a_col}, {b_col}, (x, y) -> "
        f"CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS {dec}))"
    )

    def sq(c: str) -> str:
        return fold(
            f"transform({c}, x -> "
            f"CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {dec}))"
        )

    return f"{fold(prod)} / (SQRT({sq(a_col)}) * SQRT({sq(b_col)}))"


def dot_cosine(a_col: str, b_col: str):
    """Exact-decimal cosine between two float-array columns
    (higher-order-fold form — use only on small candidate sets;
    pair_cosines is the scale path).

    Per-element double products are IEEE-deterministic; the reduction
    runs in DECIMAL(30,12) so accumulation order cannot matter.
    """
    # One parsed SQL expression (round 13): the higher-order
    # construction cost ~130 ms of py4j latency per call site; the
    # parsed text is the identical expression tree (same casts, same
    # DECIMAL(30,12) fold, same double division — gate-verified).
    return F.expr(dot_cosine_sql(a_col, b_col))


SQL_PAIR_COSINE = """
  WITH u AS (
    SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM (
      SELECT vec_id, UNNEST(embedding) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings {a_filter}
    )
  ),
  u2 AS (
    SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM (
      SELECT vec_id, UNNEST(embedding) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
  ),
  norms AS (
    SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
    FROM u2 GROUP BY vec_id
  ),
  dots AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(SUM(CAST(a.x * b.x AS DECIMAL(30,12))) AS DOUBLE) AS dot
    FROM u a JOIN u2 b ON a.i = b.i AND {pair_cond}
    GROUP BY a.vec_id, b.vec_id
  )
  SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = vec_a
  JOIN norms nb ON nb.vec_id = vec_b
"""


def collapse_duplicate_vectors(embeddings):
    """Exact-duplicate collapse before pairwise vector work.

    Returns (members, uniq): members = (vec_id, rep_id) maps every
    vector to its group representative (min vec_id over vectors with
    BYTE-IDENTICAL embedding arrays — one window shuffle on the array
    value); uniq = (vec_id, embedding) is one row per distinct array.

    Why this is the scale lever: cosine depends only on array content,
    so all pairwise compute can run on the U unique vectors and expand
    back through group membership with output-proportional joins.
    Duplicate-heavy corpora (the common case in crawl dedup — the
    whole reason an embcos pass exists) turn an O(N²) GEMM into
    O(U²) + O(|answer|); a fully-unique corpus pays one extra shuffle.
    Exactness is free: identical arrays ⇒ bit-identical exact cosines.

    The representative is found with groupBy(embedding).agg(min), NOT
    a Window.partitionBy("embedding") — the aggregate gets a map-side
    partial min (one row per distinct array per input partition
    crosses the shuffle) and the membership join-back is AQE
    skew-splittable, while a window exchange ships every corpus row
    and is exempt from AQE skew handling (r6 verdict #3: a degenerate
    corpus with one vector duplicated 10⁹× lands on a single task).
    """
    reps = embeddings.groupBy("embedding").agg(F.min("vec_id").alias("rep_id"))
    # null-SAFE join back: groupBy buckets NULL embeddings into one
    # group, but a plain equi-join would drop those rows (NULL never
    # equals NULL) — the old window kept them, so must we
    members = cache.persist_swap(
        "embcos:members",
        embeddings.alias("e")
        .join(
            reps.alias("r"),
            F.col("e.embedding").eqNullSafe(F.col("r.embedding")),
        )
        .select(
            F.col("e.vec_id").alias("vec_id"),
            F.col("e.embedding").alias("embedding"),
            F.col("r.rep_id").alias("rep_id"),
        ),
    )
    uniq = members.where(F.col("vec_id") == F.col("rep_id")).select(
        "vec_id", "embedding"
    )
    return members, uniq


@query(
    "q_dedup_embcos",
    # Collapsed oracle (round-13 sf1 soak): the old all-pairs formulation
    # exploded at 20k vectors — the per-component join materializes
    # N²/2 × 64 rows (1.3e10 at sf1; DuckDB spilled >70 GB and died).
    # This one mirrors the ENGINE's exact-duplicate collapse (phase 1
    # of q_dedup_embcos itself): pairwise work runs on the U unique
    # arrays, then rep pairs expand back through the membership map
    # with LEAST/GREATEST canonicalization and intra-group pairs get
    # the group's exact self-cosine — the same decimal folds, so
    # values are bit-identical to the uncollapsed formulation (two
    # identical arrays have identical dots/norms by construction).
    oracle="""
    WITH reps AS (
      SELECT MIN(vec_id) AS rep_id, embedding
      FROM embeddings GROUP BY embedding
    ),
    members AS (
      SELECT e.vec_id, r.rep_id
      FROM embeddings e JOIN reps r
        ON e.embedding IS NOT DISTINCT FROM r.embedding
    ),
    u AS (
      SELECT rep_id AS vec_id, CAST(x AS DOUBLE) AS x, i FROM (
        SELECT rep_id, UNNEST(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM reps
      )
    ),
    sq AS (
      SELECT vec_id,
             CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE) AS dot2,
             sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
      FROM u GROUP BY vec_id
    ),
    dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM(CAST(a.x * b.x AS DECIMAL(30,12))) AS DOUBLE) AS dot
      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    rep_pairs AS (
      SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
      FROM dots JOIN sq na ON na.vec_id = vec_a
                JOIN sq nb ON nb.vec_id = vec_b
      WHERE dot / (na.nrm * nb.nrm) >= 0.4
    ),
    cross_pairs AS (
      SELECT LEAST(ma.vec_id, mb.vec_id) AS vec_a,
             GREATEST(ma.vec_id, mb.vec_id) AS vec_b,
             rp.cosine
      FROM rep_pairs rp
      JOIN members ma ON ma.rep_id = rp.vec_a
      JOIN members mb ON mb.rep_id = rp.vec_b
    ),
    selfcos AS (
      SELECT vec_id AS rep_id, dot2 / (nrm * nrm) AS cosine
      FROM sq WHERE dot2 / (nrm * nrm) >= 0.4
    ),
    intra AS (
      SELECT ma.vec_id AS vec_a, mb.vec_id AS vec_b, s.cosine
      FROM selfcos s
      JOIN members ma ON ma.rep_id = s.rep_id
      JOIN members mb ON mb.rep_id = s.rep_id AND ma.vec_id < mb.vec_id
    )
    SELECT vec_a, vec_b, ROUND(cosine, 6) AS cosine FROM cross_pairs
    UNION ALL
    SELECT vec_a, vec_b, ROUND(cosine, 6) AS cosine FROM intra
    """,
)
def q_dedup_embcos(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4).

    Three-phase exact, sub-quadratic in the corpus for duplicate-heavy
    data (the case the op exists for):

    1. Collapse byte-identical vectors (collapse_duplicate_vectors) —
       one window shuffle; all pairwise work then runs on the U unique
       arrays, not the N corpus rows.
    2. Block-GEMM prefilter over the uniques (gemm_candidates): every
       unique pair with float64 cosine ≥ 0.4 - 1e-6 — provably a
       superset of the true answer — then exact-decimal rescore
       (rescore_pairs_exact) for values bit-identical to the O(n²)
       brute-force oracle.
    3. Expand representative pairs back to corpus pairs through the
       membership frame: cross-group pairs inherit their reps' exact
       cosine (identical arrays ⇒ identical cosine); intra-group pairs
       get the group's exact self-cosine. Both joins are sized by the
       ANSWER, not the corpus².

    Law: O(N) scan + O(U²) GEMM + O(|answer|) expansion — vs the old
    O(N²) GEMM over all rows (sf10 soak: 502 s → the duplicate-heavy
    100× corpus now runs the GEMM on 1/100th of the rows).

    Why not LSH candidates over the uniques (measured, round 6): the
    fixture's answer pairs sit at cosine 0.40–0.51 (66 of 124,750
    unique pairs at sf0.001; max observed 0.51) — angles of 59–66°,
    where a random hyperplane agrees with probability only ~0.63.
    There is NO margin above the threshold (unlike minhash's planted
    J≈0.99 near-dups), so any signature bucketing misses true pairs
    unless probing expands to ~the full corpus — exact-vs-oracle
    correctness would be violated. Exact all-pairs cosine at a low
    threshold over dense vectors has no sub-quadratic worst case;
    the engine's approximate-recall paths (q_knn_lsh / q_knn_ivf)
    are the declared alternative when recall < 1 is acceptable."""
    e = read_table(spark, sf_dir, "embeddings")
    return embcos_pairs(spark, e, 0.4)


# Declared exact-embcos contract ceiling: the unique-side GEMM is
# inherently O(U²) (no sub-quadratic exact algorithm exists for
# low-threshold dense cosine — see q_dedup_embcos's measured LSH
# argument), so past this many unique vectors the operator REFUSES
# instead of melting, pointing at the approximate-recall paths
# (q_knn_lsh / q_knn_ivf). 1M uniques ≈ 5·10¹¹ pair evaluations —
# the documented edge of feasible for a batch job on a large
# cluster; beyond it exactness has to be given up explicitly, not
# discovered via a week-long stage.
EMBCOS_MAX_UNIQUES = 1_000_000


def embcos_pairs(spark, e, threshold, max_uniques=EMBCOS_MAX_UNIQUES):
    """The q_dedup_embcos pipeline over an arbitrary (vec_id,
    embedding) frame — see that query's docstring for the three
    phases. Separated so tests can drive it against duplicate-heavy
    frames and compare with the uncollapsed two-phase path.

    Refusal contract (r7 verdict #6): before any quadratic work, ONE
    linear scan estimates the unique-vector count with an HLL sketch
    (approx_count_distinct over the array value); if it exceeds
    ``max_uniques`` the call raises with a pointer to the approximate
    paths rather than launching an O(U²) GEMM that cannot finish.
    The 1.1 slack on the ceiling absorbs HLL error — a corpus within
    5% of the declared edge is already in "choose approx" territory."""
    u_est = driver_scalar(
        e.agg(F.approx_count_distinct("embedding", rsd=0.02).alias("u"))
    )["u"]
    if u_est > max_uniques * 1.1:
        raise ValueError(
            f"exact embedding-cosine dedup refused: ~{u_est:,} unique "
            f"vectors exceeds the declared ceiling ({max_uniques:,}). "
            "The exact unique-side GEMM is O(U²) with no sub-quadratic "
            "exact alternative at low cosine thresholds; use the "
            "approximate-recall paths (q_knn_lsh hyperplane-LSH or "
            "q_knn_ivf) or raise max_uniques explicitly if you accept "
            "the quadratic cost."
        )
    members, uniq = collapse_duplicate_vectors(e)
    cand = gemm_candidates(spark, uniq, threshold)
    rep_pairs = rescore_pairs_exact(uniq, cand).where(F.col("cosine") >= threshold)

    ma = members.select(F.col("rep_id").alias("vec_a"), F.col("vec_id").alias("ia"))
    mb = members.select(F.col("rep_id").alias("vec_b"), F.col("vec_id").alias("ib"))
    cross = (
        rep_pairs.join(ma, "vec_a")
        .join(mb, "vec_b")
        .select(
            F.least("ia", "ib").alias("vec_a"),
            F.greatest("ia", "ib").alias("vec_b"),
            "cosine",
        )
    )

    # intra-group pairs: exact self-cosine of the representative array
    # (≡ the oracle's value for any two identical members; ~1.0, but
    # computed with the same decimal fold — never assumed)
    dup_reps = (
        members.groupBy("rep_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("rep_id")
    )
    self_cos = (
        uniq.join(dup_reps, uniq["vec_id"] == dup_reps["rep_id"])
        .select("rep_id", dot_cosine("embedding", "embedding").alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
    intra = (
        self_cos.join(members.select("rep_id", F.col("vec_id").alias("ia")), "rep_id")
        .join(members.select("rep_id", F.col("vec_id").alias("ib")), "rep_id")
        .where(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("vec_a"), F.col("ib").alias("vec_b"), "cosine")
    )

    return cross.unionByName(intra).select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


SPAN_GRAM = 10  # tokens per span fingerprint
SPAN_MIN_SHARED = 5  # report pairs sharing at least this many spans
# Stop-span skew guard (CI telemetry cap): a span fingerprint present
# in more than this many docs is boilerplate (license headers, nav
# chrome) and would blow the self-join up quadratically; skewwatch
# records the observed bucket widths against this cap.
SPAN_STOP_CAP = 64


def span_structures(spark, sf_dir):
    """(grams, dup_spans) for the span dedup — exposed so
    framework/skewwatch.span_bucket_skew can observe the width
    distribution of the join buckets q_dedup_spans self-joins on."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (SPAN_GRAM - 1), F.lit(1)))
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    # DuckDB's [i:i+k] slice is INCLUSIVE (k+1 tokens), so
                    # the oracle's [i:i+SPAN_GRAM-1] is SPAN_GRAM tokens
                    idx,
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, SPAN_GRAM))),
                )
            )
        ).alias("g"),
    )
    dup = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    return grams, dup


@query(
    "q_dedup_spans",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, GREATEST(LENGTH(string_split(text,' ')) - {SPAN_GRAM - 1}, 1)),
               i -> array_to_string((string_split(text,' '))[i:i+{SPAN_GRAM - 1}], ' ')))) AS g
      FROM documents
    ),
    dup_grams AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_spans
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      WHERE a.g IN (SELECT g FROM dup_grams)
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) >= {SPAN_MIN_SHARED}
    )
    SELECT doc_a, doc_b, CAST(n_shared_spans AS BIGINT) AS n_shared_spans
    FROM pairs
    """,
)
def q_dedup_spans(spark, sf_dir):
    """Exact substring-span dedup (the suffix-array-style 'repeated
    span' pass of pretraining pipelines, re-expressed relationally):
    distinct 10-token span fingerprints per doc → keep only spans seen
    in ≥2 docs (the HAVING agg is the frequency cut that keeps the
    self-join off the unique-span long tail, which is ~all spans) →
    span-equality self-join → pairs sharing ≥5 spans.

    Scale posture: one shuffle to count span frequency (partial agg on
    the span hash), one shuffled self-join restricted to duplicated
    spans only. A stop-span cap (drop spans in >K docs, the skew guard
    for boilerplate) would bound the join fan-out at 100 TB — the
    fixture has no such spans, so the cap is left to the docstring
    plus lsh-style salting if needed. Joining on the 64-bit xxhash of
    the span (not the 10-token string) keeps shuffle rows narrow; at
    ~500 spans/doc a hash collision is ~1e-13 and cannot create a
    ≥5-span pair. The stop-span cap the docstring promises is
    SPAN_STOP_CAP, observed in CI via skewwatch.span_bucket_skew."""
    grams, dup = span_structures(spark, sf_dir)
    hot = grams.join(dup.select("g"), "g")
    a = hot.select(F.col("doc_id").alias("doc_a"), "g")
    b = hot.select(F.col("doc_id").alias("doc_b"), "g")
    return (
        a.join(b, "g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_spans"))
        .where(F.col("n_shared_spans") >= SPAN_MIN_SHARED)
    )


@query(
    "q_dedup_incremental",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT sha256(lower(text)) AS fp FROM documents WHERE doc_id < 300
    ),
    batch AS (
      SELECT doc_id, sha256(lower(text)) AS fp FROM documents
      WHERE doc_id >= 200 AND doc_id < 500
    ),
    fresh AS (
      SELECT b.doc_id FROM batch b WHERE NOT EXISTS (
        SELECT 1 FROM hist h WHERE h.fp = b.fp)
    )
    SELECT CAST((SELECT COUNT(*) FROM batch) AS BIGINT) AS n_batch,
           CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST((SELECT COUNT(*) FROM batch) - COUNT(*) AS BIGINT) AS n_dropped,
           CAST(MIN(doc_id) AS BIGINT) AS min_new_doc
    FROM fresh
    """,
)
def q_dedup_incremental(spark, sf_dir):
    """Incremental exact dedup against HISTORY — the production
    pipeline shape: the corpus already processed lives as a
    fingerprint table (a planktable here: tiny sha256 rows, the
    'index', NOT the documents), and each new batch anti-joins it and
    appends its novel fingerprints. History is never rescanned at the
    document level; at 100 TB the fingerprint table is ~1/1000th of
    the corpus and the anti-join shuffles digests only. The fixture's
    batch overlaps history (doc_id 200..299) so the drop path is
    exercised; the oracle recomputes both sides relationally."""
    from plankton_spark.queries.scans import _scratch
    from plankton_spark.table_format import PlankTable
    import shutil as _shutil

    d = read_table(spark, sf_dir, "documents")
    fp = F.sha2(F.lower("text"), 256).alias("fp")
    hist_df = d.where(F.col("doc_id") < 300).select(fp).distinct()
    path = _scratch(sf_dir, "dedup_fp_index")
    _shutil.rmtree(path, ignore_errors=True)
    t = PlankTable(spark, path)
    t.create(hist_df)

    batch = d.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 500)).select(
        "doc_id", fp
    )
    fresh = batch.join(t.read(), "fp", "left_anti")
    # append the novel fingerprints — the index stays current
    t.append(fresh.select("fp").distinct())

    n_batch = batch.agg(F.count(F.lit(1)).cast("long").alias("n_batch"))
    agg = fresh.agg(
        F.count(F.lit(1)).cast("long").alias("n_new"),
        F.min("doc_id").cast("long").alias("min_new_doc"),
    )
    return (
        n_batch.crossJoin(agg)
        .select(
            "n_batch",
            "n_new",
            (F.col("n_batch") - F.col("n_new")).alias("n_dropped"),
            "min_new_doc",
        )
    )


# ---------------------------------------------------------------------
# Semantic dedup (SemDeDup shape) — round-9 verdict #6: completes the
# exact → minhash → simhash → jaccard → embcos → SEMANTIC dedup ladder
# ---------------------------------------------------------------------

SEMANTIC_COS_THRESHOLD = 0.4
# Exact within-cluster pass ceiling: the component self-join costs
# ~dims (64) join rows per pair, so 1e9 pairs ≈ 6.4e10 joined rows —
# the feasible batch edge for this plan shape (embcos's GEMM edge is
# higher per pair; its 1e6-unique ceiling is the analogous valve).
SEMANTIC_MAX_PAIRS = 1_000_000_000


def _semantic_oracle(rule: str) -> str:
    """DuckDB twin of _semantic_core: brute-force within-cluster cosine
    over the IDENTICAL adaptive-K SQL k-means. ``rule`` picks which
    side of a duplicate pair is pruned — 'lowid' keeps the lower
    vec_id; 'far' keeps the vector FARTHER from its cluster centroid
    (the SemDeDup paper's survivor rule), tie on exact integer d2 →
    keep the lower vec_id. vec_a < vec_b always, so the tie-case prune
    target is vec_b in both rules."""
    from plankton_spark.queries.llm_vectors import (
        KMEANS_ASSIGN_CTES_ADAPTIVE,
        KMEANS_DIMS,
    )

    pick = (
        "d.vec_b"
        if rule == "lowid"
        else "CASE WHEN ka.d2 < kb.d2 THEN d.vec_a ELSE d.vec_b END"
    )
    return f"""
    WITH {KMEANS_ASSIGN_CTES_ADAPTIVE},
    comps AS (
      SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM (
        SELECT vec_id, UNNEST(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
      )
    ),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
      FROM comps GROUP BY vec_id
    ),
    ak AS (SELECT vec_id, CAST(k AS BIGINT) AS k, d2 FROM asg2),
    cpairs AS (
      -- same-cluster pair list FIRST (Σ|cluster|² rows), then the
      -- component join hangs off it: the old comps-self-join on the
      -- 64-value component index built N²/2 × 64 intermediate rows
      -- before the cluster filter could apply (the sf1 soak spilled
      -- >70 GB there); this shape is Σ|c|²·d — the SemDeDup flop
      -- contract the engine itself is bounded by
      SELECT ka.vec_id AS vec_a, kb.vec_id AS vec_b
      FROM ak ka JOIN ak kb ON ka.k = kb.k AND ka.vec_id < kb.vec_id
    ),
    dots AS (
      -- in-row decimal dot over the pair frame: joining the unnested
      -- component table back in leaves the optimizer free to pair
      -- comps with itself on the 64-value component index first
      -- (observed: the sf1 probe ran >550 s there); two unique-key
      -- equi-joins + a list fold cannot be reordered into a blowup.
      -- list_sum(DECIMAL(30,12)) accumulates in DECIMAL(38,12) —
      -- bit-identical to SUM over UNNEST (probed), order-free.
      SELECT p.vec_a, p.vec_b,
             CAST(list_sum(list_transform(
               generate_series(1, {KMEANS_DIMS}),
               i -> CAST(CAST(ea.embedding[i] AS DOUBLE)
                         * CAST(eb.embedding[i] AS DOUBLE)
                         AS DECIMAL(30,12)))) AS DOUBLE) AS dot
      FROM cpairs p
      JOIN embeddings ea ON ea.vec_id = p.vec_a
      JOIN embeddings eb ON eb.vec_id = p.vec_b
    ),
    pruned AS (
      SELECT DISTINCT {pick} AS vec_id
      FROM dots d
      JOIN norms na ON na.vec_id = d.vec_a
      JOIN norms nb ON nb.vec_id = d.vec_b
      JOIN ak ka ON ka.vec_id = d.vec_a
      JOIN ak kb ON kb.vec_id = d.vec_b
      WHERE d.dot / (na.nrm * nb.nrm) >= {SEMANTIC_COS_THRESHOLD}
    )
    SELECT ak.k, ak.vec_id,
           CAST(CASE WHEN pruned.vec_id IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS pruned
    FROM ak LEFT JOIN pruned ON pruned.vec_id = ak.vec_id
    """


def _cluster_gemm_candidates(e_k, threshold, margin=1e-6, chunk=2048):
    """No-false-negative SAME-CLUSTER cosine candidate pairs via
    per-cluster GEMM: one applyInPandas task per cluster (adaptive K
    keeps clusters ~√N rows, so a task's matrix is small), the cosine
    matrix computed in row CHUNKS so memory stays ~chunk×|cluster|
    even for a pathological giant cluster. Emits (vec_a < vec_b)
    pairs with float cosine ≥ threshold − margin — margin 1e-6
    dominates the ~1e-15 float64 dot error, so the exact-decimal
    rescore (rescore_pairs_exact) that follows sees a provable
    superset of the true ≥ threshold pairs, keeping results
    bit-identical to the brute-force within-cluster oracle. vs the
    previous component self-join, the shuffle carries |candidates|
    id-pairs instead of Σ|cluster|² × 64 joined component rows — the
    flop count (Σ|c|²·d, the SemDeDup contract) is unchanged but the
    materialized volume drops ~64× and moves into BLAS."""
    cut = threshold - margin

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "vec_a": np.array([], dtype=np.int64),
                    "vec_b": np.array([], dtype=np.int64),
                }
            )
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        mat /= np.where(nrm == 0.0, 1.0, nrm)[:, None]
        out_a, out_b = [], []
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            cos = mat[lo:hi] @ mat.T
            ra, cb = np.nonzero(cos >= cut)
            ga = ids[lo + ra]
            gb = ids[cb]
            keep = ga < gb  # upper triangle only, no self-pairs
            out_a.append(ga[keep])
            out_b.append(gb[keep])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
            }
        )

    return e_k.groupBy("k").applyInPandas(
        kernel, "vec_a bigint, vec_b bigint"
    )


def _semantic_core(spark, sf_dir, rule: str, tag: str):
    """Shared SemDeDup engine (q_dedup_semantic / q_dedup_semantic_far):
    ADAPTIVE-K k-means (K = max(4, ⌊√N⌋) — clusters stay ~constant-size
    so Σ|cluster|² ≈ N^1.5, the property that lets the exact
    within-cluster pass survive corpus growth; assignment flips to the
    Arrow integer-GEMM path past LITERAL_ASSIGN_MAX_K centroids), then
    exact-cosine pruning WITHIN each cluster. ``rule``: 'lowid' keeps
    the lower vec_id of a duplicate pair; 'far' keeps the vector
    farther from its cluster centroid (exact integer d2 from the
    assignment; tie → keep lower vec_id). Output: (k, vec_id, pruned).

    Scale shape — the reason SemDeDup exists: pairwise work is
    CLUSTER-BOUNDED. The component self-join keys on (cluster,
    component-index), so the shuffle co-locates one cluster's
    components and the pair blow-up is sum(|cluster|^2), not
    |corpus|^2. The per-pair math is the exact-decimal cosine of
    q_dedup_embcos, so the DuckDB brute-force-within-cluster oracle
    matches bitwise."""
    from plankton_spark.queries.llm_vectors import kmeans_fit_assign

    assignments, _cent = kmeans_fit_assign(spark, sf_dir, k=None)
    ak = cache.persist_swap(
        f"semantic:{tag}:assign",
        assignments.select(
            "vec_id", F.col("k").cast("long").alias("k"), "d2"
        ),
    )
    # Refusal contract (the embcos EMBCOS_MAX_UNIQUES pattern): the
    # within-cluster pair count Σ|cluster|² is known EXACTLY from K
    # cluster sizes (one K-row aggregate on the persisted assignment —
    # metadata-cheap), so refuse before any quadratic work when the
    # exact pass is infeasible. Adaptive K keeps Σ|c|² ≈ N^1.5, so the
    # valve is now a true backstop (pathological all-identical corpora
    # still collapse into one giant cluster), not the normal-path exit.
    sizes = [r["n"] for r in ak.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()]
    pair_evals = sum(n * n for n in sizes)
    if pair_evals > SEMANTIC_MAX_PAIRS:
        raise ValueError(
            f"q_dedup_semantic: Σ|cluster|² = {pair_evals:.2e} exceeds the "
            f"exact-pass ceiling {SEMANTIC_MAX_PAIRS:.0e} — raise K "
            "(more, smaller clusters) or use the approximate paths "
            "(q_knn_lsh / q_knn_ivf)"
        )

    e = read_table(spark, sf_dir, "embeddings")
    # pair pass: per-cluster GEMM candidates (float, margin-safe
    # superset) → exact-decimal rescore of candidates only — the
    # embcos_pairs three-phase shape, cluster-bounded. The exact
    # rescore keeps every emitted cosine bit-identical to the oracle's
    # brute-force-within-cluster decimal arithmetic.
    e_k = e.select("vec_id", "embedding").join(
        ak.select("vec_id", "k"), "vec_id"
    )
    cand = _cluster_gemm_candidates(e_k, SEMANTIC_COS_THRESHOLD)
    dup_pairs = rescore_pairs_exact(e, cand).where(
        F.col("cosine") >= F.lit(SEMANTIC_COS_THRESHOLD)
    )
    if rule == "lowid":
        picked = F.col("vec_b")
    else:
        da = ak.select(F.col("vec_id").alias("vec_a"), F.col("d2").alias("da"))
        db = ak.select(F.col("vec_id").alias("vec_b"), F.col("d2").alias("db"))
        dup_pairs = dup_pairs.join(da, "vec_a").join(db, "vec_b")
        # keep-farthest-from-centroid: prune the CLOSER one; exact
        # integer d2 tie → prune vec_b (vec_a < vec_b, keep lower id)
        picked = F.when(F.col("da") < F.col("db"), F.col("vec_a")).otherwise(
            F.col("vec_b")
        )
    pruned_ids = (
        dup_pairs.select(picked.alias("vec_id"))
        .distinct()
        .withColumn("is_pruned", F.lit(1).cast("long"))
    )
    return ak.join(pruned_ids, "vec_id", "left").select(
        "k",
        "vec_id",
        F.coalesce(F.col("is_pruned"), F.lit(0).cast("long")).alias("pruned"),
    )


@query("q_dedup_semantic", oracle=_semantic_oracle("lowid"))
def q_dedup_semantic(spark, sf_dir):
    """Semantic dedup (SemDeDup, Abbas et al. 2023 shape), keep-lowest-
    id survivor rule — see _semantic_core for the adaptive-K scale
    argument and the cluster-bounded plan shape."""
    return _semantic_core(spark, sf_dir, "lowid", "lowid")


@query("q_dedup_semantic_far", oracle=_semantic_oracle("far"))
def q_dedup_semantic_far(spark, sf_dir):
    """Semantic dedup with the PAPER's survivor rule: within a
    duplicate pair keep the vector FARTHEST from its cluster centroid
    (low-quality/prototypical examples get pruned first). Distance is
    the assignment's exact integer d2, so the rule is deterministic;
    the d2 tie falls back to keep-lowest-id. Same adaptive-K
    cluster-bounded engine as q_dedup_semantic (_semantic_core)."""
    return _semantic_core(spark, sf_dir, "far", "far")
