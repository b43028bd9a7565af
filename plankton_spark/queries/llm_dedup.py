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

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import query

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = 8
JACCARD_THRESHOLD = 0.8


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


@query(
    "q_dedup_minhash",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sets AS (SELECT doc_id, list(DISTINCT shingle) AS s FROM sh GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(LENGTH(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (LENGTH(a.s) + LENGTH(b.s) - LENGTH(list_intersect(a.s, b.s))),
                 6) AS jaccard
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    WHERE CAST(LENGTH(list_intersect(a.s, b.s)) AS DOUBLE)
          / (LENGTH(a.s) + LENGTH(b.s) - LENGTH(list_intersect(a.s, b.s)))
          >= {JACCARD_THRESHOLD}
    """,
)
def q_dedup_minhash(spark, sf_dir):
    """MinHash + LSH near-dup pairs, exact-verified.

    Pipeline: distinct 5-gram shingles → 64 seeded xxhash64 min-hashes
    per doc → 8 bands × 8 rows → band-bucket self-join for candidates
    → exact Jaccard verification ≥ 0.8. The oracle is the brute-force
    O(n²) Jaccard; LSH must match it exactly at this threshold.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 4, F.lit(1)))
    sh_arr = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 5)))
    )
    sets = d.select("doc_id", sh_arr.alias("s"))

    # Min-hashes computed array-side (pure map, whole-stage codegen —
    # no explode, no shuffle): h_i = min over shingles of
    # xxhash64(seed_i, shingle); band signature hashes its 8 slots.
    def _seeded(i: int):
        # NB: must stay a one-arg lambda — a second parameter would be
        # bound to the array index by F.transform, not the seed.
        return lambda sgl: F.xxhash64(F.lit(i), sgl)

    mins = sets.select(
        "doc_id",
        "s",
        *[
            F.array_min(F.transform("s", _seeded(i))).alias(f"h{i}")
            for i in range(N_PERM)
        ],
    )
    bands = mins.select(
        "doc_id",
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            ).alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    band_rows = bands.selectExpr(
        "doc_id",
        "stack({}, {}) AS (band_idx, band_hash)".format(
            N_BANDS, ", ".join(f"{b}, band{b}" for b in range(N_BANDS))
        ),
    )
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Exact verification on the same shingle arrays.
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    verified = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")).cast("double"))
        .withColumn(
            "jaccard_raw",
            F.col("n_inter") / (F.size("sa") + F.size("sb") - F.col("n_inter")),
        )
        .where(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
    )
    return verified.select(
        "doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard")
    )


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
           ROUND(CAST(LENGTH(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (LENGTH(a.toks) + LENGTH(b.toks)
                    - LENGTH(list_intersect(a.toks, b.toks))), 6) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(LENGTH(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (LENGTH(a.toks) + LENGTH(b.toks) - LENGTH(list_intersect(a.toks, b.toks)))
          >= 0.5
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
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    jac = inter / (F.size("ta") + F.size("tb") - inter)
    return (
        pairs.withColumn("jaccard_raw", jac)
        .where(F.col("jaccard_raw") >= 0.5)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


_DOT_DECIMAL = "decimal(30,12)"


def dot_cosine(a_col: str, b_col: str):
    """Exact-decimal cosine between two float-array columns.

    Per-element double products are IEEE-deterministic; the reduction
    runs in DECIMAL(30,12) so accumulation order cannot matter.
    """
    prod = F.zip_with(
        F.col(a_col),
        F.col(b_col),
        lambda x, y: (x.cast("double") * y.cast("double")).cast(_DOT_DECIMAL),
    )
    dot = F.aggregate(
        prod, F.lit(0).cast(_DOT_DECIMAL), lambda acc, x: (acc + x).cast(_DOT_DECIMAL)
    ).cast("double")
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(
            F.col(c), lambda x: (x.cast("double") * x.cast("double")).cast(_DOT_DECIMAL)
        ),
        F.lit(0).cast(_DOT_DECIMAL),
        lambda acc, x: (acc + x).cast(_DOT_DECIMAL),
    ).cast("double")
    return dot / (F.sqrt(sq(a_col)) * F.sqrt(sq(b_col)))


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


@query(
    "q_dedup_embcos",
    oracle=f"""
    WITH pc AS ({SQL_PAIR_COSINE.format(a_filter="", pair_cond="a.vec_id < b.vec_id")})
    SELECT vec_a, vec_b, ROUND(cosine, 6) AS cosine
    FROM pc WHERE cosine >= 0.4
    """,
)
def q_dedup_embcos(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4), exact
    decimal dot products. Brute-force all-pairs here; the bucketed
    scale path is llm_vectors.q_knn_lsh."""
    e = read_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    cos = dot_cosine("ea", "eb")
    return (
        pairs.withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine"))
    )
