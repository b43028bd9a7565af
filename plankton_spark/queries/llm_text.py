"""Text-analysis operators for training-data pipelines
(SURVEY.md §2.11 + the north-star brief: language-ID, quality
scoring, token counting, fingerprinting).

All hot paths are JVM built-ins (split/regexp/sha2/higher-order fns);
nothing here drops to Python. At 100 TB these are embarrassingly
parallel map-side transforms — no shuffle except the final
aggregations.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.functions import round_ratio6
from plankton_spark.io import read_table, table_view
from plankton_spark.registry import query

# Fixed, arbitrary marker lists (the *mechanism* is the deliverable:
# the fixture text is synthetic word salad sharing one vocabulary, so
# any real lexicon would be equally synthetic).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["order", "group", "window"],
    "en": ["the", "a", "fast"],
    "es": ["data", "table", "row"],
    "fr": ["merge", "sort", "key"],
    "zh": ["scan", "hash", "join"],
}

STOPWORDS = ["the", "a", "value", "data"]


@query(
    "q_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           ROUND(CAST(SUM(CAST(LENGTH(u.tok) AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_token_len,
           MAX(CAST(LENGTH(text) = n_chars AS BOOLEAN)) AS chars_ok
    FROM (SELECT doc_id, text, n_chars, unnest(string_split(text, ' ')) AS tok
          FROM documents) u
    GROUP BY doc_id, text
    """,
)
def q_text_stats(spark, sf_dir):
    """Per-doc token stats + n_chars recomputation check."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    dec = "decimal(18,4)"
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.aggregate(
                toks,
                F.lit(0).cast(dec),
                lambda acc, t: (acc + F.length(t).cast(dec)).cast(dec),
            ).cast("double")
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
        (F.length("text") == F.col("n_chars")).alias("chars_ok"),
    )


@query(
    "q_text_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))),
                          ' +', ' ', 'g') AS norm_text,
           CAST(LENGTH(regexp_replace(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))),
                       ' +', ' ', 'g')) AS INTEGER) AS norm_len
    FROM documents WHERE doc_id < 200
    """,
)
def q_text_normalize(spark, sf_dir):
    """Normalization: lowercase, strip punctuation, collapse runs of
    whitespace — the canonical pre-dedup transform."""
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    norm = F.regexp_replace(
        F.trim(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))), " +", " "
    )
    return d.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


@query(
    "q_text_lang_agg",
    oracle="""
    WITH per_doc AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_chars
      FROM documents GROUP BY lang, source
    ),
    types AS (
      SELECT lang, source, COUNT(DISTINCT tok) AS n_token_types
      FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY lang, source
    )
    SELECT lang, source, n_docs, mean_chars, n_token_types
    FROM per_doc JOIN types USING (lang, source)
    """,
)
def q_text_lang_agg(spark, sf_dir):
    """Docs, mean length, distinct token types per (lang, source)."""
    d = read_table(spark, sf_dir, "documents")
    per_doc = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_chars"),
    )
    types = (
        d.select("lang", "source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "source")
        .agg(F.countDistinct("tok").alias("n_token_types"))
    )
    return per_doc.join(types, ["lang", "source"])


def _langid_scores_sql() -> str:
    rows = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        cond = " OR ".join(f"tok = '{m}'" for m in markers)
        rows.append(
            f"SELECT doc_id, '{lang}' AS cand,"
            f" CAST(COUNT(CASE WHEN {cond} THEN 1 END) AS BIGINT) AS score"
            " FROM toks GROUP BY doc_id"
        )
    return " UNION ALL ".join(rows)


@query(
    "q_text_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    scores AS ({_langid_scores_sql()})
    SELECT doc_id, cand AS predicted_lang, score
    FROM scores
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) = 1
    """,
)
def q_text_langid(spark, sf_dir):
    """Language-ID by marker-token scoring: count marker hits per
    candidate language, argmax with alphabetical tie-break."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    scores = None
    for lang, markers in sorted(LANG_MARKERS.items()):
        s = toks.groupBy("doc_id").agg(
            F.count_if(F.col("tok").isin(markers)).alias("score")
        ).select("doc_id", F.lit(lang).alias("cand"), "score")
        scores = s if scores is None else scores.unionByName(s)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("predicted_lang"), "score")
    )


@query(
    "q_text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS nc,
             CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS nt,
             CAST(LENGTH(list_filter(string_split(text, ' '),
               x -> {' OR '.join(f"x = '{s}'" for s in STOPWORDS)})) AS BIGINT) AS ns
      FROM documents
    ),
    r AS (
      SELECT doc_id, nc, nt, ns,
             CASE WHEN nc >= 400 THEN 1 ELSE nc END AS lp,
             CASE WHEN nc >= 400 THEN 1 ELSE 400 END AS lq
      FROM t
    )
    SELECT doc_id,
           CAST((2*lp*1000000 + lq) // (2*lq) AS DOUBLE)/1000000.0
             AS len_score,
           CAST((2*ns*1000000 + nt) // (2*nt) AS DOUBLE)/1000000.0
             AS stopword_ratio,
           CAST((2*(nc-nt+1)*1000000 + nt) // (2*nt) AS DOUBLE)/1000000.0
             AS avg_word_len,
           CAST((2*(lp*nt + lq*ns)*1000000 + 2*lq*nt) // (4*lq*nt)
                AS DOUBLE)/1000000.0 AS quality
    FROM r
    """,
)
def q_text_quality(spark, sf_dir):
    """Quality scoring: length score, stopword ratio, avg word length,
    blended quality metric (the heuristics used to filter pretraining
    corpora, over a synthetic corpus).

    Determinism (round-12 sf0.1 soak finding): every score is a
    RATIONAL p/q of small integers, and ROUND(double, 6) hits
    exactly-representable x.xxxxxx5 ties where Spark (HALF_UP) and
    DuckDB (half-even) disagree — the blended quality first did at
    sf0.1 (0.5046875). Both sides now round the EXACT rational with
    integer arithmetic — half-up as floor((2·p·10⁶ + q) / (2q)),
    identical truncating division on positive BIGINTs in either
    engine — then divide by 10⁶ in double (same int → same double).
    No double ever feeds a rounding decision."""
    # Parsed as ONE SQL text (optimization round 13): the expression
    # chain cost ~180 ms of py4j construction per build. Same tree as
    # the DataFrame form it replaces: the CTE pre-projects the integer
    # triple (split/filter evaluate once per row — CollapseProject
    # refuses to inline a non-cheap expr referenced by several
    # consumers, in either formulation), and each score is
    # round_ratio6's exact int64 half-up form (p·2e6 + q) DIV (2q).
    table_view(spark, sf_dir, "documents")
    in_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return spark.sql(
        f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(n_chars AS BIGINT) AS nc,
                 CAST(size(split(text, ' ')) AS BIGINT) AS nt,
                 CAST(size(filter(split(text, ' '),
                                  x -> x IN ({in_list}))) AS BIGINT) AS ns
          FROM documents
        ),
        r AS (
          SELECT doc_id, nc, nt, ns,
                 CAST(CASE WHEN nc >= 400 THEN 1 ELSE nc END AS BIGINT)
                   AS lp,
                 CAST(CASE WHEN nc >= 400 THEN 1 ELSE 400 END AS BIGINT)
                   AS lq
          FROM base
        )
        SELECT doc_id,
               CAST((lp * 2000000 + lq) DIV (lq * 2) AS DOUBLE)
                 / 1000000.0 AS len_score,
               CAST((ns * 2000000 + nt) DIV (nt * 2) AS DOUBLE)
                 / 1000000.0 AS stopword_ratio,
               CAST(((nc - nt + 1) * 2000000 + nt) DIV (nt * 2) AS DOUBLE)
                 / 1000000.0 AS avg_word_len,
               CAST(((lp * nt + lq * ns) * 2000000 + 2 * lq * nt)
                    DIV (2 * lq * nt * 2) AS DOUBLE)
                 / 1000000.0 AS quality
        FROM r
        """
    )


@query(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(LENGTH(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER)
             AS n_bpe_ish,
           CAST(LENGTH(regexp_extract_all(text, '[a-z]{1,4}')) AS INTEGER) AS n_subword
    FROM documents WHERE doc_id < 250
    """,
)
def q_text_tokens(spark, sf_dir):
    """Token counting: whitespace tokens vs BPE-ish regex pieces vs
    fixed-width subword chunks."""
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).alias(
            "n_bpe_ish"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0)).alias("n_subword"),
    )


@query(
    "q_text_chunks",
    oracle="""
    SELECT doc_id, chunk_idx,
           array_to_string(toks[chunk_idx * 25 + 1 : chunk_idx * 25 + 50], ' ') AS chunk_text,
           CAST(LENGTH(toks[chunk_idx * 25 + 1 : chunk_idx * 25 + 50]) AS INTEGER) AS chunk_len
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks,
             unnest(generate_series(0,
               CAST(CEIL(GREATEST(LENGTH(string_split(text, ' ')) - 25, 1) / 25.0) AS BIGINT) - 1))
               AS chunk_idx
      FROM documents WHERE doc_id < 100
    )
    """,
)
def q_text_chunks(spark, sf_dir):
    """Sliding-window chunking: 50-token chunks, stride 25 (overlap
    25) — the context-window packing transform. Pure array ops, no
    Python in the row path."""
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.greatest(F.size(toks) - 25, F.lit(1)) / 25.0).cast("long")
    chunks = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_idx") * 25 + 1, F.lit(50)
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("chunk_len"),
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS n,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len
      FROM tok GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok
    ),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND((CAST(tf.n AS DOUBLE) / tf.doc_len)
                   * LN(CAST(n_docs.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n_docs
    )
    SELECT doc_id, tok AS top_token, tfidf
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) = 1
    """,
)
def q_text_tfidf(spark, sf_dir):
    """TF-IDF: term frequency x inverse document frequency; emits each
    doc's top-scoring token (tie-broken). The df side is tiny (vocab)
    → broadcast; tf is one explode + two aggregations."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    doc_len = Window.partitionBy("doc_id")
    tf = tf.withColumn("doc_len", F.sum("n").over(doc_len))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        F.round(
            (F.col("n").cast("double") / F.col("doc_len"))
            * F.log(F.lit(float(n_docs)) / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_token"), "tfidf")
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(lower(text)) AS fp,
           substring(sha256(lower(text)), 1, 8) AS fp_bucket,
           CAST(LENGTH(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents WHERE doc_id < 250
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: content hash + bucket prefix (the
    building block of exact dedup and shard-stable sampling)."""
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
    fp = F.sha2(F.lower("text"), 256)
    return d.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("fp_bucket"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


PACK_BUDGET = 2000  # tokens per training shard
PACK_BLOCK_SPAN = 64  # doc_ids per block; raise until a block fits one task


@query(
    "q_text_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, LENGTH(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT lang, doc_id, n_tok,
             SUM(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM t
    )
    SELECT lang,
           CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
    FROM c GROUP BY lang, shard_id
    """,
)
def q_text_pack(spark, sf_dir):
    """Sequence packing: assign docs to fixed-token-budget training
    shards, greedy by doc_id order within each lang (shard = tokens
    seen before the doc, integer-divided by the budget).

    Two-level prefix sum so no language ever serializes through one
    task (there are ~5 langs — a plain partitionBy(lang) window would
    pull the whole English corpus into a single straggler at 100 TB):
    doc_id ranges form blocks (blk = doc_id div span, order-preserving
    within lang), the heavy running sum runs per (lang, blk), and a
    tiny per-(lang, blk) total frame — one row per block, windowed per
    lang at block granularity — supplies each block's starting offset
    via a broadcast join. cum = in-block prefix + block offset is
    identical to the single-window form, so shard assignment (and the
    oracle hash) is unchanged."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.floor(F.col("doc_id") / F.lit(PACK_BLOCK_SPAN)).alias("blk"),
    )
    w_in = (
        Window.partitionBy("lang", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_in", F.sum("n_tok").over(w_in))
    w_blk = (
        Window.partitionBy("lang")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        t.groupBy("lang", "blk")
        .agg(F.sum("n_tok").alias("blk_tok"))
        .withColumn("off", F.coalesce(F.sum("blk_tok").over(w_blk), F.lit(0)))
        .select("lang", "blk", "off")
    )
    cum = F.col("cum_in") + F.col("off")
    return (
        c.join(F.broadcast(offsets), ["lang", "blk"])
        .withColumn(
            "shard_id",
            F.floor((cum - F.col("n_tok")) / F.lit(float(PACK_BUDGET))),
        )
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
        )
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (
      SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tok FROM counts GROUP BY doc_id
    ),
    top AS (
      SELECT doc_id, tok AS top_token, cnt
      FROM counts
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY cnt DESC, tok
      ) = 1
    )
    SELECT t.doc_id, t.top_token,
           CAST((2 * (t.cnt) * 1000000 + (tot.n_tok)) // (2 * (tot.n_tok)) AS DOUBLE) / 1000000.0 AS top_ratio,
           CAST(10 * t.cnt > tot.n_tok AS BOOLEAN) AS repetitious
    FROM top t JOIN tot USING (doc_id)
    """,
)
def q_text_repetition(spark, sf_dir):
    """Repetition scoring (Gopher-style quality rule): most frequent
    token's share of the doc; docs above 10% are flagged. Explode →
    two hash aggs → per-doc top-1 via WindowGroupLimit — all JVM
    built-ins, map-side partial aggs at scale."""
    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.groupBy("doc_id").agg(F.sum("cnt").cast("long").alias("n_tok"))
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), "tok")
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_token"), "cnt")
    )
    # exact-rational rounding + integer threshold (round-12 half-tie
    # hardening): cnt/n_tok is a small-integer ratio — the ROUND-tie
    # class the sf0.1 soak caught in q_text_quality
    return top.join(tot, "doc_id").select(
        "doc_id",
        "top_token",
        round_ratio6(F.col("cnt"), F.col("n_tok")).alias("top_ratio"),
        (F.col("cnt") * 10 > F.col("n_tok")).alias("repetitious"),
    )


@query(
    "q_text_redact",
    oracle="""
    WITH r AS (
      SELECT c_nationkey,
             c_name,
             regexp_replace(c_name, '[0-9]', '#', 'g') AS redacted
      FROM customer
    )
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN redacted <> c_name THEN 1 ELSE 0 END) AS BIGINT)
             AS n_redacted,
           CAST(COUNT(DISTINCT redacted) AS BIGINT) AS n_distinct_forms
    FROM r GROUP BY c_nationkey
    """,
)
def q_text_redact(spark, sf_dir):
    """PII-style redaction pattern: mask digit runs, then audit how
    many rows changed and how many distinct surface forms remain per
    nation (re-identification risk check). Spark regexp_replace is
    global by default; DuckDB needs the 'g' flag — dialect delta
    pinned here."""
    c = read_table(spark, sf_dir, "customer")
    r = c.select(
        "c_nationkey",
        "c_name",
        F.regexp_replace("c_name", "[0-9]", "#").alias("redacted"),
    )
    return r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("redacted") != F.col("c_name"), 1).otherwise(0))
        .cast("long")
        .alias("n_redacted"),
        F.countDistinct("redacted").alias("n_distinct_forms"),
    )


@query(
    "q_text_entropy",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           ROUND(
             LOG2(len(toks)) - list_sum(
               list_transform(
                 list_sort(list_transform(list_distinct(toks),
                                          t -> len(list_filter(toks, x -> x = t)))),
                 c -> c * LOG2(c))) / len(toks),
             6) AS entropy_bits
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def q_text_entropy(spark, sf_dir):
    """Shannon token-entropy per document (quality signal: near-zero
    entropy = degenerate repetition; ~log2(n) = all-unique tokens).

    Shape: H = log2(L) - sum(c*log2(c))/L over token counts c —
    computed entirely with higher-order array functions (no explode,
    no shuffle; one codegen'd projection, embarrassingly parallel at
    100 TB). Counts are sorted before the fold so the FP summation
    order is engine-identical; final round(6) absorbs libm log2 ulp
    differences."""
    toks = F.split("text", " ")
    counts = F.array_sort(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    ent = F.round(
        F.log2(F.size(toks))
        - F.aggregate(counts, F.lit(0.0), lambda acc, c: acc + c * F.log2(c))
        / F.size(toks),
        6,
    )
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        ent.alias("entropy_bits"),
    )


EVAL_SET_MAX_ID = 20  # doc_id < 20 is the held-out eval slice
CONTAM_NGRAM = 8


@query(
    "q_contamination",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, GREATEST(LENGTH(string_split(text, ' ')) - {CONTAM_NGRAM - 1}, 1)),
               i -> array_to_string((string_split(text, ' '))[i:i + {CONTAM_NGRAM - 1}], ' '))) AS grams
      FROM documents
    ),
    eg AS (
      SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id < {EVAL_SET_MAX_ID}
    ),
    tg AS (
      SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id >= {EVAL_SET_MAX_ID}
    )
    SELECT tg.doc_id,
           COUNT(DISTINCT tg.gram) AS n_shared_grams,
           CAST(TRUE AS BOOLEAN) AS contaminated
    FROM tg JOIN eg USING (gram)
    GROUP BY tg.doc_id
    """,
)
def q_contamination(spark, sf_dir):
    """Train/eval contamination detection: training docs sharing any
    8-gram with the held-out eval slice (doc_id < 20) — the
    decontamination step every LLM data pipeline runs before training.

    Shape: distinct 8-grams per doc (one pass), eval grams are a small
    broadcast set, candidates come from a gram-equality hash join —
    shuffles grams, never documents, and never goes all-pairs. At
    100 TB you hash the grams (xxhash64, as q_dedup_minhash does) so
    the join keys are 8-byte longs instead of strings; the string form
    here mirrors the oracle exactly."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (CONTAM_NGRAM - 1), F.lit(1)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, CONTAM_NGRAM)))
    )
    g = d.select("doc_id", grams.alias("grams"))
    eg = (
        g.where(F.col("doc_id") < EVAL_SET_MAX_ID)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    tg = g.where(F.col("doc_id") >= EVAL_SET_MAX_ID).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        tg.join(F.broadcast(eg), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
        .select("doc_id", "n_shared_grams", F.lit(True).alias("contaminated"))
    )


@query(
    "q_source_mix",
    oracle="""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT *, CAST(FLOOR(SQRT(total_chars)) AS BIGINT) AS s
      FROM per_src
    )
    SELECT source, n_docs, total_chars,
           ROUND(CAST(s AS DOUBLE) / (SELECT SUM(s) FROM scaled), 6) AS mix_weight,
           CAST((s * 1000000) // CAST((SELECT SUM(s) FROM scaled) AS BIGINT)
                AS BIGINT) AS token_budget
    FROM scaled
    """,
)
def q_source_mix(spark, sf_dir):
    """Temperature-scaled source mixing for a pretraining data mix:
    per-source corpus mass is raised to alpha=0.5 (sqrt — the standard
    way to up-weight small high-quality sources without drowning in
    the biggest crawl), normalized into mixing weights, and converted
    to a concrete per-source token budget out of 1M.

    Determinism: the alpha-scaling goes through FLOOR(SQRT(bigint)) →
    integer, and the budget through integer division, so every output
    but the (6dp-rounded) weight is exact integer arithmetic in both
    engines. Scale: one map-side-combinable hash-agg over the corpus;
    the per-source table (dozens of rows) then broadcasts — the 100 TB
    cost is the single scan."""
    d = read_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    scaled = per_src.withColumn(
        "s", F.floor(F.sqrt(F.col("total_chars"))).cast("long")
    )
    total_s = scaled.agg(F.sum("s").alias("ts"))
    return (
        scaled.crossJoin(F.broadcast(total_s))
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.round(F.col("s").cast("double") / F.col("ts"), 6).alias("mix_weight"),
            F.expr("s * 1000000 DIV ts").alias("token_budget"),
        )
    )


@query(
    "q_text_filter_chain",
    oracle="""
    WITH m AS (
      SELECT doc_id, source,
             LENGTH(string_split(text, ' ')) AS wc,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / LENGTH(string_split(text, ' ')) AS mwl,
             CAST(LENGTH(regexp_replace(text, '[a-z]', '', 'g')) AS DOUBLE)
               / LENGTH(text) AS nonalpha,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, '.', '')) AS DOUBLE)
               / LENGTH(string_split(text, ' ')) AS dots_per_word
      FROM documents
    ),
    r AS (
      SELECT source,
             (wc BETWEEN 40 AND 5000)          AS ok_wordcount,
             (mwl BETWEEN 2.0 AND 12.0)        AS ok_meanwordlen,
             (nonalpha <= 0.35)                AS ok_alpharatio,
             (dots_per_word <= 0.30)           AS ok_punct
      FROM m
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN NOT ok_wordcount  THEN 1 ELSE 0 END) AS BIGINT)
             AS kill_wordcount,
           CAST(SUM(CASE WHEN NOT ok_meanwordlen THEN 1 ELSE 0 END) AS BIGINT)
             AS kill_meanwordlen,
           CAST(SUM(CASE WHEN NOT ok_alpharatio THEN 1 ELSE 0 END) AS BIGINT)
             AS kill_alpharatio,
           CAST(SUM(CASE WHEN NOT ok_punct      THEN 1 ELSE 0 END) AS BIGINT)
             AS kill_punct,
           CAST(SUM(CASE WHEN ok_wordcount AND ok_meanwordlen
                          AND ok_alpharatio AND ok_punct
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
    FROM r GROUP BY source
    """,
)
def q_text_filter_chain(spark, sf_dir):
    """Gopher/C4-style quality-filter chain: per-source kill counts
    for each heuristic rule (word-count bounds, mean word length,
    non-alphabetic ratio, punctuation density) plus the survivor count
    after the full chain. All rules are single-pass column
    expressions over one scan — at 100 TB this is the map-side filter
    stage ahead of dedup, and the per-rule kill counts are the
    monitoring signal for a mis-tuned rule killing a whole source.

    Counts are integer-exact; the rule thresholds compare ratios both
    engines compute identically (integer-derived doubles, no
    accumulation order)."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    wc = F.size(toks)
    mwl = F.length(F.replace("text", F.lit(" "), F.lit(""))).cast("double") / wc
    nonalpha = (
        F.length(F.regexp_replace("text", "[a-z]", "")).cast("double")
        / F.length("text")
    )
    dots = (
        (F.length("text") - F.length(F.replace("text", F.lit("."), F.lit(""))))
        .cast("double")
        / wc
    )
    r = d.select(
        "source",
        wc.between(40, 5000).alias("ok_wordcount"),
        mwl.between(2.0, 12.0).alias("ok_meanwordlen"),
        (nonalpha <= 0.35).alias("ok_alpharatio"),
        (dots <= 0.30).alias("ok_punct"),
    )
    survived = (
        F.col("ok_wordcount")
        & F.col("ok_meanwordlen")
        & F.col("ok_alpharatio")
        & F.col("ok_punct")
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((~F.col("ok_wordcount")).cast("int")).cast("long").alias("kill_wordcount"),
        F.sum((~F.col("ok_meanwordlen")).cast("int"))
        .cast("long")
        .alias("kill_meanwordlen"),
        F.sum((~F.col("ok_alpharatio")).cast("int"))
        .cast("long")
        .alias("kill_alpharatio"),
        F.sum((~F.col("ok_punct")).cast("int")).cast("long").alias("kill_punct"),
        F.sum(survived.cast("int")).cast("long").alias("n_survivors"),
    )


HH_K = 200  # heavy hitter = token with count > N/HH_K
MG_CAPACITY = 400  # per-partition Misra-Gries counters (2x K margin)


def hh_structures(spark, sf_dir):
    """(toks, candidates) for the heavy-hitter recount — exposed so
    framework/skewwatch.hh_candidate_skew can observe the candidate
    set the broadcast recount join depends on staying tiny
    (≤ partitions x MG_CAPACITY by the MG eviction bound)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))

    def mg(iterator):
        import pandas as pd

        # weighted Misra-Gries: merge each Arrow batch's value_counts
        # (vectorized — no per-row Python), then while over capacity
        # subtract the smallest counter from all and evict zeros. The
        # uniform subtraction preserves the MG guarantee exactly as
        # unit decrements do, it just batches them.
        counters: dict[str, int] = {}
        for pdf in iterator:
            for tok, cnt in pdf["tok"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            while len(counters) > MG_CAPACITY:
                floor = min(counters.values())
                counters = {
                    t: c - floor for t, c in counters.items() if c > floor
                }
        yield pd.DataFrame({"tok": list(counters.keys())})

    candidates = toks.mapInPandas(mg, "tok string").distinct()
    return toks, candidates


@query(
    "q_heavyhitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM toks, tot
    GROUP BY tok, tot.n
    HAVING COUNT(*) > tot.n / {HH_K}
    """,
)
def q_heavyhitters(spark, sf_dir):
    """EXACT heavy hitters (tokens with count > N/{k}) via the
    two-phase Misra-Gries pattern — the streaming-sketch shape that
    avoids shuffling the full token multiset:

      1. per-partition Misra-Gries with capacity {cap} (mapInPandas,
         one pass, O(cap) state). Pigeonhole guarantee: a token with
         GLOBAL count > N/{k} exceeds n_p/{k} in at least one
         partition, and per-partition MG with capacity >= {k} surfaces
         every token with local count > n_p/cap — so the union of the
         partitions' candidates is a SUPERSET of the true answer.
      2. exact recount restricted to the (tiny, broadcast) candidate
         set + total-count scalar, then the exact threshold filter.

    The output is therefore exact (sketch for candidates, exact for
    the answer) and oracle-checkable, while the full-token shuffle is
    replaced by one shuffle of O(partitions x cap) candidate rows.
    """
    toks, candidates = hh_structures(spark, sf_dir)
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occ") > F.col("n") / HH_K)
        .select("tok", "n_occ")
    )


q_heavyhitters.__doc__ = q_heavyhitters.__doc__.format(k=HH_K, cap=MG_CAPACITY)


FUZZY_BLOCK_CAP = 128  # CI cap on prefix-block width (verify work is width^2)


def fuzzy_blocked(spark, sf_dir):
    """The blocked side of the fuzzy match (one row per candidate with
    its 16-char prefix block key) — exposed so skewwatch can observe
    block widths. The 16-char prefix on 'customer#' + 9-digit names
    leaves the last 2 digits free → blocks of ≤100 by construction;
    a degenerate block key (e.g. the 9-char 'customer#' prefix) puts
    every name in one block and trips FUZZY_BLOCK_CAP in CI."""
    c = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", F.lower("c_name").alias("nm"))
    )
    return c.select("c_custkey", "nm", F.substring("nm", 1, 16).alias("blk"))


@query(
    "q_fuzzy_match",
    oracle="""
    WITH c AS (
      SELECT c_custkey, lower(c_name) AS nm FROM customer WHERE c_custkey < 300
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           levenshtein(a.nm, b.nm) AS dist
    FROM c a JOIN c b
      ON substr(a.nm, 1, 16) = substr(b.nm, 1, 16)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.nm, b.nm) <= 1
    """,
)
def q_fuzzy_match(spark, sf_dir):
    """Fuzzy entity matching: customer-name pairs within edit distance
    1, candidate-blocked on a 16-char name prefix so the self-join is
    an EQUI-join on a DISCRIMINATING block key (fixture names are
    'customer#' + 9 digits — a 9-char block would put every name in
    one bucket, the degenerate-blocking failure this query's first
    draft measured at 60k pairs). Block-then-verify, same shape as the
    LSH dedup: a prefix block can miss early-edit pairs; production
    stacks complementary blocks (prefix, suffix, phonetic), each an
    equi-join, and unions them. Levenshtein runs only inside blocks
    (the verify stage), never across the cross product."""
    c = fuzzy_blocked(spark, sf_dir)
    a = c.select(
        F.col("c_custkey").alias("key_a"), F.col("nm").alias("nm_a"), "blk"
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"), F.col("nm").alias("nm_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("nm_a", "nm_b"))
        .where(F.col("dist") <= 1)
        .select("key_a", "key_b", "dist")
    )


@query(
    "q_text_lm_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, source,
             UNNEST(toks[1:len(toks) - 1]) AS w1,
             UNNEST(toks[2:len(toks)]) AS w2
      FROM t WHERE len(toks) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c FROM bg GROUP BY w1)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(ROUND((LN(c12.c) - LN(c1.c)) * 1000000)
                         AS BIGINT)) AS BIGINT) AS logprob_micro,
           CAST(SUM(CASE WHEN c12.c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons
    FROM bg
    JOIN c12 ON c12.w1 = bg.w1 AND c12.w2 = bg.w2
    JOIN c1 ON c1.w1 = bg.w1
    GROUP BY bg.doc_id
    """,
)
def q_text_lm_score(spark, sf_dir):
    """Corpus-trained bigram language-model scoring (the KenLM-style
    quality signal pretraining pipelines rank documents by): train
    MLE bigram probabilities P(w2|w1) = c(w1,w2)/c(w1·) on the WHOLE
    corpus, then score every document by its total bigram
    log-probability — low scores = improbable word sequences
    (boilerplate, mangled text); n_singletons counts the doc's
    corpus-unique bigrams (a novelty/noise signal).

    Scale shape: two partial-combinable hash aggs build the model
    (c12 vocab²-bounded, c1 vocab-bounded — both aggregate tables,
    NOT corpus-sized), then two equi-joins attach probabilities to
    the corpus bigram stream; AQE broadcasts the model sides when
    small. Determinism: each term ln(c12)-ln(c1) is rounded to
    integer MICRO-nats before the per-doc sum, so the reduction is
    exact integer addition in any order (a raw double sum would be
    partition-order-dependent)."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = F.size("toks")
    bg = (
        d.where(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(c12, ["w1", "w2"]).join(c1, ["w1"])
    )
    term = F.round(
        (F.log(F.col("c12")) - F.log(F.col("c1"))) * 1000000
    ).cast("long")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(term).cast("long").alias("logprob_micro"),
        F.sum((F.col("c12") == 1).cast("int")).cast("long").alias("n_singletons"),
    )


@query(
    "q_text_cooccur",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_pair
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
    ),
    wd AS (SELECT w, COUNT(*) AS n_w FROM tok GROUP BY w),
    nd AS (SELECT COUNT(*) AS n FROM documents)
    SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_docs_pair,
           ROUND(LN(CAST(n_pair AS DOUBLE) * nd.n
                    / (CAST(w1d.n_w AS DOUBLE) * w2d.n_w)), 6) AS pmi
    FROM pairs
    JOIN wd w1d ON w1d.w = pairs.w1
    JOIN wd w2d ON w2d.w = pairs.w2
    CROSS JOIN nd
    ORDER BY n_pair DESC, w1, w2
    LIMIT 20
    """,
)
def q_text_cooccur(spark, sf_dir):
    """Collocation extraction: document-level word co-occurrence with
    PMI — distinct (doc, word) presence, w1<w2 pairs counted per doc,
    PMI = ln(n_pair * N / (n_w1 * n_w2)) (same LN-6dp convention as
    q_text_tfidf), top-20 by count with lexicographic tiebreak. The
    per-doc pair expansion is VOCAB-bounded (fixture vocabulary, like
    any controlled tag/entity set); an open web vocabulary takes a
    frequency cut first — the q_heavyhitters machinery — so the
    expansion stays (cutoff choose 2) per doc, never words²."""
    d = read_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    wd = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    nd = d.agg(F.count(F.lit(1)).alias("n"))
    out = (
        pairs.join(wd.select(F.col("w").alias("w1"), F.col("n_w").alias("nw1")), "w1")
        .join(wd.select(F.col("w").alias("w2"), F.col("n_w").alias("nw2")), "w2")
        .crossJoin(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_docs_pair"),
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.col("n")
                    / (F.col("nw1").cast("double") * F.col("nw2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return out.orderBy(F.col("n_docs_pair").desc(), "w1", "w2").limit(20)


@query(
    "q_text_bpe_pairs",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (
      SELECT w, COUNT(*) AS f FROM words WHERE LENGTH(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair, w, f
      FROM (SELECT w, f, unnest(range(1, LENGTH(w))) AS i FROM wf)
    )
    SELECT pair,
           CAST(SUM(f) AS BIGINT) AS total,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
    FROM pairs GROUP BY pair
    ORDER BY total DESC, pair
    LIMIT 20
    """,
)
def q_text_bpe_pairs(spark, sf_dir):
    """BPE MERGE-CANDIDATE counting — the inner loop of byte-pair-
    encoding tokenizer training: count adjacent character pairs
    across the corpus, each occurrence weighted by its word's corpus
    frequency, and rank the top merge candidates (what the first BPE
    merge would pick). The scale trick is the one real BPE trainers
    use: corpus text folds to a (distinct word → frequency) table
    FIRST — vocabulary-bounded, not corpus-bounded — and the
    quadratic-ish pair expansion (sequence(1, len-1) explode +
    substr) runs over DISTINCT WORDS ONLY, so 100 TB of text costs
    one word-count shuffle plus work proportional to |vocab| x
    avg word length. Ties rank by pair text; counts are exact
    integers end-to-end."""
    d = read_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.length("w") >= 2
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    pairs = wf.select(
        "w",
        "f",
        F.explode(F.expr("sequence(1, length(w) - 1)")).alias("i"),
    ).select(
        F.expr("substr(w, i, 2)").alias("pair"), "w", "f"
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("f").cast("long").alias("total"),
            F.countDistinct("w").cast("long").alias("n_types"),
        )
        .orderBy(F.col("total").desc(), "pair")
        .limit(20)
    )
