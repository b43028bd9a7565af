"""Python UDF / UDAF / UDTF surface (SURVEY.md §2.10).

UDFs are the slow path by design (SURVEY.md §4): everything here is
Arrow-batched (pandas_udf / applyInPandas / mapInPandas / arrow-
optimized @udf), never row-at-a-time pickling. Determinism notes:
- No float reduction happens in raw double: grouped reductions
  quantize through ``decimal.Decimal`` (exact, order-free) and only
  the final quotient returns to double — the exact mirror of the
  oracle's DECIMAL(18,4) sums.
- Per-row double arithmetic (a*(1-b)) is IEEE-identical across
  engines and is emitted raw, unrounded.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from plankton_spark.io import read_table, table_view
from plankton_spark.registry import query


@query(
    "q_udf_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 400000 THEN 'high'
                WHEN o_totalprice >= 150000 THEN 'mid'
                ELSE 'low' END AS tier
    FROM orders WHERE o_orderkey < 2000
    """,
)
def q_udf_python(spark, sf_dir):
    """Scalar Python @udf (Arrow-optimized in Spark 4)."""

    @F.udf(returnType=T.StringType(), useArrow=True)
    def price_tier(p: float) -> str:
        if p >= 400000:
            return "high"
        if p >= 150000:
            return "mid"
        return "low"

    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select("o_orderkey", price_tier("o_totalprice").alias("tier"))


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS discounted
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def q_udf_pandas(spark, sf_dir):
    """Vectorized scalar pandas_udf (Arrow batches, numpy kernel).
    Per-row IEEE double math — emitted raw, bit-identical to SQL."""

    @F.pandas_udf("double")
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    )


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark, sf_dir):
    """Grouped-agg pandas_udf: quantity-weighted average price.

    The reduction runs in exact Decimal (order-insensitive), the final
    divide in double, rounded to 6dp (DECIMAL→DOUBLE casts of very
    large sums can differ by 1 ulp between engines).
    """

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        num = sum(
            (Decimal(repr(p)) * Decimal(repr(q)) for p, q in zip(price, qty)),
            Decimal(0),
        )
        den = sum((Decimal(repr(q)) for q in qty), Decimal(0))
        q = float(num) / float(den)
        return float(Decimal(repr(q)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@query(
    "q_udtf_applyinpandas",
    oracle="""
    SELECT user_id, event_id,
           value - CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS centered
    FROM events WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def q_udtf_applyinpandas(spark, sf_dir):
    """groupBy().applyInPandas: per-group mean-centering (full pandas
    frame per group, Arrow both ways)."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = float(
            sum((Decimal(repr(v)) for v in pdf["value"]), Decimal(0))
        ) / len(pdf)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "centered": pdf["value"] - mean,
            }
        )

    e = read_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    return e.groupBy("user_id").applyInPandas(
        center, schema="user_id long, event_id long, centered double"
    )


@query(
    "q_udtf_mapinpandas",
    oracle="""
    SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_unique
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    GROUP BY doc_id
    """,
)
def q_udtf_mapinpandas(spark, sf_dir):
    """mapInPandas tokenizer: each Arrow batch explodes to
    (doc_id, token) rows; Spark aggregates the result."""

    def tokenize(batches):
        for pdf in batches:
            out = pdf[["doc_id", "text"]].copy()
            out["token"] = out["text"].str.split(" ")
            yield out[["doc_id", "token"]].explode("token")

    d = read_table(spark, sf_dir, "documents")
    toks = d.mapInPandas(tokenize, schema="doc_id long, token string")
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_unique"),
    )


@query(
    "q_udtf_python",
    oracle="""
    SELECT doc_id, chunk_idx, chunk_tokens FROM (
      SELECT doc_id,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx,
             n_tokens,
             n_chunks
      FROM (
        SELECT doc_id,
               CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(CEIL(LENGTH(string_split(text, ' ')) / 10.0) AS BIGINT) AS n_chunks
        FROM documents WHERE doc_id < 100
      )
    ) t
    CROSS JOIN LATERAL (
      SELECT CASE WHEN chunk_idx < n_chunks - 1 THEN 10
                  ELSE n_tokens - 10 * (n_chunks - 1) END AS chunk_tokens
    ) c
    """,
)
def q_udtf_python(spark, sf_dir):
    """Spark 4 Python UDTF: split each doc into 10-token chunks,
    emitting (chunk_idx, chunk_tokens) rows per input row."""

    @F.udtf(returnType="doc_id bigint, chunk_idx bigint, chunk_tokens bigint")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), 10):
                yield doc_id, i // 10, len(toks[i : i + 10])

    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    d.createOrReplaceTempView("docs_for_chunking")
    spark.udtf.register("doc_chunker", Chunker)
    return spark.sql(
        "SELECT c.* FROM docs_for_chunking d, "
        "LATERAL doc_chunker(d.doc_id, d.text) c"
    )


@query(
    "q_udf_sqlfn",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                  WHEN o_totalprice >= 100000 THEN 'mid'
                  ELSE 'low' END AS tier,
             o_totalprice
      FROM orders
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM t GROUP BY tier
    """,
)
def q_udf_sqlfn(spark, sf_dir):
    """SQL scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`):
    custom scalar logic declared ONCE as a named function and reused
    across queries — and unlike every Python UDF in this module,
    Catalyst INLINES the body into the plan (verified: no Python/
    Arrow eval node, full whole-stage codegen), so this is the
    zero-overhead answer for shareable scalar logic at 100 TB. The
    oracle inlines the same CASE by hand."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION plk_price_tier(p DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN p >= 300000 THEN 'high'
                       WHEN p >= 100000 THEN 'mid' ELSE 'low' END"""
    )
    table_view(spark, sf_dir, "orders")
    return spark.sql(
        """SELECT plk_price_tier(o_totalprice) AS tier,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS total_cents
           FROM orders GROUP BY plk_price_tier(o_totalprice)"""
    )


@query(
    "q_udtf_sqlfn",
    oracle="""
    WITH sample AS (
      SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_custkey % 97 = 0
    )
    SELECT sample.ck,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS total_cents
    FROM sample LEFT JOIN orders ON o_custkey = sample.ck
    GROUP BY sample.ck
    """,
)
def q_udtf_sqlfn(spark, sf_dir):
    """SQL TABLE function (`CREATE FUNCTION ... RETURNS TABLE`)
    consumed through a correlated LATERAL join: per sampled customer,
    the function body's filtered scan runs as a decorrelated JOIN
    (Catalyst inlines the TVF body and decorrelates the lateral —
    one shuffle, not per-row re-execution; same plan law as
    q_join_lateral). The oracle is the equivalent relational
    LEFT-join aggregate."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION plk_cust_orders(ck BIGINT)
           RETURNS TABLE (o_orderkey BIGINT, cents BIGINT)
           RETURN SELECT o_orderkey,
                         CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  FROM orders WHERE o_custkey = ck"""
    )
    table_view(spark, sf_dir, "orders")
    return spark.sql(
        """SELECT s.ck,
                  t.n_orders,
                  t.total_cents
           FROM (SELECT DISTINCT o_custkey AS ck FROM orders
                 WHERE o_custkey % 97 = 0) s,
           LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                           CAST(COALESCE(SUM(cents), 0) AS BIGINT)
                             AS total_cents
                    FROM plk_cust_orders(s.ck)) t"""
    )
