"""Math / conditional / cast scalar functions (SURVEY.md §2.8).

Cross-engine cast pitfalls encoded here:
- DuckDB CAST(double AS INT) rounds; Spark truncates → never cast a
  fractional double to int directly, go through FLOOR.
- Spark FLOOR/CEIL return LONG; DuckDB return the input type → oracle
  casts to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_math_basic",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 1) AS price_r1,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           ABS(o_totalprice - 200000) AS dist_200k,
           CAST(SIGN(o_totalprice - 200000) AS DOUBLE) AS side_200k,
           o_orderkey % 7 AS key_mod7
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q_math_basic(spark, sf_dir):
    """round/floor/ceil/abs/sign/mod."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 200000).alias("dist_200k"),
        F.signum(F.col("o_totalprice") - 200000).alias("side_200k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "q_math_adv",
    oracle="""
    SELECT o_orderkey,
           ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
           ROUND(LN(o_totalprice), 6) AS price_ln,
           ROUND(LOG10(o_totalprice), 6) AS price_log10,
           ROUND(EXP(o_totalprice / 500000.0), 6) AS price_exp,
           ROUND(POW(o_orderkey % 10, 2), 6) AS key_sq
    FROM orders WHERE o_orderkey < 1000 AND o_totalprice > 0
    """,
)
def q_math_adv(spark, sf_dir):
    """sqrt/ln/log10/exp/pow with domain guards, rounded 6dp."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderkey") < 1000) & (F.col("o_totalprice") > 0)
    )
    return o.select(
        "o_orderkey",
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.log10("o_totalprice"), 6).alias("price_log10"),
        F.round(F.exp(F.col("o_totalprice") / 500000.0), 6).alias("price_exp"),
        F.round(F.pow(F.col("o_orderkey") % 10, 2), 6).alias("key_sq"),
    )


@query(
    "q_cond_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 400000 THEN 'high'
                WHEN o_totalprice >= 150000 THEN 'mid'
                ELSE 'low' END AS price_tier,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           GREATEST(o_totalprice / 1000.0, CAST(o_custkey AS DOUBLE)) AS g_val,
           LEAST(o_totalprice / 1000.0, CAST(o_custkey AS DOUBLE)) AS l_val
    FROM orders WHERE o_orderkey < 2000
    """,
)
def q_cond_case(spark, sf_dir):
    """CASE WHEN tiers / coalesce / nullif / greatest / least."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 400000, "high")
        .when(F.col("o_totalprice") >= 150000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice") / 1000.0, F.col("o_custkey").cast("double")).alias(
            "g_val"
        ),
        F.least(F.col("o_totalprice") / 1000.0, F.col("o_custkey").cast("double")).alias(
            "l_val"
        ),
    )


@query(
    "q_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) AS key_roundtrip,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date_str,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_num
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q_cast(spark, sf_dir):
    """Cast lattice: int↔string↔double↔decimal↔date + try_cast of junk."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").alias("price_int"),
        F.col("o_orderkey").cast("string").cast("double").alias("key_roundtrip"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("date_str"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").alias("prio_num"),
    )
