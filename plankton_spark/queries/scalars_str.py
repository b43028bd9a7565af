"""String / regex scalar functions (SURVEY.md §2.8).

All JVM-side built-ins (whole-stage codegen) — no Python in the row
path. Regex patterns stay in the POSIX-ish intersection of Java regex
(Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_str_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           CAST(length(c_name) AS INTEGER) AS name_len,
           trim('  ' || c_name || ' ') AS name_trim,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           concat_ws('|', c_name, c_mktsegment) AS joined
    FROM customer WHERE c_custkey < 300
    """,
)
def q_str_basic(spark, sf_dir):
    """upper/lower/length/trim/lpad/concat_ws."""
    c = read_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
    )


@query(
    "q_str_substr",
    oracle="""
    SELECT p_partkey,
           substring(p_type, 1, 5) AS type_head,
           split_part(p_type, ' ', 1) AS type_first_word,
           CAST(instr(p_name, 'a') AS BIGINT) AS first_a_pos
    FROM part WHERE p_partkey < 500
    """,
)
def q_str_substr(spark, sf_dir):
    """substring / split-indexing / instr."""
    p = read_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.substring("p_type", 1, 5).alias("type_head"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a_pos"),
    )


@query(
    "q_str_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
           CAST(LENGTH(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels
    FROM part
    WHERE regexp_matches(p_type, '^PROMO')
    """,
)
def q_str_regex(spark, sf_dir):
    """regexp_extract / regexp_replace / rlike filter / extract_all."""
    p = read_table(spark, sf_dir, "part").where(F.col("p_type").rlike("^PROMO"))
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias("n_vowels"),
    )


@query(
    "q_str_misc",
    # DuckDB has no initcap; emulate on single-word-ish names (the
    # fixture names contain no spaces, so per-word == whole-string).
    oracle="""
    SELECT s_suppkey,
           concat(upper(substring(lower(s_name), 1, 1)), substring(lower(s_name), 2)) AS name_initcap,
           reverse(s_name) AS name_rev,
           repeat(substring(s_name, 1, 3), 2) AS head_twice,
           translate(s_name, '#S', '-x') AS name_translated,
           substring(s_name, 1, 4) AS name_left,
           substring(s_name, length(s_name) - 2, 3) AS name_right
    FROM supplier
    """,
)
def q_str_misc(spark, sf_dir):
    """initcap / reverse / repeat / translate / left / right."""
    s = read_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.initcap(F.lower("s_name")).alias("name_initcap"),
        F.reverse("s_name").alias("name_rev"),
        F.repeat(F.substring("s_name", 1, 3), 2).alias("head_twice"),
        F.translate("s_name", "#S", "-x").alias("name_translated"),
        F.substring("s_name", 1, 4).alias("name_left"),
        F.substring("s_name", -3, 3).alias("name_right"),
    )
