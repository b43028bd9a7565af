"""Array / map / JSON / struct scalar functions (SURVEY.md §2.8).

Hash-safety rules: arrays are emitted either element-rounded (doubles)
or sorted; maps are never emitted raw (sorted key/value projections
instead); both engines index lists 1-based (Spark element_at, DuckDB
[]), which these queries rely on.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.registry import query


@query(
    "q_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(LENGTH(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           ROUND(CAST(embedding[8] AS DOUBLE), 6) AS eighth_component,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_component,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_component,
           CAST(LENGTH(embedding[1:8]) AS INTEGER) AS slice_len
    FROM embeddings WHERE vec_id < 100
    """,
)
def q_array_ops(spark, sf_dir):
    """size / element_at (1-based) / array_min / array_max / slice."""
    e = read_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
        F.round(F.element_at("embedding", 8).cast("double"), 6).alias("eighth_component"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_component"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_component"),
        F.size(F.slice("embedding", 1, 8)).alias("slice_len"),
    )


@query(
    "q_array_explode",
    oracle="""
    SELECT lang, token, cnt FROM (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rn
      FROM (
        SELECT lang, token, COUNT(*) AS cnt
        FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
        )
        GROUP BY lang, token
      )
    ) WHERE rn <= 5
    """,
)
def q_array_explode(spark, sf_dir):
    """explode(split(...)) → token counts → top-5 words per language."""
    d = read_table(spark, sf_dir, "documents")
    tokens = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    counts = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "token", "cnt")
    )


@query(
    "q_array_higherorder",
    # Sum via exact decimal over unnest (order-free); Spark folds the
    # array left-to-right with the same per-element decimal image.
    oracle="""
    SELECT e.vec_id,
           list_transform(e.embedding[1:4], x -> ROUND(CAST(x AS DOUBLE) * 2, 6)) AS first4_doubled,
           CAST(LENGTH(list_filter(e.embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           s.sum_components
    FROM embeddings e
    JOIN (
      SELECT vec_id,
             ROUND(CAST(SUM(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE), 6)
               AS sum_components
      FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) u
      GROUP BY vec_id
    ) s USING (vec_id)
    WHERE e.vec_id < 100
    """,
)
def q_array_higherorder(spark, sf_dir):
    """Higher-order fns: transform / filter / aggregate (lambda)."""
    e = read_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    dec = "decimal(28,10)"
    return e.select(
        "vec_id",
        F.transform(
            F.slice("embedding", 1, 4), lambda x: F.round(x.cast("double") * 2, 6)
        ).alias("first4_doubled"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0).cast(dec),
                lambda acc, x: (acc + x.cast("double").cast(dec)).cast(dec),
            ).cast("double"),
            6,
        ).alias("sum_components"),
    )


@query(
    "q_array_setops",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique_tokens,
           CAST(LENGTH(list_intersect(string_split(text, ' '),
                                      ['the', 'fast', 'key', 'order'])) AS INTEGER) AS n_probe_hits,
           list_has_any(string_split(text, ' '), ['zebra', 'order']) AS mentions_order,
           COALESCE(array_to_string(list_sort(list_distinct(list_intersect(
             string_split(text, ' '), ['the', 'fast', 'key', 'order']))), ','), '') AS probe_csv
    FROM documents WHERE doc_id < 100
    """,
)
def q_array_setops(spark, sf_dir):
    """array_distinct / array_intersect / arrays_overlap / sorted join."""
    d = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    probe = F.array(F.lit("the"), F.lit("fast"), F.lit("key"), F.lit("order"))
    probe2 = F.array(F.lit("zebra"), F.lit("order"))
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.array_distinct(F.array_intersect(toks, probe))).alias("n_probe_hits"),
        F.arrays_overlap(toks, probe2).alias("mentions_order"),
        F.array_join(
            F.sort_array(F.array_distinct(F.array_intersect(toks, probe))), ","
        ).alias("probe_csv"),
    )


@query(
    "q_map_ops",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS type_keys_csv,
           array_to_string(list_transform(list_sort(list(event_type || ':' || CAST(cnt AS VARCHAR))), x -> x), '|') AS type_count_csv
    FROM (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    )
    GROUP BY user_id
    """,
)
def q_map_ops(spark, sf_dir):
    """map_from_entries / map_keys emitted as sorted projections
    (raw MapType never reaches the hasher)."""
    e = read_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    entries = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return entries.select(
        "user_id",
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("type_keys_csv"),
        F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries("m"),
                    lambda kv: F.concat_ws(":", kv["key"], kv["value"].cast("string")),
                )
            ),
            "|",
        ).alias("type_count_csv"),
    )


@query(
    "q_json_get",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_json_get(spark, sf_dir):
    """get_json_object path extraction → typed aggregation."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_json_struct",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
)
def q_json_struct(spark, sf_dir):
    """from_json into a typed struct, then field access + aggregation."""
    e = read_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    parsed = e.withColumn("j", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("user_id").agg(
        F.sum(F.col("j.k")).alias("sum_k"),
        F.max(F.col("j.k")).alias("max_k"),
    )


@query(
    "q_struct_nested",
    oracle="""
    SELECT o_orderstatus,
           o_totalprice AS top_price,
           o_orderkey AS top_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS top_date
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey DESC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
)
def q_struct_nested(spark, sf_dir):
    """Build struct, MAX over struct (lexicographic), nested access."""
    o = read_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderdate").alias("dt"),
    )
    best = o.groupBy("o_orderstatus").agg(F.max(s).alias("best"))
    return best.select(
        "o_orderstatus",
        F.col("best.price").alias("top_price"),
        F.col("best.key").alias("top_orderkey"),
        F.date_format(F.col("best.dt"), "yyyy-MM-dd").alias("top_date"),
    )


@query(
    "q_json_variant",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def q_json_variant(spark, sf_dir):
    """Spark 4 VARIANT ingestion: parse_json → binary variant column,
    typed path access via try_variant_get. Variant keeps shredded
    binary JSON columnar-friendly at scale (no per-row string
    re-parse per field access)."""
    e = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count_if(k.isNotNull()).alias("n_with_k"),
    )


# Variant METADATA v1 for the one-key dictionary ["k"] (parquet
# variant-shredding spec): header 0x01 = version 1 / unsorted bit off /
# 1-byte offsets, dict size 1, offsets [0, 1], UTF-8 bytes "k". The
# metadata is PER-COLUMN-CONSTANT once the shred schema is fixed —
# that constancy is what makes shredding columnar (readers decode the
# dictionary once, not per row).
_VARIANT_META_K = bytes([0x01, 0x01, 0x00, 0x01, 0x6B])


@query(
    "q_json_variant_shredded",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
)
def q_json_variant_shredded(spark, sf_dir):
    """VARIANT SHREDDING round trip (parquet variant-shredding spec
    shape): the variant column is written as the spec's physical
    group — metadata (binary, the variant dictionary), value (binary
    residual, null when fully shredded), typed_value (one nested
    {value, typed_value} group per shredded field; here $.k as long) —
    then read back with the typed predicate applied to the SHREDDED
    column. The fixture corpus is fully shreddable (every props is a
    {"k": long} object), so every residual value field is null, which
    the spec requires when typed_value is present.

    The scale point of shredding: the k >= 50 filter lands in the
    parquet scan's PushedFilters on the nested typed_value column
    (pinned in tests/test_plans.py) and only that leaf column's pages
    are decoded — a 100 TB variant corpus filters on shredded fields
    at plain-column speed, no per-row binary-variant decode. The
    oracle recomputes from the raw JSON, so a shred-write/read bug or
    a filter semantics drift is a hash mismatch."""
    from plankton_spark.queries.scans import _scratch

    e = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    shredded = e.select(
        "event_id",
        "event_type",
        F.struct(
            F.lit(_VARIANT_META_K).alias("metadata"),
            F.lit(None).cast("binary").alias("value"),
            F.struct(
                F.struct(
                    F.lit(None).cast("binary").alias("value"),
                    k.alias("typed_value"),
                ).alias("k"),
            ).alias("typed_value"),
        ).alias("props_shredded"),
    )
    path = _scratch(sf_dir, "variant_shredded")
    shredded.write.mode("overwrite").parquet(path)
    r = spark.read.parquet(path)
    kk = F.col("props_shredded.typed_value.k.typed_value")
    return (
        r.where(kk >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(kk).alias("sum_k"),
            F.min(kk).alias("min_k"),
        )
    )


# the shredded-field residual column path (variant-shredding spec: for
# each shredded field the group carries {value, typed_value} — exactly
# one non-null when the field is present; value holds the field's
# VARIANT-ENCODED bytes when its runtime type missed the shred type)
_SHRED_K_VALUE = "props_shredded.typed_value.k.value"


@query(
    "q_json_variant_shredded_partial",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ), mixed AS (
      SELECT event_type,
             CASE WHEN k IS NOT NULL AND event_id % 3 = 0
                  THEN NULL ELSE k END AS k_long,
             CASE WHEN k IS NOT NULL AND event_id % 3 = 0
                  THEN 's' || CAST(k AS VARCHAR) END AS k_str
      FROM base
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k_long) AS BIGINT) AS sum_typed,
           CAST(COUNT(k_str) AS BIGINT) AS n_residual,
           CAST(SUM(CAST(substr(k_str, 2) AS BIGINT)) AS BIGINT)
             AS sum_residual
    FROM mixed
    WHERE k_long >= 50 OR k_str IS NOT NULL
    GROUP BY event_type
    """,
)
def q_json_variant_shredded_partial(spark, sf_dir):
    """PARTIAL variant shredding (the spec's mixed-type case, round-10
    verdict #2): a corpus where $.k is USUALLY a long but SOMETIMES a
    string ('s' || k on every third event) shreds with typed misses —
    for the string rows typed_value is null and the field's `value`
    column carries the VARIANT-ENCODED residual (short-string
    encoding: header byte (len << 2) | 1 + UTF-8 bytes, per the
    variant binary spec), for the long rows typed_value is set and
    the residual is null — the exactly-one-non-null rule.

    The read is merge-on-read: typed rows aggregate straight off the
    shredded leaf; residual rows DECODE the variant bytes (header
    basic-type check, header-declared length — a malformed residual
    decodes to null and fails the oracle hash) back to the string and
    re-parse its numeric suffix. The typed predicate STILL pushes
    down: the scan's PushedFilters carry
    Or(GreaterThanOrEqual(typed leaf, 50), IsNotNull(residual leaf))
    — both shredded leaves, never the binary metadata — so at 100 TB
    the scan decodes two narrow leaf columns and the variant decode
    runs only on the (rare) residual rows (pinned in
    tests/test_plans.py). Oracle recomputes both populations
    relationally from the raw JSON."""
    from plankton_spark.queries.scans import _scratch

    e = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    is_str = k.isNotNull() & (F.col("event_id") % 3 == 0)
    s = F.concat(F.lit("s"), k.cast("string"))
    # variant short-string encoding of the residual: one header byte
    # (length << 2 | basic_type 1), then the UTF-8 bytes
    hdr = F.unhex(
        F.lpad(F.hex(F.shiftleft(F.length(s), 2) + F.lit(1)), 2, "0")
    )
    val = F.concat(hdr, F.encode(s, "UTF-8"))
    shredded = e.select(
        "event_id",
        "event_type",
        F.struct(
            F.lit(_VARIANT_META_K).alias("metadata"),
            F.lit(None).cast("binary").alias("value"),
            F.struct(
                F.struct(
                    F.when(is_str, val).alias("value"),
                    F.when(~is_str, k).alias("typed_value"),
                ).alias("k"),
            ).alias("typed_value"),
        ).alias("props_shredded"),
    )
    path = _scratch(sf_dir, "variant_shredded_partial")
    shredded.write.mode("overwrite").parquet(path)
    r = spark.read.parquet(path)
    kk = F.col("props_shredded.typed_value.k.typed_value")
    res = F.col(_SHRED_K_VALUE)
    # spec-faithful residual decode: branch on the header's basic type
    # (1 = short string) and take the header-declared length
    hdr_i = F.conv(
        F.hex(F.expr(f"substring({_SHRED_K_VALUE}, 1, 1)")), 16, 10
    ).cast("int")
    k_str = F.when(
        res.isNotNull() & (F.pmod(hdr_i, F.lit(4)) == 1),
        F.decode(
            F.expr(
                f"substring({_SHRED_K_VALUE}, 2, "
                f"(cast(conv(hex(substring({_SHRED_K_VALUE}, 1, 1)), 16, 10)"
                " as int) div 4))"
            ),
            "UTF-8",
        ),
    )
    return (
        r.where((kk >= 50) | res.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(kk).cast("long").alias("sum_typed"),
            F.count_if(k_str.isNotNull()).alias("n_residual"),
            F.sum(F.substring(k_str, 2, 100).cast("long"))
            .cast("long")
            .alias("sum_residual"),
        )
    )


# Variant METADATA v1 for the three-key dictionary ["a","b","s"]
# (header 0x01 = version 1 / 1-byte offsets, dict size 3,
# offsets [0,1,2,3], UTF-8 bytes "abs") — per-column-constant like
# _VARIANT_META_K.
_VARIANT_META_ABS = bytes([0x01, 0x03, 0x00, 0x01, 0x02, 0x03]) + b"abs"


@query(
    "q_json_variant_shredded_nested",
    oracle="""
    SELECT event_type AS s,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_b,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_b
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
)
def q_json_variant_shredded_nested(spark, sf_dir):
    """NESTED variant shredding (the spec's object-in-object
    typed_value groups — the round-11 README limit closed): the
    variant {"a": {"b": long, "s": string}} shreds TWO levels deep,
    each nested field its own {value, typed_value} group inside the
    parent object's typed_value group, every residual null on this
    fully-shreddable corpus per the exactly-one rule.

    The scale point is pushdown THROUGH the nesting: the b >= 50
    predicate reaches the scan as a PushedFilter on the
    doubly-nested leaf (props_shredded.typed_value.a.typed_value.b.
    typed_value) and the GROUP BY reads the sibling string leaf —
    two narrow column chains out of the whole variant group, binary
    metadata never decoded (plan-pinned in tests/test_plans.py).
    The oracle recomputes from the raw JSON."""
    from plankton_spark.queries.scans import _scratch

    e = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")

    def leaf(val):
        return F.struct(
            F.lit(None).cast("binary").alias("value"),
            val.alias("typed_value"),
        )

    shredded = e.select(
        "event_id",
        F.struct(
            F.lit(_VARIANT_META_ABS).alias("metadata"),
            F.lit(None).cast("binary").alias("value"),
            F.struct(
                F.struct(
                    F.lit(None).cast("binary").alias("value"),
                    F.struct(
                        leaf(k).alias("b"),
                        leaf(F.col("event_type")).alias("s"),
                    ).alias("typed_value"),
                ).alias("a"),
            ).alias("typed_value"),
        ).alias("props_shredded"),
    )
    path = _scratch(sf_dir, "variant_shredded_nested")
    shredded.write.mode("overwrite").parquet(path)
    r = spark.read.parquet(path)
    bb = F.col("props_shredded.typed_value.a.typed_value.b.typed_value")
    ss = F.col("props_shredded.typed_value.a.typed_value.s.typed_value")
    return (
        r.where(bb >= 50)
        .groupBy(ss.alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(bb).alias("sum_b"),
            F.min(bb).alias("min_b"),
        )
    )
