"""Additional sources/sinks (SURVEY.md §2.1 note): ORC roundtrip,
text-lines roundtrip, in-memory frames, and a null-safe join — each
with a shadow oracle on the original table (lossy roundtrips fail the
hash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from plankton_spark.io import SCHEMAS, read_table
from plankton_spark.queries.scans import _scratch
from plankton_spark.registry import query


@query(
    "q_scan_orc",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
           MIN(s_name) AS min_name
    FROM supplier
    """,
)
def q_scan_orc(spark, sf_dir):
    """ORC sink → source roundtrip (columnar alternative to parquet)."""
    path = _scratch(sf_dir, "supplier_orc")
    read_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("s_suppkey").cast("long").alias("sum_key"),
        F.min("s_name").alias("min_name"),
    )


@query(
    "q_scan_text",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(LENGTH(r_name)) AS BIGINT) AS total_chars
    FROM region
    """,
)
def q_scan_text(spark, sf_dir):
    """text-lines sink → source (one string column per line)."""
    path = _scratch(sf_dir, "region_text")
    read_table(spark, sf_dir, "region").select("r_name").write.mode("overwrite").text(
        path
    )
    back = spark.read.text(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
    )


@query(
    "q_source_memory",
    oracle="""
    SELECT grp, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total
    FROM (VALUES (0, 1), (0, 2), (1, 3), (1, 4), (2, 5)) AS t(grp, v)
    GROUP BY grp
    """,
)
def q_source_memory(spark, sf_dir):
    """In-memory source (createDataFrame) — the driver-literal path."""
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)], "grp int, v int"
    )
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("total")
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st FROM orders
      WHERE o_orderkey < 500
    ),
    b AS (
      SELECT NULLIF(x, 'P') AS st, tag FROM (
        VALUES ('F', 'final'), ('O', 'open'), ('P', 'pending')
      ) AS t(x, tag)
    )
    SELECT a.o_orderkey, b.tag
    FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
    """,
)
def q_join_nullsafe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    keys match each other instead of dropping out."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    a = o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st"))
    dim = spark.createDataFrame(
        [("F", "final"), ("O", "open"), ("P", "pending")], "x string, tag string"
    ).select(F.nullif("x", F.lit("P")).alias("st"), "tag")
    return a.join(dim, a.st.eqNullSafe(dim.st)).select("o_orderkey", "tag")


@query(
    "q_jdbc_roundtrip",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n_rows,
           CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           MIN(n_name) AS min_name
    FROM nation GROUP BY n_regionkey
    """,
)
def q_jdbc_roundtrip(spark, sf_dir):
    """JDBC sink → partitioned JDBC source, against the Derby embedded
    database whose driver ships inside the Spark distribution (no
    external service needed). The read back uses
    column/lowerBound/upperBound/numPartitions so Spark opens one
    connection PER PARTITION and each executor pulls a key range —
    the shape that parallelizes an RDBMS ingest on a real cluster
    (swap the URL for postgres/mysql, nothing else changes). Shadow
    oracle on the original table proves the roundtrip lossless."""
    path = _scratch(sf_dir, "jdbc_derby/db")
    url = f"jdbc:derby:{path};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    (
        read_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.jdbc(url, "NATION_T", mode="overwrite", properties=props)
    )
    back = spark.read.jdbc(
        url,
        "NATION_T",
        column="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
        properties=props,
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_nationkey").cast("long").alias("sum_key"),
        F.min("n_name").alias("min_name"),
    )


@query(
    "q_source_pyds",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(i % 50) AS BIGINT) AS sum_user,
           ROUND(CAST(SUM(CAST((i % 97) / 10.0 AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS sum_value
    FROM (
      SELECT range AS i,
             CASE range % 5 WHEN 0 THEN 'click' WHEN 1 THEN 'error'
                            WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
                            ELSE 'view' END AS event_type
      FROM range(0, 10000)
    ) GROUP BY event_type
    """,
)
def q_source_pyds(spark, sf_dir):
    """Custom connector via the Spark 4 Python DataSource API
    (sources/pyds.py): a deterministic generator whose `partitions()`
    fan out like a file scan. The oracle reproduces the generator
    arithmetic over DuckDB's range() — proving the custom source's
    content, not just its row count."""
    from plankton_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 10_000)
        .option("n_partitions", 8)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("user_id").alias("sum_user"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
            "sum_value"
        ),
    )


@query(
    "q_sink_pyds",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_sink_pyds(spark, sf_dir):
    """Custom SINK via the Spark 4 Python DataSourceWriter
    (sources/pyds.py): write orders through the pyjsonl two-phase-
    commit writer, read the files back, aggregate. The oracle runs on
    the ORIGINAL table, so a lossy writer (dropped row, mangled
    double) breaks the value hash. Doubles survive because
    json.dumps(repr) round-trips IEEE754 exactly."""
    from pyspark.sql import types as T

    from plankton_spark.sources.pyds import register_sink

    register_sink(spark)
    path = _scratch(sf_dir, "orders_pyjsonl")
    (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .write.format("pyjsonl")
        .mode("overwrite")
        .option("path", path)
        .save()
    )
    back_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    back = spark.read.schema(back_schema).json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_custkey").cast("long").alias("sum_cust"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("revenue"),
    )


@query(
    "q_scan_avro",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS sum_bal,
           MIN(c_name) AS min_name
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_scan_avro(spark, sf_dir):
    """Avro sink → source roundtrip through the config-gated connector
    (sources/avro_ocf.py): `spark.plankton.avro.impl=auto` uses the
    native spark-avro JVM module when it is on the classpath (the
    100 TB path) and otherwise the engine's own spec-compliant
    pure-Python OCF codec behind the Python DataSource API —
    deflate-compressed blocks, self-describing schema read back from
    the file header, one partition per file. Shadow oracle on the
    original customer table proves the roundtrip lossless across
    int/long/double/string."""
    from plankton_spark.sources import avro_ocf

    path = _scratch(sf_dir, "customer_avro")
    avro_ocf.write_avro(
        spark,
        read_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
        ),
        path,
    )
    back = avro_ocf.read_avro(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("long").alias("sum_key"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double"), 2
        ).alias("sum_bal"),
        F.min("c_name").alias("min_name"),
    )
