"""End-to-end framework pipeline as a declared query: the Operator/
Pipeline/RunLedger machinery (SURVEY.md §2.12) driving a real
multi-stage training-data job — quality filter → exact dedup → token
stats → per-source budget — with a parquet sink, observe() metrics in
the ledger, and fingerprint-chained cache keys. The oracle re-derives
the final table relationally, so a mis-wired DAG edge, a stage
reading the wrong upstream, or a stale cache hit all fail the value
hash (not just a unit test)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.operator import Operator
from plankton_spark.framework.pipeline import Pipeline
from plankton_spark.io import read_table
from plankton_spark.queries.scans import _scratch
from plankton_spark.registry import query


@query(
    "q_pipeline_e2e",
    oracle="""
    WITH filtered AS (
      SELECT doc_id, source, text,
             LENGTH(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE LENGTH(string_split(text, ' ')) BETWEEN 40 AND 5000
    ),
    deduped AS (
      SELECT * FROM filtered
      WHERE doc_id IN (
        SELECT MIN(doc_id) FROM filtered GROUP BY sha256(lower(text)))
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM deduped GROUP BY source
    """,
)
def q_pipeline_e2e(spark, sf_dir):
    """Run the framework DAG for real (ledger rows, observe metrics,
    parquet sink) and return the sink's aggregate."""
    sink = _scratch(sf_dir, "pipe_e2e_sink")
    ledger_path = _scratch(sf_dir, "pipe_e2e_ledger") + ".jsonl"
    shutil.rmtree(sink, ignore_errors=True)

    def load(_inputs):
        return read_table(spark, sf_dir, "documents")

    def quality_filter(inputs):
        d = inputs["load"]
        n_tokens = F.size(F.split("text", " "))
        return d.select(
            "doc_id", "source", "text", n_tokens.alias("n_tokens")
        ).where(n_tokens.between(40, 5000))

    def exact_dedup(inputs):
        f = inputs["quality_filter"]
        keep = (
            f.select("doc_id", F.sha2(F.lower("text"), 256).alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return f.join(keep, "doc_id")

    def budget(inputs):
        return (
            inputs["exact_dedup"]
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
                F.min("doc_id").cast("long").alias("min_doc"),
            )
        )

    pipe = Pipeline("e2e", spark, ledger=RunLedger(ledger_path))
    pipe.add(Operator.wrap("load", load))
    pipe.add(
        Operator.wrap("quality_filter", quality_filter, {"lo": 40, "hi": 5000}),
        deps=["load"],
    )
    pipe.add(Operator.wrap("exact_dedup", exact_dedup), deps=["quality_filter"])
    pipe.add(
        Operator.wrap("budget", budget),
        deps=["exact_dedup"],
        sink_path=sink,
        metrics={"rows": F.count(F.lit(1))},
    )
    results = pipe.run(force=True)
    return results["budget"]
