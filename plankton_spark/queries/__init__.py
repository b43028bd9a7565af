"""Declared operator surface (SURVEY.md §2) — importing this package
registers every query + oracle into plankton_spark.registry."""

from plankton_spark.queries import (  # noqa: F401
    aggregations,
    delta_interop,
    events_analytics,
    filters,
    graph,
    joins,
    llm_dedup,
    llm_multimodal,
    llm_text,
    llm_vectors,
    scalars_coll,
    scalars_date,
    scalars_math,
    scalars_str,
    scale_patterns,
    scans,
    setops,
    sorts,
    sources_extra,
    streaming_shadows,
    subqueries,
    table_ops,
    udfs,
    windows,
)
