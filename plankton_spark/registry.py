"""Query/oracle registry — the driver contract (SURVEY.md §2.0).

One declared operator == one named query function registered here,
optionally with a DuckDB oracle SQL string. ``__spark_entry__.py``
surfaces the registry via ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is the equivalent DuckDB SQL (fixture tables are
    pre-registered views). Omit it only for genuinely
    non-SQL-expressible ops (driver then does a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import triggers registration of every module's queries.
    from plankton_spark import queries as _  # noqa: F401

    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    from plankton_spark import queries as _  # noqa: F401

    return dict(_ORACLES)
