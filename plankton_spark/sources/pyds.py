"""Spark 4 Python DataSource: a deterministic synthetic-events
connector (SURVEY.md §2.1 — custom-source extension point).

This is the modern way to add a connector without a JVM jar: subclass
`pyspark.sql.datasource.DataSource`, declare a schema, and return a
reader whose `partitions()` drives parallelism — each partition is
read independently on an executor, so a 1000-executor cluster fans
out exactly like a parquet scan. The generator here is arithmetic on
the global row index, making the content reproducible in ANSI SQL
(DuckDB `range()`), which is what lets the driver oracle a *custom
source* end-to-end.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class SyntheticEventsDataSource(DataSource):
    """Options: n_rows (total rows), n_partitions (parallelism)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            n_rows=int(self.options.get("n_rows", 1000)),
            n_partitions=int(self.options.get("n_partitions", 4)),
        )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int):
        self.n_rows = n_rows
        self.n_partitions = n_partitions

    def partitions(self):
        n, p = self.n_rows, self.n_partitions
        bounds = [i * n // p for i in range(p + 1)]
        return [_Slice(bounds[i], bounds[i + 1]) for i in range(p)]

    def read(self, partition: _Slice):
        # Pure function of the global index i — no RNG, no state; a
        # retried/speculated task regenerates identical rows.
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % 50,
                EVENT_TYPES[i % 5],
                (i % 97) / 10.0,
            )


def register(spark) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SyntheticEventsDataSource)
