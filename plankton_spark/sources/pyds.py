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
        # retried/speculated task regenerates identical rows. Emitted
        # as Arrow RecordBatches (optimization round 13, guide §4.1):
        # the Python→JVM hop is columnar and the per-row tuple pickle
        # is gone; values are bit-identical to the row form (int64
        # arithmetic, and (i % 97)/10.0 is one correctly-rounded IEEE
        # division in NumPy exactly as in Python). Batches are capped
        # so a huge slice never materializes at once.
        import numpy as np
        import pyarrow as pa

        cap = 65536
        for lo in range(partition.start, partition.end, cap):
            hi = min(lo + cap, partition.end)
            i = np.arange(lo, hi, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(i),
                    pa.array(i % 50),
                    pa.array(np.array(EVENT_TYPES, dtype=object)[i % 5]),
                    pa.array((i % 97) / 10.0),
                ],
                names=["event_id", "user_id", "event_type", "value"],
            )


def register(spark) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SyntheticEventsDataSource)


# -- writer side ------------------------------------------------------
#
# Spark 4 Python DataSourceWriter: the no-jar custom SINK extension
# point. Each task serializes its partition to a uniquely-named JSONL
# file and returns a WriterCommitMessage naming it; the driver-side
# commit() writes a manifest and removes any orphan files (from
# retried/speculative tasks), giving the same two-phase-commit
# atomicity contract a FileFormat sink has. Rows are pure-Python here,
# so this path is for interchange, not the 100 TB hot path — parquet
# remains the performance sink.

import json
import os
import uuid

from pyspark import TaskContext
from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class JsonLinesWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool = True):
        self.path = path
        self.overwrite = overwrite
        # Every file this run writes carries this prefix; commit()/
        # abort() clean up ONLY files bearing it. Without the scoping,
        # an append into a directory holding a previous committed write
        # would delete that data (commit() treated every .jsonl not in
        # this run's messages as an orphan, and abort() removed all).
        self.run_id = uuid.uuid4().hex

    def write(self, iterator) -> _FileCommit:
        # DataSourceArrowWriter (optimization round 13): partitions
        # arrive as Arrow RecordBatches instead of pickled Rows —
        # the JVM→Python hop is columnar Arrow, and to_pylist()
        # yields the same Python natives Row.asDict() did (identical
        # float repr, so byte-identical JSON lines); only the
        # per-row pickle + Row construction cost is gone (guide §4.1)
        pid = TaskContext.get().partitionId()
        name = f"part-{self.run_id}-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "." + name)
        with open(tmp, "w", encoding="utf-8") as f:
            for batch in iterator:
                rows = batch.to_pylist()
                if rows:
                    f.write(
                        "\n".join(
                            json.dumps(r, sort_keys=True) for r in rows
                        )
                        + "\n"
                    )
        os.replace(tmp, os.path.join(self.path, name))
        return _FileCommit(name)

    def _run_files(self):
        prefix = f"part-{self.run_id}-"
        return [
            e
            for e in os.listdir(self.path)
            if e.startswith(prefix) and e.endswith(".jsonl")
        ]

    def commit(self, messages) -> None:
        committed = {m.filename for m in messages if m is not None}
        for existing in self._run_files():
            if existing not in committed:
                os.remove(os.path.join(self.path, existing))  # task-retry orphans
        manifest = os.path.join(self.path, "_manifest.json")
        prior: set[str] = set()
        if not self.overwrite and os.path.exists(manifest):
            with open(manifest, encoding="utf-8") as f:
                # keep only prior files that still exist on disk
                prior = {
                    n
                    for n in json.load(f)
                    if n not in committed and os.path.exists(os.path.join(self.path, n))
                }
        with open(manifest, "w", encoding="utf-8") as f:
            json.dump(sorted(prior | committed), f)

    def abort(self, messages) -> None:
        for existing in self._run_files():
            os.remove(os.path.join(self.path, existing))


class JsonLinesSinkDataSource(DataSource):
    """`df.write.format("pyjsonl").option("path", dir).save()`."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("pyjsonl sink requires .option('path', ...)")
        if overwrite and os.path.isdir(path):
            for existing in os.listdir(path):
                if existing.endswith((".jsonl", ".json")):
                    os.remove(os.path.join(path, existing))
        return JsonLinesWriter(path, overwrite=overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonLinesSinkDataSource)
