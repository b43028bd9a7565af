"""Kafka-shaped streaming source over append-only JSONL logs
(`spark.readStream.format("jsonltail")`).

The closest broker analogue this sandbox allows (no network): a topic
is a DIRECTORY, each `<name>.jsonl` file in it is a partition, and a
producer appends one JSON object per line. The source tails every
partition file by BYTE offset — the same offset/checkpoint contract
Kafka's source keeps per topic-partition:

- offsets are `{"files": {basename: byte_pos}}`, JSON-checkpointable;
  recovery replays from exact byte positions (`r6 verdict #4`);
- `latestOffset` advances only to the last COMPLETE line (a producer
  caught mid-append never yields a torn record; the tail is consumed
  once its newline lands);
- new partition files are picked up as they appear (offset 0);
- a partition that SHRANK below its checkpointed offset (truncated /
  rewritten log) refuses to stream — silently re-reading rewritten
  bytes would duplicate or corrupt, mirroring the changelog sources'
  refuse-on-rewrite;
- each micro-batch parallelizes one task per partition-file byte
  range, so a many-partition topic scans like any other partitioned
  source.

Records must carry an explicit reader schema (`.schema(...)`) — JSON
lines have no schema registry; per-line parsing projects the declared
fields (missing → NULL, unparsable line → error naming the file and
byte range). Batch reads (`spark.read.format("jsonltail")`) scan each
partition's complete prefix with the same parser.

Scale posture: the parse is per-line Python inside the Python
DataSource worker — right for a tailing ingest edge (bounded by
producer rate, not corpus size). Bulk backfills of large JSONL
archives should use Spark's native `spark.read.json`, which this
source deliberately does not replace.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_CHUNK = 1 << 16


def complete_end(path: str) -> int:
    """Byte offset just past the last complete ('\\n'-terminated) line
    — the furthest a consumer may safely advance."""
    size = os.path.getsize(path)
    if size == 0:
        return 0
    with open(path, "rb") as f:
        pos = size
        while pos > 0:
            take = min(_CHUNK, pos)
            f.seek(pos - take)
            chunk = f.read(take)
            nl = chunk.rfind(b"\n")
            if nl >= 0:
                return pos - take + nl + 1
            pos -= take
    return 0


def append_records(path: str, records: list[dict]) -> None:
    """Producer helper: append records as JSON lines (single O_APPEND
    write + fsync, so concurrent tails never see a torn batch)."""
    payload = "".join(json.dumps(r, default=str) + "\n" for r in records)
    fd = os.open(path, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
    try:
        os.write(fd, payload.encode("utf-8"))
        os.fsync(fd)
    finally:
        os.close(fd)


def _coerce(v, dtype: T.DataType):
    if v is None:
        return None
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dtype, T.BooleanType):
        return bool(v)
    if isinstance(dtype, T.StringType):
        return v if isinstance(v, str) else json.dumps(v)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(v, (int, float)):  # epoch seconds, UTC wall clock
            return datetime.datetime.fromtimestamp(
                v, datetime.timezone.utc
            ).replace(tzinfo=None)
        return datetime.datetime.fromisoformat(str(v))
    if isinstance(dtype, T.DateType):
        return datetime.date.fromisoformat(str(v))
    return v


class _Range(InputPartition):
    def __init__(self, file: str, start: int, end: int):
        self.file = file
        self.start = start
        self.end = end


def _parse_range(part: _Range, schema: T.StructType):
    with open(part.file, "rb") as f:
        f.seek(part.start)
        blob = f.read(part.end - part.start)
    fields = [(fld.name, fld.dataType) for fld in schema.fields]
    for i, line in enumerate(blob.split(b"\n")):
        if not line.strip():
            continue
        try:
            rec = json.loads(line)
            yield tuple(_coerce(rec.get(n), dt) for n, dt in fields)
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"{part.file}[{part.start}:{part.end}] line {i}: "
                f"bad JSONL record: {e}"
            ) from e


def _partition_files(topic_dir: str) -> list[str]:
    if not os.path.isdir(topic_dir):
        raise FileNotFoundError(f"jsonltail: no such topic dir: {topic_dir}")
    return sorted(
        f for f in os.listdir(topic_dir) if f.endswith(".jsonl")
    )


def complete_end_at(path: str, cap: int) -> int:
    """Largest line-complete offset <= cap (the admission-control twin
    of complete_end): scan backwards from cap for the last newline."""
    cap = min(cap, os.path.getsize(path))
    with open(path, "rb") as f:
        pos = cap
        while pos > 0:
            step = min(_CHUNK, pos)
            f.seek(pos - step)
            buf = f.read(step)
            idx = buf.rfind(b"\n")
            if idx >= 0:
                return pos - step + idx + 1
            pos -= step
    return 0


def next_line_end(path: str, lo: int) -> int:
    """Offset just past the FIRST complete line after lo (the
    minimum-progress guarantee when one record exceeds the byte
    budget), or lo when no complete line has landed yet."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(lo)
        pos = lo
        while pos < size:
            buf = f.read(_CHUNK)
            if not buf:
                break
            idx = buf.find(b"\n")
            if idx >= 0:
                return pos + idx + 1
            pos += len(buf)
    return lo


class JsonlTailDataSource(DataSource):
    """Options: `path` (topic directory, required);
    `maxBytesPerTrigger` (optional int) throttles each partition to
    that many bytes per micro-batch — the admission-control knob
    Kafka's maxOffsetsPerTrigger provides, so a huge backlog drains
    in bounded batches instead of one giant first batch. The reader
    schema must be supplied with `.schema(...)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonltail"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("jsonltail: 'path' option is required")
        return p

    def schema(self):
        raise ValueError(
            "jsonltail: records have no schema registry — pass an explicit "
            "reader schema with .schema(...)"
        )

    def reader(self, schema) -> "JsonlTailBatchReader":
        return JsonlTailBatchReader(self._path(), schema)

    def streamReader(self, schema) -> "JsonlTailStreamReader":
        return JsonlTailStreamReader(
            self._path(),
            schema,
            max_bytes=int(self.options.get("maxBytesPerTrigger", 0) or 0),
        )


class JsonlTailBatchReader(DataSourceReader):
    def __init__(self, path: str, schema: T.StructType):
        self.path = path
        self.s = schema

    def partitions(self):
        out = []
        for name in _partition_files(self.path):
            full = os.path.join(self.path, name)
            end = complete_end(full)
            if end > 0:
                out.append(_Range(full, 0, end))
        return out or [_Range("", 0, 0)]

    def read(self, partition: _Range):
        if not partition.file:
            return
        yield from _parse_range(partition, self.s)


class JsonlTailStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: T.StructType, max_bytes: int = 0):
        self.path = path
        self.s = schema
        self.max_bytes = max_bytes
        self._planned: dict | None = None

    def initialOffset(self) -> dict:
        # only ever called on a CHECKPOINT-LESS fresh start, so zero
        # is a legitimate throttle baseline from here on — a restart
        # skips this call and keeps its unthrottled first batch (the
        # offset-regression guard)
        self._planned = {}
        return {"files": {}}

    def latestOffset(self) -> dict:
        tails = {
            name: complete_end(os.path.join(self.path, name))
            for name in _partition_files(self.path)
        }
        if self.max_bytes and self._planned is not None:
            # admission control: each partition advances at most
            # max_bytes past the PREVIOUS plan, snapped back to a line
            # boundary; a single over-budget record still advances one
            # whole line (progress guarantee). A FRESH query's first
            # batch throttles from zero (initialOffset set the
            # baseline — the pre-existing-backlog case the option
            # exists for); a RESTART's first batch is unthrottled:
            # this API receives no checkpointed start, and capping
            # from zero would re-plan an end BELOW the checkpoint —
            # the offset-regression failure the truncation guard
            # refuses.
            capped = {}
            for name, hi in tails.items():
                lo = self._planned.get(name, 0)
                full = os.path.join(self.path, name)
                if hi - lo > self.max_bytes:
                    hi2 = complete_end_at(full, lo + self.max_bytes)
                    hi = hi2 if hi2 > lo else min(hi, next_line_end(full, lo))
                capped[name] = max(hi, lo)
            tails = capped
        self._planned = dict(tails)
        return {"files": tails}

    def partitions(self, start: dict, end: dict):
        starts = start.get("files", {})
        out = []
        for name, hi in sorted(end.get("files", {}).items()):
            lo = starts.get(name, 0)
            full = os.path.join(self.path, name)
            if not os.path.exists(full):
                raise ValueError(
                    f"jsonltail: checkpointed partitions disappeared: "
                    f"[{name!r}] — refusing to silently drop their tail"
                )
            cur = os.path.getsize(full)
            if cur < hi or hi < lo:
                # three truncation shapes, all fatal: the file shrank
                # under the planned end (mid-batch rewrite), or the
                # END itself was re-planned below the checkpointed
                # START (restart after truncation: latestOffset < lo)
                # — proceeding would silently regress the offset and
                # drop/corrupt records
                raise ValueError(
                    f"jsonltail: partition {name} shrank below the "
                    f"planned range ({cur=} {lo=} {hi=}) — the log was "
                    "truncated or rewritten; cannot resume without "
                    "duplicating or corrupting records"
                )
            if hi > lo:
                out.append(_Range(full, lo, hi))
        # a checkpointed partition missing from `end` means the file
        # vanished — same refusal as truncation
        gone = set(starts) - set(end.get("files", {}))
        if gone:
            raise ValueError(
                f"jsonltail: checkpointed partitions disappeared: "
                f"{sorted(gone)} — refusing to silently drop their tail"
            )
        return out

    def read(self, partition: _Range):
        yield from _parse_range(partition, self.s)

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration of the jsonltail format."""
    spark.dataSource.register(JsonlTailDataSource)
