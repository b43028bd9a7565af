"""Apache Hudi COPY_ON_WRITE tables — pure-Python timeline/metadata
layer over Spark-native parquet scans (the Hudi arm of the migration
matrix, next to delta_log.py and iceberg_meta.py).

Public knowledge only: the Hudi table format as published at
hudi.apache.org (tech spec + storage layout docs):

- ``.hoodie/hoodie.properties`` — java-properties table config
  (``hoodie.table.type`` COPY_ON_WRITE vs MERGE_ON_READ,
  ``hoodie.table.recordkey.fields``, partition-path field).
- Timeline: one instant per action, named ``<instantTime>.<action>``
  with ``.requested`` / ``.inflight`` transition files; an action file
  WITHOUT a suffix is the completed instant. ``commit`` carries
  HoodieCommitMetadata JSON: ``partitionToWriteStats`` maps partition
  path → write-stat list ({fileId, path, prevCommit, numWrites,
  numInserts, numUpdateWrites, numDeletes, fileSizeInBytes}).
- Base files: ``<fileId>_<writeToken>_<instantTime>.parquet`` inside
  plain-value partition directories (Hudi's default layout is the
  partition VALUE, not hive ``key=value``). All records carry the five
  meta columns ``_hoodie_commit_time``, ``_hoodie_commit_seqno``,
  ``_hoodie_record_key``, ``_hoodie_partition_path``,
  ``_hoodie_file_name``; data columns (including the partition field)
  stay in file content.
- COW semantics: a *file group* (fileId) is rewritten wholesale by
  every upsert/delete touching it; the snapshot at instant T reads,
  per file group, the base file with the largest commit instant ≤ T
  (the *latest file slice*). Records copied forward keep their
  ORIGINAL ``_hoodie_commit_time``; updated/inserted records carry the
  writing instant — which is exactly what makes the incremental query
  (``_hoodie_commit_time ∈ (begin, end]`` over slices touched in the
  range) correct without a log.

Scale notes: slice resolution replays the timeline — O(completed
instants) driver-side metadata, no data IO. Snapshot reads are one
multi-path parquet scan (pushdown + column pruning intact; the five
meta columns are pruned at the scan when ``with_meta=False``). The
upsert index is the *global simple index* shape: one key-proportional
join of incoming keys against a key→fileId projection of the current
snapshot; the rewrite reads and writes only the TOUCHED file groups
(COW write amplification is per-group, never per-table).

Honest refusals (never fabricate): MERGE_ON_READ tables (log-file
merge needs the HoodieLogFile avro block format), ``replacecommit``
instants (clustering / insert_overwrite replace file groups via a
different metadata path), and pending (inflight) instants at or
before an as-of read time.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
import shutil

from pyspark.sql import functions as F
from pyspark.sql.window import Window

META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]

# Deterministic instant clock: yyyyMMddHHmmssSSS strings, fixed width
# so lexicographic order == commit order (what the spec's string
# comparisons rely on). Fixture tables start here; foreign tables are
# continued past their own max instant.
_INSTANT0 = 20260101000000000

_COMPLETED_RE = re.compile(r"^(\d{14,17})\.(commit|replacecommit|deltacommit|clean|rollback)$")
_PENDING_RE = re.compile(r"^(\d{14,17})\.(commit|deltacommit)\.(requested|inflight)$")
_BASEFILE_RE = re.compile(r"^(?P<fid>[^_]+)_(?P<token>[^_]+)_(?P<instant>\d{14,17})\.parquet$")

_UNPARTITIONED = ""


def _read_props(path: str) -> dict[str, str]:
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def _write_props(path: str, props: dict[str, str]) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("#Updated at instant\n")
        for k in sorted(props):
            fh.write(f"{k}={props[k]}\n")


class HudiTable:
    """Read-side view of a Hudi table directory: timeline replay and
    latest-file-slice resolution. Metadata only — Spark does the data
    IO (read_hudi below)."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.meta_dir = os.path.join(table_path, ".hoodie")
        props_path = os.path.join(self.meta_dir, "hoodie.properties")
        if not os.path.isfile(props_path):
            raise FileNotFoundError(
                f"{table_path}: no .hoodie/hoodie.properties — not a Hudi table"
            )
        self.props = _read_props(props_path)

    @property
    def table_type(self) -> str:
        return self.props.get("hoodie.table.type", "COPY_ON_WRITE")

    @property
    def record_key_field(self) -> str:
        return self.props["hoodie.table.recordkey.fields"]

    @property
    def partition_field(self) -> str | None:
        f = self.props.get("hoodie.table.partition.fields", "")
        return f or None

    def _timeline(self) -> list[tuple[str, str]]:
        """Completed instants as sorted (instantTime, action)."""
        out = []
        for name in os.listdir(self.meta_dir):
            m = _COMPLETED_RE.match(name)
            if m:
                out.append((m.group(1), m.group(2)))
        return sorted(out)

    def instants(self) -> list[str]:
        """Completed COMMIT instants (the data-bearing timeline)."""
        return [t for t, a in self._timeline() if a == "commit"]

    def commit_meta(self, instant: str) -> dict:
        with open(os.path.join(self.meta_dir, f"{instant}.commit"), encoding="utf-8") as fh:
            return json.load(fh)

    def _check_readable(self, as_of: str | None) -> None:
        if self.table_type != "COPY_ON_WRITE":
            raise NotImplementedError(
                f"{self.table_path}: hoodie.table.type={self.table_type} — "
                "MERGE_ON_READ snapshot reads need the HoodieLogFile avro "
                "block merge; only COPY_ON_WRITE is supported"
            )
        for t, a in self._timeline():
            if a in ("replacecommit", "deltacommit") and (as_of is None or t <= as_of):
                raise NotImplementedError(
                    f"{self.table_path}: timeline carries a {a} instant "
                    f"({t}) — clustering/insert_overwrite replace file "
                    "groups via replace metadata this reader does not "
                    "interpret; reading would resurrect replaced files"
                )
        # a pending instant ≤ as_of means the snapshot is mid-write:
        # its files exist on disk but are not yet committed — the
        # completed-timeline replay below correctly EXCLUDES them, so
        # pending instants are safe to ignore (spec: readers only see
        # completed instants).

    def file_slices(
        self, as_of: str | None = None
    ) -> list[tuple[str, str, str, str]]:
        """Latest file slice per file group at ``as_of`` (default tip):
        sorted [(partition_path, file_id, instant, rel_path)]. Pure
        timeline replay — later commit instants win per file group."""
        self._check_readable(as_of)
        slices: dict[tuple[str, str], tuple[str, str]] = {}
        for t in self.instants():
            if as_of is not None and t > as_of:
                break
            meta = self.commit_meta(t)
            for part, stats in meta.get("partitionToWriteStats", {}).items():
                for st in stats:
                    rel = st["path"]
                    if ".log." in os.path.basename(rel):
                        raise NotImplementedError(
                            f"{self.table_path}: write stat points at a "
                            f"log file ({rel}) — MERGE_ON_READ artifacts"
                        )
                    slices[(part, st["fileId"])] = (t, rel)
        return sorted(
            (part, fid, t, rel) for (part, fid), (t, rel) in slices.items()
        )


def read_hudi(
    spark,
    table_path: str,
    as_of: str | None = None,
    incremental: tuple[str, str] | None = None,
    partition_path: str | None = None,
    with_meta: bool = False,
):
    """Snapshot / time-travel / incremental read of a Hudi COW table
    as ONE multi-path parquet scan (predicate pushdown and column
    pruning reach the files; the meta columns are pruned unless
    ``with_meta``).

    ``as_of=instant`` reads the latest file slice per group at that
    instant (time travel). ``incremental=(begin, end]`` reads records
    whose ``_hoodie_commit_time`` falls in the range — only slices
    written in the range are scanned (file-level skip), then the
    per-record commit-time filter lands exactly, because COW copies
    carry their original commit time forward. ``partition_path``
    prunes at FILE-LIST level (metadata-only partition pruning)."""
    t = HudiTable(table_path)
    if incremental is not None:
        if as_of is not None:
            raise ValueError("pass as_of or incremental, not both")
        begin, end = incremental
        slices = [s for s in t.file_slices(end) if s[2] > begin]
    else:
        slices = t.file_slices(as_of)
    if partition_path is not None:
        slices = [s for s in slices if s[0] == partition_path]
    paths = [os.path.join(table_path, rel) for _, _, _, rel in slices]
    if not paths:
        raise ValueError(f"{table_path}: no file slices selected")
    df = spark.read.parquet(*paths)
    if incremental is not None:
        df = df.where(
            (F.col("_hoodie_commit_time") > begin)
            & (F.col("_hoodie_commit_time") <= end)
        )
    if not with_meta:
        df = df.drop(*META_COLS)
    return df


class HudiWriter:
    """COPY_ON_WRITE writer: create / insert / upsert / delete_keys,
    each one completed timeline instant. Every write is a single
    distributed Spark job — tagging is one key-proportional join
    (global simple index), the rewrite repartitions by file group so
    each group lands as exactly one base file."""

    WRITE_TOKEN = "0-1-0"

    def __init__(
        self,
        spark,
        table_path: str,
        record_key: str | None = None,
        partition_field: str | None = None,
        group_buckets: int = 1,
    ):
        # group_buckets bounds FILE-GROUP size, not correctness: each
        # insert fans new records into this many groups per partition
        # (key-hash routed), the COW answer to "one group per
        # partition" becoming a single-task rewrite wall at scale —
        # real Hudi's small-file/max-file-size packing, simplified to
        # a deterministic hash split.
        self.group_buckets = max(1, int(group_buckets))
        self.spark = spark
        self.table_path = table_path
        self.meta_dir = os.path.join(table_path, ".hoodie")
        props_path = os.path.join(self.meta_dir, "hoodie.properties")
        if os.path.isfile(props_path):
            t = HudiTable(table_path)
            if t.table_type != "COPY_ON_WRITE":
                raise NotImplementedError(
                    f"{table_path}: only COPY_ON_WRITE tables are writable"
                )
            self.record_key = t.record_key_field
            self.partition_field = t.partition_field
        else:
            if record_key is None:
                raise ValueError("record_key is required to create a table")
            self.record_key = record_key
            self.partition_field = partition_field

    # ---- timeline ----

    def _next_instant(self) -> str:
        existing = [
            m.group(1)
            for name in (os.listdir(self.meta_dir) if os.path.isdir(self.meta_dir) else [])
            if (m := _COMPLETED_RE.match(name) or _PENDING_RE.match(name))
        ]
        if not existing:
            return f"{_INSTANT0:017d}"
        return f"{int(max(existing)) + 1000:017d}"

    def _transition(self, instant: str, phase: str) -> None:
        open(os.path.join(self.meta_dir, f"{instant}.commit.{phase}"), "w").close()

    def _complete(self, instant: str, meta: dict) -> None:
        with open(os.path.join(self.meta_dir, f"{instant}.commit"), "w", encoding="utf-8") as fh:
            json.dump(meta, fh, indent=2, sort_keys=True)

    # ---- write ops ----

    def create(self, df) -> str:
        if os.path.isdir(self.meta_dir):
            raise FileExistsError(f"{self.table_path}: already a Hudi table")
        os.makedirs(self.meta_dir)
        props = {
            "hoodie.table.name": os.path.basename(os.path.normpath(self.table_path)),
            "hoodie.table.type": "COPY_ON_WRITE",
            "hoodie.table.version": "6",
            "hoodie.timeline.layout.version": "1",
            "hoodie.table.recordkey.fields": self.record_key,
            "hoodie.table.partition.fields": self.partition_field or "",
            "hoodie.table.keygenerator.class": "org.apache.hudi.keygen.SimpleKeyGenerator",
            "hoodie.datasource.write.hive_style_partitioning": "false",
        }
        _write_props(os.path.join(self.meta_dir, "hoodie.properties"), props)
        return self.insert(df, op="bulk_insert")

    def _partition_expr(self):
        if self.partition_field is None:
            return F.lit(_UNPARTITIONED)
        return F.col(self.partition_field).cast("string")

    def _key_expr(self):
        return F.col(self.record_key).cast("string")

    def _new_fid(self, instant: str):
        """Fresh file-group id for a new record: per-partition, fanned
        across group_buckets by key hash (deterministic routing)."""
        bucket = F.pmod(
            F.xxhash64(self._key_expr()), F.lit(self.group_buckets)
        ).cast("string")
        return F.concat(
            F.lit(f"fg-{instant}-"),
            F.abs(F.xxhash64("__part")).cast("string"),
            F.lit("-"),
            bucket,
        )

    def insert(self, df, op: str = "insert") -> str:
        """All rows are NEW records in fresh file groups (one per
        partition). No index probe — the bulk-ingest path."""
        instant = self._next_instant()
        self._transition(instant, "requested")
        self._transition(instant, "inflight")
        staged = df.withColumn("__part", self._partition_expr()).withColumn(
            "__fid", self._new_fid(instant)
        )
        staged = self._attach_meta(staged, instant)
        stats = self._write_groups(staged, instant, prev={})
        self._complete(instant, {"operationType": op.upper(), "partitionToWriteStats": stats})
        return instant

    def upsert(self, df) -> str:
        """Tag incoming records against the current snapshot's
        key→file-group index (one join), rewrite touched groups
        merging old survivors with the updates, route unknown keys to
        fresh file groups. Untouched groups are not read or written."""
        return self._merge(df, delete=False)

    def delete_keys(self, keys_df) -> str:
        """COW delete: rewrite the file groups containing the given
        record keys WITHOUT those records (a group may legally go to
        a zero-row base file — the group stays addressable)."""
        return self._merge(keys_df, delete=True)

    def _merge(self, df, delete: bool) -> str:
        instant = self._next_instant()
        t = HudiTable(self.table_path)
        slices = t.file_slices()
        prev = {(p, fid): ti for p, fid, ti, _ in slices}
        incoming = df.withColumn("__key", self._key_expr())
        # global simple index: key → (partition, fileId) from the
        # snapshot's meta columns only (two-column projection — the
        # scan prunes everything else)
        snap = read_hudi(self.spark, self.table_path, with_meta=True)
        index = snap.select(
            F.col("_hoodie_record_key").alias("__key"),
            F.col("_hoodie_partition_path").alias("__part"),
            F.element_at(F.split("_hoodie_file_name", "_"), 1).alias("__fid"),
        )
        tagged = incoming.join(index, "__key", "left")
        tagged.persist()
        try:
            touched = {
                (r["__part"], r["__fid"])
                for r in tagged.select("__part", "__fid").where(
                    F.col("__fid").isNotNull()
                ).distinct().collect()  # one row per TOUCHED FILE GROUP
            }
            if delete:
                news = None
            else:
                news = tagged.where(F.col("__fid").isNull()).drop(
                    "__key", "__part", "__fid"
                )
                news = news.withColumn("__part", self._partition_expr()).withColumn(
                    "__fid", self._new_fid(instant)
                )
            self._transition(instant, "requested")
            self._transition(instant, "inflight")
            parts = []
            if touched:
                touched_paths = [
                    os.path.join(self.table_path, rel)
                    for p, fid, _, rel in slices
                    if (p, fid) in touched
                ]
                old = self.spark.read.parquet(*touched_paths)
                upd_keys = tagged.select("__key").where(
                    F.col("__fid").isNotNull()
                ).distinct()
                survivors = old.join(
                    F.broadcast(upd_keys),
                    old["_hoodie_record_key"] == upd_keys["__key"],
                    "left_anti",
                ).withColumn(
                    "__part", F.col("_hoodie_partition_path")
                ).withColumn(
                    "__fid", F.element_at(F.split("_hoodie_file_name", "_"), 1)
                )
                parts.append(survivors)
                if not delete:
                    updates = tagged.where(F.col("__fid").isNotNull()).drop("__key")
                    parts.append(self._attach_meta(updates, instant, keep_commit_time=False))
            if news is not None:
                parts.append(self._attach_meta(news, instant, keep_commit_time=False))
            if not parts:
                # nothing touched and nothing new: empty commit
                self._complete(
                    instant,
                    {"operationType": "UPSERT", "partitionToWriteStats": {}},
                )
                return instant
            # survivors already carry meta (original commit_time kept —
            # the COW copy-forward contract); normalize all branches to
            # the same column set before the union
            normalized = []
            for p in parts:
                if "_hoodie_commit_time" not in p.columns:
                    p = self._attach_meta(p, instant, keep_commit_time=False)
                normalized.append(
                    p.select(
                        "_hoodie_commit_time",
                        "_hoodie_record_key",
                        "__part",
                        "__fid",
                        *[c for c in p.columns if not c.startswith(("_hoodie_", "__"))],
                    )
                )
            merged = normalized[0]
            for p in normalized[1:]:
                merged = merged.unionByName(p)
            stats = self._write_groups(merged, instant, prev=prev)
            # a group whose EVERY record was deleted produced no rows
            # above — write an explicit empty base file so the slice
            # still advances (otherwise the old slice would stay
            # latest and resurrect the deleted rows)
            written = {
                (p, s["fileId"]) for p, lst in stats.items() for s in lst
            }
            for part, fid in sorted(touched - written):
                import pyarrow.parquet as pq

                old_rel = next(
                    rel for p2, f2, _, rel in slices if (p2, f2) == (part, fid)
                )
                sch = pq.read_schema(os.path.join(self.table_path, old_rel))
                name = f"{fid}_{self.WRITE_TOKEN}_{instant}.parquet"
                rel = os.path.join(part, name) if part else name
                dst = os.path.join(self.table_path, rel)
                pq.write_table(sch.empty_table(), dst)
                stats.setdefault(part, []).append(
                    {
                        "fileId": fid,
                        "path": rel,
                        "prevCommit": prev.get((part, fid), "null"),
                        "numWrites": 0,
                        "fileSizeInBytes": os.path.getsize(dst),
                    }
                )
            self._complete(
                instant,
                {
                    "operationType": "DELETE" if delete else "UPSERT",
                    "partitionToWriteStats": stats,
                },
            )
            return instant
        finally:
            tagged.unpersist()

    # ---- shared staging ----

    def _attach_meta(self, df, instant: str, keep_commit_time: bool = False):
        """Attach the per-record meta columns the files must carry
        (file name + seqno are finalized in _write_groups once the
        physical name is known)."""
        out = df
        if "_hoodie_commit_time" not in out.columns or not keep_commit_time:
            if "_hoodie_commit_time" in out.columns:
                out = out.drop("_hoodie_commit_time")
            out = out.withColumn("_hoodie_commit_time", F.lit(instant))
        if "_hoodie_record_key" not in out.columns:
            out = out.withColumn("_hoodie_record_key", self._key_expr())
        return out

    def _write_groups(self, df, instant: str, prev: dict) -> dict:
        """Write one base file per (partition, fileId) in ``df`` and
        return partitionToWriteStats. df carries __part/__fid plus
        _hoodie_commit_time/_hoodie_record_key; the remaining meta
        columns derive from the physical file name chosen here. The
        repartition on __fid puts each file group in exactly one task,
        so partitionBy emits exactly one file per group."""
        fname = F.concat(
            F.col("__fid"), F.lit(f"_{self.WRITE_TOKEN}_{instant}.parquet")
        )
        seq = F.row_number().over(
            Window.partitionBy("__fid").orderBy("_hoodie_record_key")
        )
        data_cols = [
            c for c in df.columns if not c.startswith(("_hoodie_", "__"))
        ]
        staged = df.select(
            F.col("_hoodie_commit_time"),
            F.concat(F.lit(instant + "_"), seq.cast("string")).alias(
                "_hoodie_commit_seqno"
            ),
            F.col("_hoodie_record_key"),
            F.col("__part").alias("_hoodie_partition_path"),
            fname.alias("_hoodie_file_name"),
            *data_cols,
            F.col("__part"),
            F.col("__fid"),
        )
        tmp = os.path.join(self.table_path, f".hoodie/.temp/{instant}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            staged.repartition(F.col("__fid"))
            .write.partitionBy("__part", "__fid")
            .mode("overwrite")
            .parquet(tmp)
        )
        from plankton_spark.filestats import file_stats as _fstats

        stats: dict[str, list] = {}
        for fdir in sorted(_glob.glob(os.path.join(tmp, "__part=*", "__fid=*"))):
            import urllib.parse as _url

            part = _url.unquote(os.path.basename(os.path.dirname(fdir)).split("=", 1)[1])
            if part == "__HIVE_DEFAULT_PARTITION__":
                part = _UNPARTITIONED
            fid = _url.unquote(os.path.basename(fdir).split("=", 1)[1])
            files = sorted(_glob.glob(os.path.join(fdir, "part-*.parquet")))
            assert len(files) == 1, f"{fid}: expected 1 file, got {len(files)}"
            name = f"{fid}_{self.WRITE_TOKEN}_{instant}.parquet"
            rel = os.path.join(part, name) if part else name
            dst = os.path.join(self.table_path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(files[0], dst)
            n = _fstats(dst)["numRecords"]
            stats.setdefault(part, []).append(
                {
                    "fileId": fid,
                    "path": rel,
                    "prevCommit": prev.get((part, fid), "null"),
                    "numWrites": n,
                    "fileSizeInBytes": os.path.getsize(dst),
                }
            )
        shutil.rmtree(os.path.join(self.table_path, ".hoodie/.temp"), ignore_errors=True)
        return stats


def convert_hudi_to_delta(spark, table_path: str) -> int:
    """Close the Hudi arm of the migration matrix: author a
    ``_delta_log`` version 0 over the Hudi COW table's LATEST FILE
    SLICES in place — O(files) footer metadata, zero data movement
    (the XTable direction). The timeline (not a directory walk) picks
    the inventory, so superseded slices and uncommitted files are
    invisible. The Delta schema EXCLUDES the five ``_hoodie_*`` meta
    columns (the public XTable behavior — meta fields are a Hudi
    implementation detail); files keep them physically and every
    reader's projection prunes them at the scan. The table converts
    UNPARTITIONED at the Delta layer: Hudi keeps the partition field
    in file content, where the Delta spec expects partition columns
    REMOVED from files — declaring it partitioned would double the
    column. Partition pruning still works through ordinary predicate
    pushdown + per-file stats on the data column. Refuses MOR /
    replacecommit timelines (HudiTable._check_readable) and an
    existing _delta_log."""
    from plankton_spark.filestats import file_stats as _fstats
    from plankton_spark.sources.delta_log import (
        DeltaLogWriter,
        _commit_versions,
    )

    log_dir = os.path.join(table_path, "_delta_log")
    if os.path.isdir(log_dir) and _commit_versions(log_dir):
        raise FileExistsError(f"{table_path}: already a Delta table")
    t = HudiTable(table_path)
    slices = t.file_slices()
    if not slices:
        raise ValueError(f"{table_path}: no file slices to convert")
    paths = [os.path.join(table_path, rel) for _, _, _, rel in slices]
    schema = spark.read.parquet(*paths).drop(*META_COLS).schema
    adds = []
    for _, _, _, rel in slices:
        p = os.path.join(table_path, rel)
        st = _fstats(p)
        st["minValues"] = {k: v for k, v in st.get("minValues", {}).items() if not k.startswith("_hoodie_")}
        st["maxValues"] = {k: v for k, v in st.get("maxValues", {}).items() if not k.startswith("_hoodie_")}
        st["nullCount"] = {k: v for k, v in st.get("nullCount", {}).items() if not k.startswith("_hoodie_")}
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(p),
                    "modificationTime": int(os.path.getmtime(p) * 1000),
                    "dataChange": True,
                    "stats": json.dumps(st),
                }
            }
        )
    w = DeltaLogWriter(spark, table_path)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        w._metadata_action(schema, [], {}),
    ]
    return w._commit(0, actions + adds)


def convert_hudi_to_iceberg(spark, table_path: str) -> int:
    """The other Hudi migration arrow (XTable's Hudi → Iceberg
    direction): author Iceberg metadata/ over the LATEST FILE SLICES
    in place — same inventory rules as convert_hudi_to_delta (timeline
    replay, superseded slices invisible, O(files) footer metadata,
    zero data movement), sharing the converters' metadata-authoring
    tail (_author_iceberg_over). The Iceberg schema excludes the five
    ``_hoodie_*`` meta columns (scans prune them from file content);
    the table converts unpartitioned at the Iceberg layer because
    Hudi keeps the partition field IN file content where an identity
    spec would expect it projected out — predicate pushdown + footer
    stats give equivalent pruning. Both converters may run on the SAME
    Hudi table (``.hoodie``, ``_delta_log`` and ``metadata/`` are
    disjoint) — the XTable multi-target layout. Refuses MOR /
    replacecommit timelines and an existing Iceberg table."""
    from plankton_spark.sources.iceberg_meta import _author_iceberg_over

    meta_dir = os.path.join(table_path, "metadata")
    if os.path.isdir(meta_dir) and any(
        f.endswith(".metadata.json") for f in os.listdir(meta_dir)
    ):
        raise FileExistsError(f"{table_path}: already an Iceberg table")
    t = HudiTable(table_path)
    slices = t.file_slices()
    if not slices:
        raise ValueError(f"{table_path}: no file slices to convert")
    paths = [os.path.join(table_path, rel) for _, _, _, rel in slices]
    schema = spark.read.parquet(*paths).drop(*META_COLS).schema
    inventory = [(rel, {}) for _, _, _, rel in sorted(slices)]
    return _author_iceberg_over(spark, table_path, schema, inventory, [])
