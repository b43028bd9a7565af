"""Hudi LOG FILE codec — the MERGE_ON_READ delta log
(hudi_meta.py's COW layer gains MOR snapshot reads through this).

Public knowledge only: the HoodieLogFormat as published in the Hudi
tech spec / source (apache/hudi, ``HoodieLogFormat`` /
``HoodieLogBlock`` / ``HoodieAvroDataBlock`` / ``HoodieDeleteBlock``):

- A log file is a sequence of BLOCKS, each:
  ``#HUDI#`` magic (6 bytes) | block size (8-byte big-endian long) |
  log format version (4-byte int, 1) | block type ordinal (4-byte
  int) | header map | content length (8-byte long) | content |
  footer map | total block length (8-byte long).
- Header/footer maps: entry count (int), then per entry the
  HeaderMetadataType ordinal (int), value byte length (int), UTF-8
  bytes. INSTANT_TIME(0) stamps the writing deltacommit; SCHEMA(2)
  carries the writer's Avro schema JSON — each block is
  self-describing, the property the merge reader relies on.
- AVRO_DATA_BLOCK (type ordinal 3) content: format version (int, 3),
  record count (int), then per record a length-prefixed Avro-binary
  datum (the shared spec-complete codec in avro_ocf.py).
- DELETE_BLOCK (type ordinal 1) content: real Hudi serializes a
  ``DeleteRecord[]`` (recordKey, partitionPath, orderingVal) with
  Kryo — a version-unstable binary this codec cannot pin to a spec;
  under the spec's block framing and type ordinal this engine writes
  a DOCUMENTED layout instead: format version (int, 1), record count
  (int), then per record length-prefixed UTF-8 ``recordKey`` and
  ``partitionPath``. Self-consistent, honest about the divergence.

Byte-order follows Java's DataOutputStream (big-endian). The layout
is verified SELF-consistent by roundtrip tests (no foreign Hudi
binary fixture exists in this environment to cross-check
byte-exactness, the same honesty note the module-level docs carry for
every hand-authored foreign format here); corrupt trailing blocks
(partial write after a crash) are detected by magic/length checks and
skipped exactly like Hudi's reader rolls back a failed append.

Appends are IDEMPOTENT and ATOMIC: a block lands by writing the
whole new file to a unique temp path and ``os.replace``-ing it in,
and an append whose INSTANT_TIME already appears in the file is
skipped — so a Spark task retry or speculative duplicate attempt
can neither duplicate a block nor interleave bytes mid-file (two
same-instant attempts write identical content; last rename wins).

Scale shape: log files are PER FILE GROUP and parsed on EXECUTORS
(hudi_meta routes them through mapInPandas) — the driver never
touches record bytes; a block is decodable independently, so one
task per log file is the natural parallelism.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

# HoodieLogBlockType ordinals (public enum order)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

# HeaderMetadataType ordinals (public enum order)
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2


def _write_map(buf: io.BytesIO, entries: dict[int, str]) -> None:
    buf.write(struct.pack(">i", len(entries)))
    for k in sorted(entries):
        v = entries[k].encode("utf-8")
        buf.write(struct.pack(">i", k))
        buf.write(struct.pack(">i", len(v)))
        buf.write(v)


def _read_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out = {}
    for _ in range(n):
        (k,) = struct.unpack(">i", buf.read(4))
        (ln,) = struct.unpack(">i", buf.read(4))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def _avro_block_content(schema: dict, records: list[dict]) -> bytes:
    from plankton_spark.sources.avro_ocf import _resolve_names, write_datum

    names = _resolve_names(schema)
    buf = io.BytesIO()
    buf.write(struct.pack(">i", 3))  # data-block format version
    buf.write(struct.pack(">i", len(records)))
    for rec in records:
        rb = io.BytesIO()
        write_datum(rb, schema, rec, names)
        payload = rb.getvalue()
        buf.write(struct.pack(">i", len(payload)))
        buf.write(payload)
    return buf.getvalue()


def _decode_avro_block(content: bytes, schema: dict) -> list[dict]:
    from plankton_spark.sources.avro_ocf import _resolve_names, read_datum

    names = _resolve_names(schema)
    buf = io.BytesIO(content)
    (ver,) = struct.unpack(">i", buf.read(4))
    if ver != 3:
        raise ValueError(f"unsupported avro data block version {ver}")
    (n,) = struct.unpack(">i", buf.read(4))
    out = []
    for _ in range(n):
        (ln,) = struct.unpack(">i", buf.read(4))
        out.append(read_datum(io.BytesIO(buf.read(ln)), schema, names))
    return out


def _delete_block_content(deletes: list[tuple[str, str]]) -> bytes:
    buf = io.BytesIO()
    buf.write(struct.pack(">i", 1))  # delete-block format version (ours)
    buf.write(struct.pack(">i", len(deletes)))
    for key, part in deletes:
        for s in (key, part):
            b = s.encode("utf-8")
            buf.write(struct.pack(">i", len(b)))
            buf.write(b)
    return buf.getvalue()


def _decode_delete_block(content: bytes) -> list[tuple[str, str]]:
    buf = io.BytesIO(content)
    (ver,) = struct.unpack(">i", buf.read(4))
    if ver != 1:
        raise ValueError(f"unsupported delete block version {ver}")
    (n,) = struct.unpack(">i", buf.read(4))
    out = []
    for _ in range(n):
        (kl,) = struct.unpack(">i", buf.read(4))
        key = buf.read(kl).decode("utf-8")
        (pl,) = struct.unpack(">i", buf.read(4))
        part = buf.read(pl).decode("utf-8")
        out.append((key, part))
    return out


def _build_block(btype: int, headers: dict[int, str], content: bytes) -> bytes:
    hdr = io.BytesIO()
    _write_map(hdr, headers)
    header = hdr.getvalue()
    ftr = io.BytesIO()
    _write_map(ftr, {})
    footer = ftr.getvalue()
    # block size = everything AFTER the size field, trailing total
    # length included; total = whole block including magic
    body_len = 4 + 4 + len(header) + 8 + len(content) + len(footer) + 8
    total = len(MAGIC) + 8 + body_len
    blk = io.BytesIO()
    blk.write(MAGIC)
    blk.write(struct.pack(">q", body_len))
    blk.write(struct.pack(">i", LOG_FORMAT_VERSION))
    blk.write(struct.pack(">i", btype))
    blk.write(header)
    blk.write(struct.pack(">q", len(content)))
    blk.write(content)
    blk.write(footer)
    blk.write(struct.pack(">q", total))
    return blk.getvalue()


def _append_block_atomic(path: str, instant: str, block: bytes) -> None:
    """Publish one block: skip if a block stamped ``instant`` is
    already present (a retried/speculative Spark attempt re-running
    the same write), else rewrite old-bytes + block to a unique temp
    file and ``os.replace`` into place. Atomic (readers never see a
    half-appended tail) and idempotent (duplicate attempts write
    byte-identical content, last rename wins)."""
    existing = b""
    if os.path.exists(path):
        if instant in log_block_instants(path):
            return
        with open(path, "rb") as fh:
            existing = fh.read()
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as fh:
        fh.write(existing)
        fh.write(block)
    os.replace(tmp, path)


def append_data_block(
    path: str, instant: str, schema: dict, records: list[dict]
) -> None:
    """Append one self-describing AVRO_DATA_BLOCK (atomic + idempotent
    per instant; a crashed PROCESS leaves either the old file or the
    new one, never a truncated tail — though a foreign writer's torn
    append is still skipped by the reader's magic/length checks)."""
    content = _avro_block_content(schema, records)
    block = _build_block(
        AVRO_DATA_BLOCK,
        {H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(schema)},
        content,
    )
    _append_block_atomic(path, instant, block)


def append_delete_block(
    path: str, instant: str, deletes: list[tuple[str, str]]
) -> None:
    """Append one DELETE_BLOCK of (recordKey, partitionPath) pairs —
    the MOR delete path: removal is an event in the log, applied by
    the latest-wins merge at read time and folded by compaction."""
    block = _build_block(
        DELETE_BLOCK, {H_INSTANT_TIME: instant}, _delete_block_content(deletes)
    )
    _append_block_atomic(path, instant, block)


def _scan_blocks(path: str):
    """Low-level block walk: yield (btype, header, content) per
    well-formed block; stop at a truncated or magic-less tail (the
    crashed trailing append Hudi's reader also drops)."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        while True:
            pos = fh.tell()
            magic = fh.read(len(MAGIC))
            if len(magic) < len(MAGIC):
                return  # clean EOF
            if magic != MAGIC:
                return  # corrupt tail: stop (rolled-back append)
            raw = fh.read(8)
            if len(raw) < 8:
                return
            (body_len,) = struct.unpack(">q", raw)
            if pos + len(MAGIC) + 8 + body_len > size:
                return  # truncated block: drop it
            body = io.BytesIO(fh.read(body_len))
            (ver,) = struct.unpack(">i", body.read(4))
            if ver != LOG_FORMAT_VERSION:
                raise ValueError(f"{path}: log format version {ver}")
            (btype,) = struct.unpack(">i", body.read(4))
            header = _read_map(body)
            (clen,) = struct.unpack(">q", body.read(8))
            content = body.read(clen)
            _read_map(body)  # footer
            (total,) = struct.unpack(">q", body.read(8))
            if total != len(MAGIC) + 8 + body_len:
                return  # length mismatch: treat as corrupt tail
            yield btype, header, content


def log_block_instants(path: str) -> set[str]:
    """INSTANT_TIME headers of every decodable block — content bytes
    are never deserialized (the cheap scan idempotent appends and
    rollback's orphan attribution rely on)."""
    out: set[str] = set()
    for _btype, header, _content in _scan_blocks(path):
        if H_INSTANT_TIME in header:
            out.add(header[H_INSTANT_TIME])
    return out


def read_log_blocks(path: str):
    """Yield (instant, block_type, payload) per decodable block in
    file order: AVRO_DATA_BLOCK payloads are record dicts,
    DELETE_BLOCK payloads are (recordKey, partitionPath) pairs.
    CORRUPT blocks are skipped; COMMAND blocks (compaction barriers
    this engine never writes) refuse loudly rather than silently
    dropping semantics."""
    for btype, header, content in _scan_blocks(path):
        if btype == AVRO_DATA_BLOCK:
            schema = json.loads(header[H_SCHEMA])
            yield (
                header[H_INSTANT_TIME],
                AVRO_DATA_BLOCK,
                _decode_avro_block(content, schema),
            )
        elif btype == DELETE_BLOCK:
            yield (
                header[H_INSTANT_TIME],
                DELETE_BLOCK,
                _decode_delete_block(content),
            )
        elif btype == CORRUPT_BLOCK:
            continue
        else:
            raise NotImplementedError(
                f"{path}: log block type {btype} (command blocks) is "
                "not supported — refuse rather than merge wrong"
            )


def log_file_name(file_id: str, base_instant: str, version: int) -> str:
    """``.{fileId}_{baseCommitTime}.log.{version}_{writeToken}`` —
    the published naming (leading dot: log files are hidden from
    plain directory globs)."""
    return f".{file_id}_{base_instant}.log.{version}_0-1-0"


def parse_log_file_name(name: str) -> tuple[str, str, int] | None:
    """(file_id, base_instant, version) or None if not a log file."""
    if not name.startswith(".") or ".log." not in name:
        return None
    stem, _, tail = name[1:].partition(".log.")
    fid, _, base = stem.rpartition("_")
    ver = tail.split("_")[0]
    if not fid or not base.isdigit() or not ver.isdigit():
        return None
    return fid, base, int(ver)
