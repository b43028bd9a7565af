"""Hudi LOG FILE codec — the MERGE_ON_READ delta log
(hudi_meta.py's COW layer gains MOR snapshot reads through this).

Public knowledge only: the HoodieLogFormat as published in the Hudi
tech spec / source (apache/hudi, ``HoodieLogFormat`` /
``HoodieLogBlock`` / ``HoodieAvroDataBlock``):

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

Byte-order follows Java's DataOutputStream (big-endian). The layout
is verified SELF-consistent by roundtrip tests (no foreign Hudi
binary fixture exists in this environment to cross-check
byte-exactness, the same honesty note the module-level docs carry for
every hand-authored foreign format here); corrupt trailing blocks
(partial write after a crash) are detected by magic/length checks and
skipped exactly like Hudi's reader rolls back a failed append.

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


def append_data_block(
    path: str, instant: str, schema: dict, records: list[dict]
) -> None:
    """Append one self-describing AVRO_DATA_BLOCK (crash-safe: a
    partial append leaves a truncated tail the reader skips)."""
    content = _avro_block_content(schema, records)
    hdr = io.BytesIO()
    _write_map(
        hdr, {H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(schema)}
    )
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
    blk.write(struct.pack(">i", AVRO_DATA_BLOCK))
    blk.write(header)
    blk.write(struct.pack(">q", len(content)))
    blk.write(content)
    blk.write(footer)
    blk.write(struct.pack(">q", total))
    with open(path, "ab") as fh:
        fh.write(blk.getvalue())


def read_log_blocks(path: str):
    """Yield (instant, records) per decodable AVRO_DATA_BLOCK, in file
    order. A truncated or magic-less tail stops the scan (the crashed
    trailing append Hudi's reader also drops); non-data block types
    refuse loudly rather than silently skipping semantics."""
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
            if btype == AVRO_DATA_BLOCK:
                schema = json.loads(header[H_SCHEMA])
                yield header[H_INSTANT_TIME], _decode_avro_block(
                    content, schema
                )
            elif btype == CORRUPT_BLOCK:
                continue
            else:
                raise NotImplementedError(
                    f"{path}: log block type {btype} (delete/command "
                    "blocks) is not supported — refuse rather than "
                    "merge wrong"
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
