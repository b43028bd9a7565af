"""Puffin file format (Apache Iceberg's statistics/blob sidecar) —
pure-Python reader/writer for the subset Iceberg v3 deletion vectors
need, from the PUBLIC spec (iceberg.apache.org/puffin-spec).

File layout:
    Magic  Blob₁ … Blobₙ  Footer
    Footer = Magic  FooterPayload(JSON, utf-8)  PayloadSize(4B LE)
             Flags(4B)  Magic
    Magic  = 0x50 0x46 0x41 0x31 ("PFA1")
Flags bit 0 of byte 0 = footer payload LZ4-compressed (this writer
never sets it; the reader refuses it — lz4 isn't in the sandbox and
uncompressed footers are spec-legal).

FooterPayload: {"blobs": [BlobMetadata...], "properties": {...}};
BlobMetadata: {"type", "fields", "snapshot-id", "sequence-number",
"offset", "length", "properties", ...}.

Deletion-vector blobs (type "deletion-vector-v1", Iceberg v3 table
spec §Deletion vectors): the blob content is
    [4B BE length of magic+vector] [magic D1 D3 39 64]
    [vector: portable 64-bit roaring bitmap] [4B BE CRC-32 of
    magic+vector]
— BYTE-IDENTICAL to one record of Delta Lake's deletion-vector file
framing (the formats converged deliberately so one DV
implementation serves both), so the vector codec is shared:
sources/deletion_vectors.serialize_roaring_array already emits
magic+vector in this exact layout ("portable" = u64 LE bucket count,
then per bucket u32 LE high-key + standard 32-bit roaring
serialization). Blob properties MUST carry "referenced-data-file"
and "cardinality" per the v3 spec.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from plankton_spark.sources.deletion_vectors import (
    DeletionVectorError,
    deserialize_roaring_array,
    serialize_roaring_array,
)

MAGIC = b"PFA1"


class PuffinError(ValueError):
    pass


# -- deletion-vector blob framing --------------------------------------------


def dv_blob(indexes) -> bytes:
    """Sorted 64-bit row indexes → a framed deletion-vector-v1 blob
    (length + magic+vector + CRC-32)."""
    data = serialize_roaring_array(indexes)  # magic-prefixed already
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )


def dv_blob_indexes(blob: bytes) -> list[int]:
    """Framed deletion-vector-v1 blob → sorted row indexes, verifying
    the declared length and the CRC-32 (a truncated/corrupt DV must
    refuse, never silently resurrect rows)."""
    if len(blob) < 8:
        raise PuffinError("deletion-vector blob too short")
    (n,) = struct.unpack_from(">i", blob, 0)
    if len(blob) != 4 + n + 4:
        raise PuffinError(
            f"deletion-vector blob framing mismatch: declared {n} bytes, "
            f"blob is {len(blob)} (want {4 + n + 4})"
        )
    data = blob[4 : 4 + n]
    (crc,) = struct.unpack_from(">I", blob, 4 + n)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise PuffinError("deletion-vector blob CRC-32 mismatch")
    try:
        return deserialize_roaring_array(data)
    except DeletionVectorError as e:
        raise PuffinError(str(e)) from e


# -- file writer --------------------------------------------------------------


def write_puffin(path: str, blobs: list[dict], properties: dict | None = None
                 ) -> list[dict]:
    """Write a Puffin file.

    Each input blob dict: {"type": str, "data": bytes, and optional
    "fields", "snapshot-id", "sequence-number", "properties"}.
    Returns the BlobMetadata list as written to the footer (offset/
    length filled in) — the caller lifts offset/length into manifest
    entries (content_offset / content_size_in_bytes)."""
    metas: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for b in blobs:
            data = b["data"]
            meta = {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": int(b.get("snapshot-id", 0)),
                "sequence-number": int(b.get("sequence-number", 0)),
                "offset": f.tell(),
                "length": len(data),
            }
            if b.get("properties"):
                meta["properties"] = dict(b["properties"])
            f.write(data)
            metas.append(meta)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(properties or {})}
        ).encode()
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(struct.pack("<i", 0))  # flags: uncompressed footer
        f.write(MAGIC)
    return metas


# -- file reader --------------------------------------------------------------


def read_footer(path: str) -> dict:
    """Parse a Puffin file's footer payload (validating all three
    magics and refusing compressed footers)."""
    size = os.path.getsize(path)
    if size < 4 + 4 + 4 + 4 + 4:
        raise PuffinError(f"{path}: too small to be a Puffin file")
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise PuffinError(f"{path}: bad header magic")
        f.seek(size - 12)
        payload_size, flags = struct.unpack("<ii", f.read(8))
        if f.read(4) != MAGIC:
            raise PuffinError(f"{path}: bad trailing magic")
        if flags & 1:
            raise PuffinError(
                f"{path}: footer payload is LZ4-compressed — "
                "unsupported here (write uncompressed footers)"
            )
        footer_start = size - 12 - payload_size - 4
        if footer_start < 4:
            raise PuffinError(f"{path}: footer payload size out of range")
        f.seek(footer_start)
        if f.read(4) != MAGIC:
            raise PuffinError(f"{path}: bad footer magic")
        payload = f.read(payload_size)
    try:
        return json.loads(payload.decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise PuffinError(f"{path}: unparseable footer payload: {e}") from e


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise PuffinError(
            f"{path}@{offset}: short blob read ({len(data)} of {length})"
        )
    return data


def dv_indexes(path: str, offset: int, length: int) -> list[int]:
    """Deleted row indexes from a deletion-vector-v1 blob at
    (offset, length) — the manifest entry's content_offset /
    content_size_in_bytes."""
    return dv_blob_indexes(read_blob(path, offset, length))
