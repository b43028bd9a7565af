"""Delta Lake deletion vectors: pure-Python codec + descriptor IO.

Implements the publicly documented formats (Delta PROTOCOL.md
"Deletion Vectors" + the RoaringBitmapArray portable serialization it
references, and the standard 32-bit Roaring "portable" format from
the RoaringFormatSpec):

- a DV is a set of 0-based ROW INDEXES within one data file whose
  rows are deleted;
- serialized as a 64-bit RoaringBitmapArray: magic 1681511377
  (int32 LE), number of 32-bit bitmaps (int64 LE), then per bitmap a
  4-byte LE high-32 key followed by a standard 32-bit roaring bitmap
  (cookie 12346 without run containers / 12347 with, array containers
  for <=4096 values, 8 KiB bitset containers, run containers);
- stored inline (storageType "i", Base85/RFC-1924 payload in
  pathOrInlineDv) or in a `deletion_vector_<uuid>.bin` file
  (storageType "u": pathOrInlineDv is [prefix/]base85(uuid bytes);
  "p": absolute path). DV files carry a format-version byte, then per
  DV a big-endian int32 size, the bitmap bytes, and a big-endian
  int32 CRC-32 of those bytes; the descriptor's `offset` points at
  the size field.

The writer half emits array/bitmap containers only (runs are a pure
read-side tolerance), mirroring how the reference readers treat runs
as optional on write.

Scale posture: DVs are METADATA-scale (bounded by deleted-row count
per file, heavily compressed); decoding happens per descriptor and
the expansion to (file, row_index) rows runs distributed via
mapInPandas in delta_log.read_delta — the driver never materializes
row indexes.
"""

from __future__ import annotations

import base64
import os
import struct
import uuid as _uuid
import zlib

MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_ARRAY_MAX = 4096
_BITSET_BYTES = 1 << 13  # 65536 bits


class DeletionVectorError(ValueError):
    """Malformed or inconsistent deletion-vector payload."""


# -- 32-bit roaring bitmap ---------------------------------------------------


def _read_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Standard portable 32-bit roaring bitmap at `pos` → (sorted
    values, next position)."""
    (cookie_raw,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    if (cookie_raw & 0xFFFF) == _COOKIE_RUN:
        size = (cookie_raw >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = size >= 4
    elif cookie_raw == _COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie_raw}")
    keys_cards = []
    for i in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * size  # container offsets — sequential read ignores them
    out: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(base + v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += _BITSET_BYTES
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    out.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return out, pos


def _write_bitmap32(values: list[int]) -> bytes:
    """Portable no-run-container serialization of sorted uint32s."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    head = struct.pack("<ii", _COOKIE_NO_RUN, len(keys))
    descr = b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    bodies: list[bytes] = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
    offsets = []
    pos = len(head) + len(descr) + 4 * len(keys)
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    return (
        head
        + descr
        + b"".join(struct.pack("<i", o) for o in offsets)
        + b"".join(bodies)
    )


# -- 64-bit RoaringBitmapArray ----------------------------------------------


def deserialize_roaring_array(data: bytes) -> list[int]:
    """Serialized RoaringBitmapArray → sorted 64-bit row indexes."""
    if len(data) < 12:
        raise DeletionVectorError("deletion vector payload too short")
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC:
        raise DeletionVectorError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _read_bitmap32(data, pos)
        base = high << 32
        out.extend(base + v for v in vals)
    return out


def serialize_roaring_array(indexes) -> bytes:
    """Sorted (or sortable) 64-bit row indexes → serialized
    RoaringBitmapArray."""
    by_high: dict[int, list[int]] = {}
    for i in sorted(set(int(x) for x in indexes)):
        if i < 0:
            raise DeletionVectorError(f"negative row index {i}")
        by_high.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    parts = [struct.pack("<iq", MAGIC, len(by_high))]
    for high in sorted(by_high):
        parts.append(struct.pack("<i", high))
        parts.append(_write_bitmap32(by_high[high]))
    return b"".join(parts)


# -- descriptor & file IO ----------------------------------------------------


def _decode_uuid_path(table_path: str, path_or_inline: str) -> str:
    """storageType "u": [prefix/]base85(16-byte uuid) → abs file path
    `<table>/[prefix/]deletion_vector_<uuid>.bin`."""
    prefix, sep, enc = path_or_inline.rpartition("/")
    raw = base64.b85decode(enc)
    if len(raw) != 16:
        raise DeletionVectorError(
            f"DV uuid payload decodes to {len(raw)} bytes, want 16"
        )
    u = _uuid.UUID(bytes=raw)
    rel = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, rel) if sep else os.path.join(
        table_path, rel
    )


def dv_bytes(table_path: str, descriptor: dict) -> bytes:
    """Resolve a `deletionVector` descriptor to the serialized bitmap
    bytes, verifying size and (for on-disk DVs) the CRC-32 the file
    format carries."""
    st = descriptor.get("storageType")
    payload = descriptor.get("pathOrInlineDv", "")
    size = descriptor.get("sizeInBytes")
    if st == "i":
        data = base64.b85decode(payload)
        if size is not None and size != len(data):
            raise DeletionVectorError(
                f"inline DV sizeInBytes={size} != payload {len(data)}"
            )
        return data
    if st == "u":
        path = _decode_uuid_path(table_path, payload)
    elif st == "p":
        path = payload
    else:
        raise DeletionVectorError(f"unknown DV storageType {st!r}")
    offset = descriptor.get("offset") or 0
    with open(path, "rb") as f:
        f.seek(offset)
        (stored_size,) = struct.unpack(">i", f.read(4))
        if size is not None and stored_size != size:
            raise DeletionVectorError(
                f"{path}@{offset}: DV size {stored_size} != descriptor "
                f"sizeInBytes {size}"
            )
        data = f.read(stored_size)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise DeletionVectorError(f"{path}@{offset}: DV checksum mismatch")
    return data


def dv_row_indexes(table_path: str, descriptor: dict) -> list[int]:
    """Descriptor → sorted deleted row indexes, cardinality-checked."""
    idx = deserialize_roaring_array(dv_bytes(table_path, descriptor))
    card = descriptor.get("cardinality")
    if card is not None and card != len(idx):
        raise DeletionVectorError(
            f"DV cardinality {card} != decoded {len(idx)} rows"
        )
    return idx


def write_dv_file(table_path: str, indexes) -> dict:
    """Author an on-disk DV (storageType "u") holding `indexes`;
    returns the add-action `deletionVector` descriptor. Used by the
    delete path and by interop tests authoring foreign-style tables."""
    data = serialize_roaring_array(indexes)
    u = _uuid.uuid4()
    path = os.path.join(table_path, f"deletion_vector_{u}.bin")
    with open(path, "wb") as f:
        f.write(b"\x01")  # DV file format version
        offset = f.tell()
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": base64.b85encode(u.bytes).decode("ascii"),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(set(int(x) for x in indexes)),
    }


def inline_dv_descriptor(indexes) -> dict:
    data = serialize_roaring_array(indexes)
    return {
        "storageType": "i",
        "pathOrInlineDv": base64.b85encode(data).decode("ascii"),
        "sizeInBytes": len(data),
        "cardinality": len(set(int(x) for x in indexes)),
    }
