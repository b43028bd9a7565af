"""Hudi BLOOM FILTER index — the metadata table's third partition
(``bloom_filters``, next to ``files`` and ``column_stats``).

Public knowledge only: real Hudi's bloom index stores one bloom
filter of record keys PER BASE FILE (originally in the parquet
footer, later the metadata table's bloom_filters partition) and uses
it to prune the files an upsert's key-tagging join must read —
probing is O(incoming keys × candidate files) bit tests instead of a
key-proportional scan of EVERY base file. Real Hudi serializes
org.apache.hudi.common.bloom.BloomFilter (Hadoop DynamicBloomFilter
internals — version-unstable Java serialization); this codec writes
a DOCUMENTED self-consistent layout instead (the hudi_log.py honesty
note): ``m`` (bits, 8-byte big-endian — 4 bytes would overflow at
~10⁸ keys × 20 bits/key) | ``k`` (hashes, 4-byte) | ceil(m/8) bit
bytes, base64-wrapped for the metadata-table string column.

Guarantees the upsert integration relies on:
- NO FALSE NEGATIVES: every key written to a base file is set in its
  bloom (built from the exact key column at metadata-update time), so
  a key that probes negative everywhere is PROVABLY new — it can
  safely route to a fresh file group.
- False positives only widen the candidate file set (the tagging join
  still matches on the real keys), never change results.

Sizing: m = 20 bits/key (k = 7) → ~2·10⁻⁴ false-positive rate,
re-derived per file from its actual key count (real Hudi's
expected-entries sizing). Hash positions derive from SHA-256 of the
key — deterministic across processes/engines, no Python hash()
randomization.

Scale shape: blooms are METADATA (2.5 bytes/key); probing runs on
EXECUTORS with the touched table's blooms broadcast (mapInPandas over
the incoming keys). The broadcast is bounded by live-file count ×
bloom size — fine through ~10⁵ files; past that, real Hudi composes
with partition pruning and key-range (column_stats) pruning first,
which this engine's stats_filter already provides.
"""

from __future__ import annotations

import base64
import hashlib
import struct

BLOOM_K = 7
BITS_PER_KEY = 20
MIN_BITS = 1 << 12  # 4096 bits — floor for tiny files


def _positions(key: str, m: int, k: int = BLOOM_K):
    """k deterministic bit positions for a key: SHA-256 split into
    4-byte words (k ≤ 8), each mod m. Refuses k outside [1, 8] —
    SHA-256 yields exactly eight 4-byte words, and a silent
    int.from_bytes(b'') = 0 for i ≥ 8 would degrade every extra
    probe bit to position 0 instead of failing loudly."""
    if not 1 <= k <= 8:
        raise ValueError(
            f"bloom k={k} out of range [1, 8]: SHA-256 provides only "
            "eight 4-byte hash words — refusing a silently-degraded "
            "probe (corrupt or foreign bloom blob?)"
        )
    h = hashlib.sha256(key.encode("utf-8")).digest()
    for i in range(k):
        yield int.from_bytes(h[4 * i : 4 * i + 4], "big") % m


def bloom_build(keys) -> str:
    """Base64 bloom over ``keys`` sized at BITS_PER_KEY per key."""
    n = max(1, len(keys))
    m = max(MIN_BITS, 1 << (n * BITS_PER_KEY).bit_length())
    bits = bytearray((m + 7) // 8)
    for key in keys:
        for pos in _positions(str(key), m):
            bits[pos >> 3] |= 1 << (pos & 7)
    return base64.b64encode(
        struct.pack(">qi", m, BLOOM_K) + bytes(bits)
    ).decode("ascii")


def bloom_decode(blob: str) -> tuple[int, int, bytes]:
    raw = base64.b64decode(blob)
    m, k = struct.unpack(">qi", raw[:12])
    if not 1 <= k <= 8:
        raise ValueError(
            f"bloom blob declares k={k}, outside this codec's "
            "supported [1, 8] — refusing (see _positions)"
        )
    if m <= 0:
        raise ValueError(f"bloom blob declares m={m} <= 0 — refusing")
    return m, k, raw[12:]


def bloom_might_contain(decoded: tuple[int, int, bytes], key: str) -> bool:
    m, k, bits = decoded
    return all(
        bits[pos >> 3] & (1 << (pos & 7)) for pos in _positions(str(key), m, k)
    )
