"""Regression tests for the round-12 ADVICE.md findings (all low):

1. hudi_bloom._positions / bloom_decode refuse k outside [1, 8]
   instead of silently degrading extra probe bits to position 0.
2. bloom_build packs m as 8-byte big-endian, so a legitimately huge
   base file (n*20 bits >= 2^31) cannot overflow struct.pack
   mid-metadata-update.
3. functions.round_ratio6 computes the quotient with Spark's
   integral ``div`` (no double conversion), so exactness holds for
   any 2p*10^6 + q that fits int64 — not just p below ~4.5e9.
4. Retention tombstones a removed file's column_stats AND
   bloom_filters metadata records, not just its files row — the
   bloom probe's broadcast stays bounded by LIVE files.
5. HudiIncrStreamReader refuses a legacy {'pos': n} checkpoint when
   the timeline shows out-of-order instant completion (the exact
   hazard that shifts ordinals).
"""

from __future__ import annotations

import base64
import os
import struct

import pytest
from pyspark.sql import functions as F

from plankton_spark.sources.hudi_bloom import (
    bloom_build,
    bloom_decode,
    bloom_might_contain,
)
from plankton_spark.sources.hudi_meta import (
    HudiIncrStreamReader,
    HudiWriter,
    clean,
    read_hudi,
)


def test_bloom_decode_refuses_out_of_range_k():
    ok = bloom_decode(bloom_build(["a", "b"]))
    assert 1 <= ok[1] <= 8
    for bad_k in (0, 9, 12, -1):
        blob = base64.b64encode(
            struct.pack(">qi", 4096, bad_k) + bytes(512)
        ).decode("ascii")
        with pytest.raises(ValueError, match=r"\[1, 8\]"):
            bloom_decode(blob)
    with pytest.raises(ValueError, match="m="):
        bloom_decode(
            base64.b64encode(struct.pack(">qi", 0, 7)).decode("ascii")
        )


def test_bloom_m_is_64_bit():
    # 2^35 bits would overflow a signed 32-bit pack; the header must
    # round-trip it (decode side only — building a 4 GiB bit array
    # is not a unit test's business)
    m = 1 << 35
    blob = base64.b64encode(struct.pack(">qi", m, 7)).decode("ascii")
    mm, kk, _bits = bloom_decode(blob)
    assert (mm, kk) == (m, 7)
    # and the self-written codec still round-trips membership
    keys = [f"k{i}" for i in range(500)]
    dec = bloom_decode(bloom_build(keys))
    assert all(bloom_might_contain(dec, k) for k in keys)


def test_round_ratio6_exact_past_double_mantissa(spark):
    """p large enough that 2p*10^6 exceeds 2^53 (where the old
    double-division path loses exactness) still rounds exactly."""
    from plankton_spark.functions import round_ratio6

    p, q = 4_000_000_000_000, 3  # 2p*1e6 + q = 8e18 + 3 > 2^53
    got = (
        spark.range(1)
        .select(
            round_ratio6(
                F.lit(p).cast("long"), F.lit(q).cast("long")
            ).alias("r")
        )
        .collect()[0]["r"]
    )
    num = 2 * p * 10**6 + q
    want = (num // (2 * q)) / 10**6
    assert got == want


def test_retention_tombstones_stats_and_blooms(spark, tmp_path):
    """clean() must mark the removed file's column_stats and
    bloom_filters records deleted — the probe's candidate set is
    bounded by live files, not by table history."""
    root = str(tmp_path / "t")
    w = HudiWriter(spark, root, record_key="k", metadata_table=True)
    df = spark.createDataFrame([(i, "A") for i in range(20)], "k int, s string")
    w.create(df)
    w.upsert(
        spark.createDataFrame([(i, "B") for i in range(5)], "k int, s string")
    )
    mpath = os.path.join(root, ".hoodie", "metadata")
    removed = clean(root, keep_last_slices=1, spark=spark)
    assert removed
    removed_names = {os.path.basename(r) for r in removed}

    blooms = read_hudi(spark, mpath, partition_path="bloom_filters")
    live_bloom_files = {
        r["fname"]
        for r in blooms.where(~F.col("deleted")).select("fname").collect()
    }
    assert not (live_bloom_files & removed_names)
    # the tombstones exist (not merely absent rows)
    dead_bloom_files = {
        r["fname"]
        for r in blooms.where(F.col("deleted")).select("fname").collect()
    }
    assert removed_names <= dead_bloom_files

    cs = read_hudi(spark, mpath, partition_path="column_stats")
    live_cs_files = {
        r["fname"]
        for r in cs.where(~F.col("deleted")).select("fname").collect()
    }
    assert not (live_cs_files & removed_names)


def test_legacy_offset_refused_on_out_of_order_timeline(spark, tmp_path):
    root = str(tmp_path / "t")
    w = HudiWriter(spark, root, record_key="k")
    i1 = w.create(
        spark.createDataFrame([(i, "A") for i in range(10)], "k int, s string")
    )
    i2 = w.upsert(
        spark.createDataFrame([(1, "B")], "k int, s string")
    )
    schema = read_hudi(spark, root, with_meta=True).schema
    r = HudiIncrStreamReader(root, schema)
    # in-order timeline: legacy ordinal still maps
    assert {p.instant for p in r.partitions({"pos": 1}, {"last": i2})} == {i2}
    # simulate a foreign writer completing an EARLIER-sorting instant
    # LATER: bump the first instant file's mtime past the second's
    meta_dir = os.path.join(root, ".hoodie")
    f2 = os.path.join(meta_dir, f"{i2}.commit")
    t2 = os.path.getmtime(f2)
    os.utime(os.path.join(meta_dir, f"{i1}.commit"), (t2 + 10, t2 + 10))
    with pytest.raises(ValueError, match="out-of-order"):
        r.partitions({"pos": 1}, {"last": i2})
    # instant-time offsets are unaffected by completion order
    assert {p.instant for p in r.partitions({"last": i1}, {"last": i2})} == {
        i2
    }
