"""TIMESTAMP AS OF time travel on all three formats: resolve the
latest version/snapshot committed at or before a wall-clock instant.
planktable commits carry their own `ts`, Delta uses the spec rule
(commit time = log-file mtime), Iceberg snapshots carry real epoch
timestamp-ms (fixed this round — they were fake snap-id placeholders,
which would have broken any external timestamp consumer)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.delta_log import (
    DeltaLogWriter,
    read_delta,
    version_at_timestamp,
)
from plankton_spark.sources.iceberg_meta import (
    IcebergTable,
    IcebergWriter,
    read_iceberg,
)
from plankton_spark.table_format import PlankTable


def _k(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_planktable_timestamp_as_of(spark, tmp_path):
    t = PlankTable(spark, str(tmp_path / "pt"))
    t.create(_k(spark, 0, 3).coalesce(1))
    t_mid = time.time()
    time.sleep(0.05)
    t.append(_k(spark, 10, 12).coalesce(1))
    assert t.version_at(t_mid) == 0
    assert t.read(timestamp=t_mid).count() == 3
    assert t.read(timestamp=time.time()).count() == 5
    with pytest.raises(ValueError, match="no version"):
        t.read(timestamp=t_mid - 3600)
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, timestamp=t_mid)


def test_delta_timestamp_as_of(spark, tmp_path):
    root = str(tmp_path / "dl")
    w = DeltaLogWriter(spark, root)
    w.create(_k(spark, 0, 3).coalesce(1))
    t_mid = time.time() * 1000
    time.sleep(0.05)
    w.append(_k(spark, 10, 12).coalesce(1))
    assert version_at_timestamp(root, int(t_mid)) == 0
    assert read_delta(spark, root, timestamp_ms=int(t_mid)).count() == 3
    assert (
        read_delta(spark, root, timestamp_ms=int(time.time() * 1000)).count()
        == 5
    )
    with pytest.raises(ValueError, match="no commit"):
        read_delta(spark, root, timestamp_ms=int(t_mid - 3_600_000))
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, root, version=0, timestamp_ms=int(t_mid))


def test_iceberg_timestamp_as_of_and_real_timestamps(spark, tmp_path):
    root = str(tmp_path / "ib")
    w = IcebergWriter(spark, root)
    before = time.time() * 1000
    w.create(_k(spark, 0, 3).coalesce(1))
    t_mid = time.time() * 1000
    time.sleep(0.05)
    w.append(_k(spark, 10, 12).coalesce(1))
    # snapshots carry REAL epoch ms now, not snap-id placeholders
    snaps = IcebergTable(root).metadata["snapshots"]
    assert all(s["timestamp-ms"] >= before - 1000 for s in snaps)
    assert snaps[0]["timestamp-ms"] <= snaps[1]["timestamp-ms"]
    assert read_iceberg(spark, root, timestamp_ms=int(t_mid)).count() == 3
    assert (
        read_iceberg(
            spark, root, timestamp_ms=int(time.time() * 1000)
        ).count()
        == 5
    )
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg(spark, root, timestamp_ms=int(before - 3_600_000))
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, root, snapshot_id=1, timestamp_ms=int(t_mid))
