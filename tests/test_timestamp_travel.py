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


def test_history_surfaces_all_three_formats(spark, tmp_path):
    """DESCRIBE HISTORY parity: planktable.history() (existing),
    delta_history (operation derived from action shape — commitInfo
    is optional per spec), iceberg_history (snapshots + refs)."""
    from plankton_spark.sources.delta_log import (
        DeltaLogWriter,
        delta_history,
    )
    from plankton_spark.sources.iceberg_meta import (
        IcebergWriter,
        iceberg_history,
    )

    root = str(tmp_path / "dlh")
    w = DeltaLogWriter(spark, root)
    w.create(_k(spark, 0, 5).coalesce(1))
    w.append(_k(spark, 10, 12).coalesce(1))
    w.delete_where(F.col("k") == 11)  # partial: survivors re-stage
    w.optimize(num_files=1)
    w.add_constraint("pos", "k >= 0")
    ops = [h["operation"] for h in delta_history(root)]
    assert ops[0] == "CREATE"
    assert ops[1] == "WRITE"
    assert ops[2] == "REWRITE"
    assert ops[3] == "OPTIMIZE"
    assert ops[4] == "SET METADATA"
    ts = [h["timestamp_ms"] for h in delta_history(root)]
    assert ts == sorted(ts)

    iroot = str(tmp_path / "ibh")
    iw = IcebergWriter(spark, iroot)
    s1 = iw.create(_k(spark, 0, 3).coalesce(1))
    iw.append(_k(spark, 10, 12).coalesce(1))
    iw.set_ref("v1", s1)
    hist = iceberg_history(iroot)
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[1]["is_current"] and not hist[0]["is_current"]
    assert hist[0]["refs"] == ["v1"]
