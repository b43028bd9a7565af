"""Retention across all three table formats (round 7): expire old
log versions / snapshots so vacuum's retention=infinite posture gains
a finite end — expired versions stop time-traveling with a CLEAR
error, current reads and writers are untouched, and exclusively-
expired references become vacuum-able. Also pins the planktable
vacuum fix: checkpoints count as references (post-expiry they may be
the ONLY record of a live file)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.delta_log import DeltaLog, DeltaLogWriter, read_delta
from plankton_spark.sources.iceberg_meta import (
    IcebergTable,
    IcebergWriter,
    read_iceberg,
)
from plankton_spark.table_format import PlankTable


def _k(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


# ---------------------------------------------------------------------
# planktable
# ---------------------------------------------------------------------


def test_planktable_expire_log_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "pt_ret")
    t = PlankTable(spark, root)
    t.create(_k(spark, 0, 3).coalesce(1))
    for i in range(1, 5):
        t.append(_k(spark, i * 10, i * 10 + 2).coalesce(1))
    assert t.latest_version() == 4
    expired = t.expire_log(keep_versions=2)
    assert expired == [0, 1, 2]
    # current + cutoff reads fine; pre-cutoff versions say WHY they fail
    assert t.read().count() == 3 + 4 * 2
    assert t.read(version=3).count() == 3 + 3 * 2
    with pytest.raises(ValueError, match="expired by"):
        t.read(version=1).count()
    # vacuum must NOT eat files whose only record is the checkpoint
    assert t.vacuum() == []
    assert t.read().count() == 11
    # appends continue, and an overwrite + expire frees the old files
    n_data_before = len(
        [e for e in os.listdir(root) if e.startswith("data-")]
    )
    t.overwrite(_k(spark, 100, 102).coalesce(1))
    t.expire_log(keep_versions=1)
    removed = t.vacuum()
    assert removed, "pre-overwrite files should be reclaimed"
    assert len(
        [e for e in os.listdir(root) if e.startswith("data-")]
    ) < n_data_before
    assert sorted(r.k for r in t.read().collect()) == [100, 101]


# ---------------------------------------------------------------------
# Delta
# ---------------------------------------------------------------------


def test_delta_cleanup_log_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "d_ret")
    w = DeltaLogWriter(spark, root)
    w.create(_k(spark, 0, 3).coalesce(1))
    for i in range(1, 5):
        w.append(_k(spark, i * 10, i * 10 + 2).coalesce(1))
    expired = w.cleanup_log(keep_versions=2)
    assert expired == [0, 1, 2]
    assert read_delta(spark, root).count() == 11
    assert read_delta(spark, root, version=3).count() == 9
    with pytest.raises(ValueError, match="expired by log cleanup"):
        read_delta(spark, root, version=1).count()
    # txn exactly-once survives the cleanup (txn rows in the checkpoint)
    assert w.append(_k(spark, 200, 201), txn=("job", 7)) is not None
    assert w.append(_k(spark, 200, 201), txn=("job", 7)) is None
    # overwrite then cleanup: the old files' only references die with
    # the expired commits/checkpoints, so vacuum reclaims them
    w.overwrite(_k(spark, 500, 502).coalesce(1))
    w.cleanup_log(keep_versions=1)
    removed = w.vacuum(grace_seconds=0.0)
    assert any(r.endswith(".parquet") for r in removed)
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [500, 501]


# ---------------------------------------------------------------------
# Iceberg
# ---------------------------------------------------------------------


def test_iceberg_expire_snapshots_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "i_ret")
    w = IcebergWriter(spark, root)
    w.create(_k(spark, 0, 3).coalesce(1))
    for i in range(1, 5):
        w.append(_k(spark, i * 10, i * 10 + 2).coalesce(1))
    snaps_before = [s["snapshot-id"] for s in IcebergTable(root).snapshots()]
    lists_before = {
        f
        for f in os.listdir(os.path.join(root, "metadata"))
        if f.startswith("snap-")
    }
    expired = w.expire_snapshots(keep_last=2)
    assert expired == snaps_before[:-2]
    assert read_iceberg(spark, root).count() == 11
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_iceberg(spark, root, snapshot_id=expired[0]).count()
    # the expired snapshots' EXCLUSIVE manifest lists become orphans
    removed = w.vacuum(grace_seconds=0.0)
    assert any(r.startswith("metadata/snap-") for r in removed)
    # no retained manifest list was touched
    kept_lists = {
        f
        for f in os.listdir(os.path.join(root, "metadata"))
        if f.startswith("snap-")
    }
    assert len(kept_lists) < len(lists_before)
    assert read_iceberg(spark, root).count() == 11
    # writers keep working after expiry
    w.append(_k(spark, 300, 301).coalesce(1))
    assert read_iceberg(spark, root).count() == 12
    # expiring everything including current refuses
    with pytest.raises(ValueError, match="keep_last must be >= 1"):
        w.expire_snapshots(keep_last=0)
