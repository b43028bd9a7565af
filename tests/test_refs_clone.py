"""Iceberg named refs (tags/branches) and Delta shallow clone.

Refs: metadata['refs'] pins snapshots by name — read_iceberg(ref=..)
resolves them and expire_snapshots RETAINS every ref'd snapshot (a
tag that can expire is just a remembered integer). Clone: a new Delta
table referencing the source's files by absolute path — zero copy,
divergent writes never touch the source, vacuum can't cross roots."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.delta_log import (
    DeltaLog,
    DeltaLogWriter,
    clone_delta,
    read_delta,
)
from plankton_spark.sources.iceberg_meta import (
    IcebergTable,
    IcebergWriter,
    read_iceberg,
)


def _k(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
    )


def _ks(df):
    return sorted(r[0] for r in df.select("k").collect())


# ---------------------------------------------------------------------
# Iceberg refs
# ---------------------------------------------------------------------


def test_iceberg_tag_read_and_expiry_protection(spark, tmp_path):
    root = str(tmp_path / "ib")
    w = IcebergWriter(spark, root)
    s1 = w.create(_k(spark, 0, 5).coalesce(1))
    w.set_ref("v1.0", s1)
    for i in range(1, 7):
        w.append(_k(spark, i * 10, i * 10 + 2).coalesce(1))
    # read through the tag: the pinned snapshot, not the tip
    assert _ks(read_iceberg(spark, root, ref="v1.0")) == list(range(5))
    # expiry keeps the tagged snapshot even though it's outside keep_last
    expired = w.expire_snapshots(keep_last=2)
    assert s1 not in expired and expired, "tag must pin s1; others expire"
    assert _ks(read_iceberg(spark, root, ref="v1.0")) == list(range(5))
    # dropping the tag releases it for the next expiry round
    w.drop_ref("v1.0")
    assert s1 in w.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="no ref"):
        read_iceberg(spark, root, ref="v1.0")


def test_iceberg_ref_validation(spark, tmp_path):
    root = str(tmp_path / "ib_v")
    w = IcebergWriter(spark, root)
    s1 = w.create(_k(spark, 0, 3).coalesce(1))
    with pytest.raises(ValueError, match="no snapshot"):
        w.set_ref("bad", 999)
    with pytest.raises(ValueError, match="tag.*branch|'tag' or 'branch'"):
        w.set_ref("bad", s1, kind="release")
    w.set_ref("main-branch", s1, kind="branch")
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, root, snapshot_id=s1, ref="main-branch")
    with pytest.raises(ValueError, match="no ref"):
        w.drop_ref("nope")


# ---------------------------------------------------------------------
# Delta shallow clone
# ---------------------------------------------------------------------


def test_clone_delta_diverges_without_touching_source(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    w = DeltaLogWriter(spark, src)
    w.create(_k(spark, 0, 6).coalesce(1))
    w.append(_k(spark, 10, 13).coalesce(1))
    clone_delta(spark, src, dst)
    assert _ks(read_delta(spark, dst)) == _ks(read_delta(spark, src))
    src_version = DeltaLog(src).latest_version()
    # diverge the clone: append + a rewrite that tombstones a
    # source-referenced (absolute-path) file
    cw = DeltaLogWriter(spark, dst)
    cw.append(_k(spark, 100, 102).coalesce(1))
    cw.delete_where(F.col("k") < 3)
    assert _ks(read_delta(spark, dst)) == [3, 4, 5, 10, 11, 12, 100, 101]
    # the source never moved
    assert DeltaLog(src).latest_version() == src_version
    assert _ks(read_delta(spark, src)) == list(range(6)) + [10, 11, 12]
    # clone vacuum cannot reach source files (outside its root)
    removed = cw.vacuum(grace_seconds=0)
    assert all(not r.startswith("..") and not os.path.isabs(r) for r in removed)
    assert _ks(read_delta(spark, src)) == list(range(6)) + [10, 11, 12]
    with pytest.raises(FileExistsError, match="already a Delta"):
        clone_delta(spark, src, dst)


def test_clone_delta_carries_dvs_and_partitioning(spark, tmp_path):
    src = str(tmp_path / "src_dv")
    dst = str(tmp_path / "dst_dv")
    w = DeltaLogWriter(spark, src)
    w.create(_k(spark, 0, 10).coalesce(1), partition_by=["grp"])
    w.delete_where_dv(F.col("k") >= 8)
    clone_delta(spark, src, dst)
    # DV'd rows stay deleted through the clone ('u' → absolute 'p')
    assert _ks(read_delta(spark, dst)) == list(range(8))
    # partition values carried: pruned read works on the clone
    assert _ks(read_delta(spark, dst, partitions={"grp": "1"})) == [
        1, 3, 5, 7,
    ]
    # and the clone's own delete diverges cleanly (DV-aware — the
    # plain rewrite path correctly REFUSES a DV-carrying table)
    with pytest.raises(Exception, match="deletion vectors"):
        DeltaLogWriter(spark, dst).delete_where(F.col("grp") == 0)
    DeltaLogWriter(spark, dst).delete_where_dv(F.col("grp") == 0)
    assert _ks(read_delta(spark, dst)) == [1, 3, 5, 7]
    assert _ks(read_delta(spark, src)) == list(range(8))


def test_iceberg_branch_write_audit_publish(spark, tmp_path):
    """Write-audit-publish: appends on a branch extend the branch head
    only (main untouched), then publishing = rollback_to(branch head).
    Appending to a TAG refuses (immutable pin)."""
    root = str(tmp_path / "ib_br")
    w = IcebergWriter(spark, root)
    s1 = w.create(_k(spark, 0, 3).coalesce(1))
    b1 = w.append(_k(spark, 10, 12).coalesce(1), branch="audit")
    b2 = w.append(_k(spark, 20, 22).coalesce(1), branch="audit")
    # main is untouched; the branch accumulated both appends
    assert _ks(read_iceberg(spark, root)) == [0, 1, 2]
    assert _ks(read_iceberg(spark, root, ref="audit")) == [
        0, 1, 2, 10, 11, 20, 21,
    ]
    assert b2 > b1 > s1
    # a concurrent MAIN append must not disturb the branch
    w.append(_k(spark, 30, 31).coalesce(1))
    assert _ks(read_iceberg(spark, root)) == [0, 1, 2, 30]
    assert _ks(read_iceberg(spark, root, ref="audit")) == [
        0, 1, 2, 10, 11, 20, 21,
    ]
    # publish: fast-forward current to the audited head
    w.rollback_to(b2)
    assert _ks(read_iceberg(spark, root)) == [0, 1, 2, 10, 11, 20, 21]
    # tags stay immutable
    w.set_ref("pin", s1, kind="tag")
    with pytest.raises(ValueError, match="immutable"):
        w.append(_k(spark, 40, 41).coalesce(1), branch="pin")
