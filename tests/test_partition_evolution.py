"""Iceberg PARTITION EVOLUTION: evolve_spec() is a metadata-only
commit — existing data files keep their layout and their manifests
keep their spec id; reads assemble each spec group with its own
identity columns and union. The no-rewrite property is the feature:
re-partitioning a 100 TB table costs one metadata edit.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.iceberg_meta import (
    IcebergTable,
    IcebergWriter,
    read_iceberg,
)


def _mk(spark, tmp_path, name, partition_by=None):
    root = str(tmp_path / name)
    w = IcebergWriter(spark, root)
    df = spark.range(0, 10).selectExpr(
        "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
        "CAST(id * 10 AS DOUBLE) AS v",
    )
    w.create(df, partition_by=partition_by)
    return root, w


def test_evolve_unpartitioned_to_identity(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "ev1")
    sid = w.evolve_spec(["grp"])
    assert sid == 1
    w.append(
        spark.range(10, 16).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
            "CAST(id * 10 AS DOUBLE) AS v",
        )
    )
    got = read_iceberg(spark, root)
    assert sorted(r.k for r in got.collect()) == list(range(16))
    # and grp survives for every row, both layouts
    assert got.where(F.col("grp").isNull()).count() == 0
    # the new data actually landed hive-style under the new spec
    t = IcebergTable(root)
    assert t.metadata["default-spec-id"] == 1
    full, _pos, _eq, _dv = t.scan_entries_full(None)
    sids = {s for _p, _pv, _q, s in full}
    assert sids == {0, 1}, sids
    new_files = [p for p, _pv, _q, s in full if s == 1]
    assert all("grp=" in p for p in new_files), new_files


def test_evolve_identity_to_unpartitioned(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "ev2", partition_by=["grp"])
    w.evolve_spec(None)
    w.append(
        spark.range(10, 14).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
            "CAST(id * 10 AS DOUBLE) AS v",
        )
    )
    got = read_iceberg(spark, root)
    assert sorted(r.k for r in got.collect()) == list(range(14))
    assert got.where(F.col("grp").isNull()).count() == 0
    grp = {r.grp for r in got.collect()}
    assert grp == {"A", "B"}


def test_evolve_rejects_unknown_source(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "ev3")
    with pytest.raises(ValueError, match="not in the table schema"):
        w.evolve_spec(["nope"])


def test_spec_and_field_ids_never_reuse(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "ev4", partition_by=["grp"])
    w.evolve_spec(None)
    w.evolve_spec(["grp"])
    md = IcebergTable(root).metadata
    specs = md["partition-specs"]
    assert [s["spec-id"] for s in specs] == [0, 1, 2]
    fids = [f["field-id"] for s in specs for f in s["fields"]]
    assert len(fids) == len(set(fids)), fids
    assert all(f >= 1000 for f in fids)
    # legacy top-level key must not shadow the evolved default
    assert "partition-spec" not in md


def test_delete_where_works_across_specs(spark, tmp_path):
    """Row-level delete on an evolved table: hit files rewrite under
    the default spec, carried manifests keep their own spec id AND
    entry-schema shape."""
    root, w = _mk(spark, tmp_path, "ev5")
    w.evolve_spec(["grp"])
    w.append(
        spark.range(10, 16).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
            "CAST(id * 10 AS DOUBLE) AS v",
        )
    )
    w.delete_where(F.col("k") % 2 == 0)
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [k for k in range(16) if k % 2 == 1]


def test_optimize_compacts_to_single_spec(spark, tmp_path):
    """OPTIMIZE re-stages every live file under the default spec —
    the documented 'compact to a single spec' escape hatch."""
    root, w = _mk(spark, tmp_path, "ev6")
    w.evolve_spec(["grp"])
    w.append(
        spark.range(10, 16).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
            "CAST(id * 10 AS DOUBLE) AS v",
        )
    )
    w.optimize()
    t = IcebergTable(root)
    full, _pos, _eq, _dv = t.scan_entries_full(None)
    assert {s for *_x, s in full} == {1}
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == list(range(16))


def test_time_travel_spans_evolution(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "ev7")
    snap0 = IcebergTable(root).metadata["current-snapshot-id"]
    w.evolve_spec(["grp"])
    w.append(
        spark.range(10, 12).selectExpr(
            "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
            "CAST(id * 10 AS DOUBLE) AS v",
        )
    )
    old = sorted(r.k for r in read_iceberg(spark, root, snapshot_id=snap0).collect())
    assert old == list(range(10))
    new = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert new == list(range(12))
