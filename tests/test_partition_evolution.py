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


def _ms_table(spark, tmp_path, name):
    """Unpartitioned spec-0 file (k<60, grp in content) + identity-
    partitioned spec-1 files (k>=60, grp attached) — the
    partition-evolved layout every multi-spec test needs."""
    root = str(tmp_path / name)
    df = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS grp"
    )
    w = IcebergWriter(spark, root)
    w.create(df.where(F.col("k") < 60).repartition(1))
    w.evolve_spec(["grp"])
    w.append(df.where(F.col("k") >= 60))
    return root, w, df


def _rows(df):
    return sorted((r["k"], r["grp"]) for r in df.collect())


def test_multispec_delete_where_keeps_old_spec_columns(spark, tmp_path):
    """Round-12 regression: delete_where previously assembled OLD-spec
    files with the DEFAULT spec's columns, silently replacing their
    CONTENT partition column with NULL literals (verified live). The
    per-spec assembly must keep every survivor's value exact."""
    root, w, df = _ms_table(spark, tmp_path, "msdel")
    w.delete_where(F.col("k") % 10 == 7)
    got = read_iceberg(spark, root)
    assert got.where(F.col("grp").isNull()).count() == 0
    assert _rows(got) == _rows(df.where(F.col("k") % 10 != 7))


def test_multispec_update_where_exact(spark, tmp_path):
    root, w, df = _ms_table(spark, tmp_path, "msupd")
    w.update_where({"k": F.col("k") + 1000}, F.col("k").isin(5, 65))
    got = read_iceberg(spark, root)
    assert got.where(F.col("grp").isNull()).count() == 0
    assert sorted(r["k"] for r in got.collect()) == sorted(
        k + 1000 if k in (5, 65) else k for k in range(100)
    )


def test_multispec_replace_where_exact(spark, tmp_path):
    root, w, df = _ms_table(spark, tmp_path, "msrw")
    repl = spark.range(200, 205).selectExpr(
        "id AS k", "CAST(0 AS STRING) AS grp"
    )
    w.replace_where(repl, F.col("grp") == "0")
    got = read_iceberg(spark, root)
    assert got.where(F.col("grp").isNull()).count() == 0
    expected = _rows(df.where(F.col("grp") != "0")) + _rows(repl)
    assert _rows(got) == sorted(expected)


def test_multispec_merge_exact(spark, tmp_path):
    root, w, df = _ms_table(spark, tmp_path, "msmerge")
    src = spark.range(50, 70).selectExpr("id AS k", "'X' AS grp")
    w.merge(src, "k")
    got = read_iceberg(spark, root)
    assert got.count() == 100
    assert got.where(F.col("grp") == "X").count() == 20
    assert got.where(F.col("grp").isNull()).count() == 0


def test_multispec_optimize_resolves_evolution(spark, tmp_path):
    root, w, df = _ms_table(spark, tmp_path, "msopt")
    w.optimize(num_files=1)
    got = read_iceberg(spark, root)
    assert got.where(F.col("grp").isNull()).count() == 0
    assert _rows(got) == _rows(df)
    # the compaction restaged everything under the current spec
    t = IcebergTable(root)
    full = t.scan_entries_full(None)[0]
    assert len({sid for *_x, sid in full}) == 1


def test_multispec_changelog_and_stream(spark, tmp_path):
    """Changelog over a partition-evolved range: per-spec assembly at
    every boundary (batch AND the icebergcdf streaming source — whose
    per-file partition-value fill was always spec-agnostic)."""
    import uuid as _uuid

    from plankton_spark.sources.iceberg_meta import (
        read_iceberg_changelog,
        register,
    )

    root, w, df = _ms_table(spark, tmp_path, "mscl")
    s3 = w.delete_where(F.col("grp") == "0")
    cl = read_iceberg_changelog(spark, root, 1, s3)
    by = {
        (r["_snapshot_id"], r["_change_type"]): r["n"]
        for r in cl.groupBy("_snapshot_id", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by[(1, "insert")] == 60
    assert by[(2, "insert")] == 40
    # delete side: the whole spec-0 file (60) + spec-1's grp=0 files
    assert by[(3, "delete")] == 60 + df.where(
        (F.col("k") >= 60) & (F.col("grp") == "0")
    ).count()
    assert by[(3, "insert")] == df.where(
        (F.col("k") < 60) & (F.col("grp") != "0")
    ).count()
    # no NULL partition values anywhere in the feed
    assert cl.where(F.col("grp").isNull()).count() == 0
    # streaming twin drains the same change set
    register(spark)
    sink = str(tmp_path / "mscl_sink")
    ckpt = str(tmp_path / "mscl_ckpt")
    q = (
        spark.readStream.format("icebergcdf")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .queryName(f"mscdf_{_uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    feed = spark.read.parquet(sink)
    assert feed.count() == cl.count()
    assert feed.where(F.col("grp").isNull()).count() == 0


def test_multispec_row_level_deletes_read_exact(spark, tmp_path):
    """Round 12: row-level deletes over a partition-evolved snapshot
    read exactly — deletes are spec-agnostic (positions/DVs key by
    file basename, eq deletes by value + sequence), the per-spec
    union scan feeds the shared subtraction. The changelog's
    eq × multi-spec refusal lifts with it (live-set diff over the
    per-spec assembly)."""
    from plankton_spark.sources.iceberg_meta import read_iceberg_changelog

    root, w, df = _ms_table(spark, tmp_path, "mseq")
    keys = spark.range(0, 5).selectExpr("id AS k")
    sid = w.delete_where_eq(keys)
    got = read_iceberg(spark, root)
    assert sorted(r["k"] for r in got.collect()) == list(range(5, 100))
    assert got.where(F.col("grp").isNull()).count() == 0
    cl = read_iceberg_changelog(spark, root, 1, sid)
    by = {
        (r["_snapshot_id"], r["_change_type"]): r["n"]
        for r in cl.groupBy("_snapshot_id", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by[(1, "insert")] == 60
    assert by[(2, "insert")] == 40
    # the eq boundary attributes exactly the newly-dead rows
    assert by[(sid, "delete")] == 5
    assert (sid, "insert") not in by
