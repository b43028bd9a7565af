"""Iceberg v3 ROW LINEAGE lifecycle (round-10 verdict #2): first_row_id
assignment on create/append (the inheritance chain), _row_id /
_last_updated_sequence_number projection on read, stability across DV
deletes, and loud refusal where lineage is not tracked."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plankton_spark.sources.iceberg_meta import (
    IcebergTable,
    IcebergWriter,
    read_iceberg,
)

SF0001 = "/root/testdata/sf0.001"


def _mk(spark, tmp_path, name, n=30):
    root = str(tmp_path / name)
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(n)], "k long, v string"
        )
    )
    return root, w


def test_create_assigns_row_ids_from_zero(spark, tmp_path):
    root, _w = _mk(spark, tmp_path, "lin1")
    rows = read_iceberg(spark, root, with_lineage=True).collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(30))
    assert {r["_last_updated_sequence_number"] for r in rows} == {0}
    t = IcebergTable(root)
    assert t.metadata["next-row-id"] == 30
    assert t.metadata["snapshots"][0]["first-row-id"] == 0


def test_append_continues_the_chain(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "lin2")
    w.append(
        spark.createDataFrame([(100 + i, "x") for i in range(10)],
                              "k long, v string")
    )
    rows = read_iceberg(spark, root, with_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    # original rows keep [0, 30); appended rows claim [30, 40)
    assert sorted(v for k, v in by_k.items() if k < 100) == list(range(30))
    assert sorted(v for k, v in by_k.items() if k >= 100) == list(range(30, 40))
    t = IcebergTable(root)
    assert t.metadata["next-row-id"] == 40
    assert t.metadata["snapshots"][-1]["first-row-id"] == 30


def test_row_ids_stable_across_dv_delete(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "lin3")
    before = {
        r["k"]: r["_row_id"]
        for r in read_iceberg(spark, root, with_lineage=True).collect()
    }
    w.delete_where_dv(F.col("k") % 5 == 0)
    after = {
        r["k"]: r["_row_id"]
        for r in read_iceberg(spark, root, with_lineage=True).collect()
    }
    assert set(after) == {k for k in before if k % 5 != 0}
    for k, rid in after.items():
        assert rid == before[k], "DV delete moved a surviving row's _row_id"


def test_lineage_ids_are_unique_and_dense(spark, tmp_path):
    root, w = _mk(spark, tmp_path, "lin4")
    w.append(spark.createDataFrame([(200, "y")], "k long, v string"))
    w.append(spark.createDataFrame([(201, "z")], "k long, v string"))
    rows = read_iceberg(spark, root, with_lineage=True).collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(32))  # no gap, no collision across commits


def test_pre_lineage_table_refuses(spark, tmp_path):
    """A foreign v2/v1 table with no first_row_id in its manifests must
    refuse the lineage projection loudly, not fabricate ids."""
    from plankton_spark.queries.iceberg_interop import author_iceberg_orders

    root = author_iceberg_orders(spark, SF0001)
    with pytest.raises(ValueError, match="no first_row_id"):
        read_iceberg(spark, root, with_lineage=True).collect()
    # plain read unaffected
    assert read_iceberg(spark, root).count() > 0


def test_rewrite_op_breaks_lineage_loudly(spark, tmp_path):
    """OPTIMIZE rewrites data files without preserving row ids (this
    engine doesn't materialize _row_id on compaction) — the lineage
    read must refuse afterwards, never silently renumber."""
    root, w = _mk(spark, tmp_path, "lin5")
    w.append(spark.createDataFrame([(300, "q")], "k long, v string"))
    w.optimize()
    with pytest.raises(ValueError, match="first_row_id"):
        read_iceberg(spark, root, with_lineage=True).collect()
    assert read_iceberg(spark, root).count() == 31


def test_foreign_lineage_fixture_reads(spark):
    """The foreign-authored v3 fixture (explicit first_row_id + seq
    chain + DVs) projects per-spec values."""
    from plankton_spark.queries.iceberg_interop import (
        author_iceberg_lineage_orders,
    )

    root = author_iceberg_lineage_orders(spark, SF0001)
    rows = read_iceberg(spark, root, with_lineage=True).collect()
    assert rows, "fixture read empty"
    seqs = {r["_last_updated_sequence_number"] for r in rows}
    assert seqs == {1, 2}
    # _row_id dense over the pre-delete corpus minus the DV'd rows
    ids = sorted(r["_row_id"] for r in rows)
    assert len(ids) == len(set(ids))


def test_append_after_dv_delete_continues_chain(spark, tmp_path):
    """A DV delete must carry next-row-id forward untouched, so a later
    append claims ids AFTER the deleted rows' (ids are never reused)."""
    root, w = _mk(spark, tmp_path, "lin6")
    w.delete_where_dv(F.col("k") < 10)
    w.append(spark.createDataFrame([(400, "n")], "k long, v string"))
    rows = read_iceberg(spark, root, with_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert by_k[400] == 30  # deleted ids [0,10) are NOT reused
    assert sorted(v for k, v in by_k.items() if k < 100) == list(range(10, 30))
    t = IcebergTable(root)
    assert t.metadata["next-row-id"] == 31
    # the delete snapshot records first-row-id == next-row-id (no rows)
    del_snap = t.metadata["snapshots"][1]
    assert del_snap["summary"]["operation"] == "delete"
    assert del_snap["first-row-id"] == 30


def test_branch_append_advances_global_ids(spark, tmp_path):
    """Row ids are TABLE-global (spec): an append on an audit branch
    claims ids after main's high-water mark, and a later main append
    does NOT reuse them even though main never saw the branch rows."""
    root, w = _mk(spark, tmp_path, "lin7")
    w.append(
        spark.createDataFrame([(600, "b")], "k long, v string"),
        branch="audit",
    )
    br = read_iceberg(spark, root, ref="audit", with_lineage=True).collect()
    assert {r["_row_id"] for r in br if r["k"] == 600} == {30}
    # main is untouched by the branch write
    main = read_iceberg(spark, root, with_lineage=True).collect()
    assert sorted(r["_row_id"] for r in main) == list(range(30))
    # a later MAIN append continues after the branch's claim
    w.append(spark.createDataFrame([(700, "m")], "k long, v string"))
    main = {
        r["k"]: r["_row_id"]
        for r in read_iceberg(spark, root, with_lineage=True).collect()
    }
    assert main[700] == 31  # 30 was claimed by the branch append
