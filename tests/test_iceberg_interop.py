"""Iceberg metadata-chain reader tests: hand-authored table per the
published spec, snapshot time travel, DELETED entries, the
format("iceberglog") wrapper, and the generic nested Avro codec the
manifests ride on."""

from __future__ import annotations

import io

import pytest

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.queries.iceberg_interop import author_iceberg_orders
from plankton_spark.sources.avro_ocf import (
    read_datum,
    read_ocf_generic,
    write_datum,
    write_ocf_generic,
    _resolve_names,
)
from plankton_spark.sources.iceberg_meta import IcebergTable, read_iceberg, register
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def ice_root(spark):
    return author_iceberg_orders(spark, SF0001, name="iceberg_orders_test")


def _orders(spark, lo, hi):
    return read_table(spark, SF0001, "orders").where(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
    )


def test_snapshot_reads(spark, ice_root):
    for sid, lo, hi in ((1, 0, 1000), (2, 0, 2000), (3, 500, 2000)):
        got = read_iceberg(spark, ice_root, snapshot_id=sid)
        exp = _orders(spark, lo, hi)
        assert got.count() == exp.count(), f"snapshot {sid}"
        assert (
            got.agg(F.sum("o_orderkey")).collect()[0][0]
            == exp.agg(F.sum("o_orderkey")).collect()[0][0]
        ), f"snapshot {sid}"


def test_current_snapshot_is_default(spark, ice_root):
    assert (
        read_iceberg(spark, ice_root).count()
        == read_iceberg(spark, ice_root, snapshot_id=3).count()
    )


def test_deleted_entry_drops_file(spark, ice_root):
    t = IcebergTable(ice_root)
    f1 = t.data_files(1)
    f3 = t.data_files(3)
    assert len(f1) == 2 and len(f3) == 2
    # file-a is live in snap 1, deleted in snap 3; file-c added in snap 2
    assert any("file-a" in f for f in f1)
    assert not any("file-a" in f for f in f3)
    assert any("file-c" in f for f in f3)


def test_schema_mapping(spark, ice_root):
    sch = IcebergTable(ice_root).schema()
    assert [f.name for f in sch.fields] == [
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
    ]
    assert sch["o_orderkey"].dataType.simpleString() == "bigint"
    assert sch["o_totalprice"].dataType.simpleString() == "double"


def test_format_iceberglog_wrapper(spark, ice_root):
    register(spark)
    df = (
        spark.read.format("iceberglog")
        .option("path", ice_root)
        .option("snapshotId", 2)
        .load()
    )
    exp = _orders(spark, 0, 2000)
    assert df.count() == exp.count()
    assert df.agg(F.sum("o_orderkey")).collect()[0][0] == exp.agg(
        F.sum("o_orderkey")
    ).collect()[0][0]


def test_unknown_snapshot_raises(spark, ice_root):
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_iceberg(spark, ice_root, snapshot_id=99)


NESTED_SCHEMA = {
    "type": "record",
    "name": "outer",
    "fields": [
        {"name": "tag", "type": "string"},
        {
            "name": "inner",
            "type": {
                "type": "record",
                "name": "innerrec",
                "fields": [
                    {"name": "a", "type": "long"},
                    {"name": "b", "type": ["null", "double"]},
                ],
            },
        },
        {"name": "nums", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
        {"name": "again", "type": ["null", "innerrec"]},
        {
            "name": "color",
            "type": {"type": "enum", "name": "col", "symbols": ["R", "G", "B"]},
        },
        {"name": "fix", "type": {"type": "fixed", "name": "f4", "size": 4}},
    ],
}

NESTED_ROWS = [
    {
        "tag": "x",
        "inner": {"a": 7, "b": 2.5},
        "nums": [1, 2, 3],
        "attrs": {"k": "v", "k2": "v2"},
        "again": {"a": -1, "b": None},
        "color": "G",
        "fix": b"\x01\x02\x03\x04",
    },
    {
        "tag": "y",
        "inner": {"a": 0, "b": None},
        "nums": [],
        "attrs": {},
        "again": None,
        "color": "B",
        "fix": b"\xff\xff\xff\xff",
    },
]


def test_generic_codec_roundtrip(tmp_path):
    path = str(tmp_path / "nested.avro")
    assert write_ocf_generic(path, NESTED_SCHEMA, NESTED_ROWS) == 2
    back = list(read_ocf_generic(path))
    assert back == NESTED_ROWS


def test_generic_codec_deflate(tmp_path):
    path = str(tmp_path / "nested-z.avro")
    write_ocf_generic(path, NESTED_SCHEMA, NESTED_ROWS, codec="deflate")
    assert list(read_ocf_generic(path)) == NESTED_ROWS


def test_datum_named_type_reference():
    names = _resolve_names(NESTED_SCHEMA)
    buf = io.BytesIO()
    write_datum(buf, "innerrec", {"a": 42, "b": 1.5}, names)
    buf.seek(0)
    assert read_datum(buf, "innerrec", names) == {"a": 42, "b": 1.5}


# ---------------------------------------------------------------------
# Append support
# ---------------------------------------------------------------------

from plankton_spark.sources.iceberg_meta import IcebergWriter


def test_writer_create_append_snapshots(spark, tmp_path):
    root = str(tmp_path / "iw")
    w = IcebergWriter(spark, root)
    s1 = w.create(spark.range(0, 10).select(F.col("id").alias("k")))
    s2 = w.append(spark.range(10, 15).select(F.col("id").alias("k")))
    assert (s1, s2) == (1, 2)
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == list(range(15))
    # time travel to the first snapshot
    assert sorted(
        r.k for r in read_iceberg(spark, root, snapshot_id=1).collect()
    ) == list(range(10))
    with pytest.raises(FileExistsError):
        w.create(spark.range(1).select(F.col("id").alias("k")))


def test_writer_output_readable_via_format_wrapper(spark, tmp_path):
    root = str(tmp_path / "iw2")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    w.append(spark.range(5, 8).select(F.col("id").alias("k")))
    register(spark)
    df = spark.read.format("iceberglog").option("path", root).load()
    assert df.count() == 8


def test_writer_schema_mapping_roundtrip(spark, tmp_path):
    root = str(tmp_path / "iw3")
    w = IcebergWriter(spark, root)
    src = spark.range(3).select(
        F.col("id").alias("k"),
        F.lit("x").alias("s"),
        F.lit(1.5).alias("d"),
    )
    w.create(src)
    sch = IcebergTable(root).schema()
    assert [(f.name, f.dataType.simpleString()) for f in sch.fields] == [
        ("k", "bigint"),
        ("s", "string"),
        ("d", "double"),
    ]


# ---------------------------------------------------------------------
# Property-based: generic datum codec roundtrips arbitrary values
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_names = _resolve_names(NESTED_SCHEMA)

_inner = st.fixed_dictionaries(
    {
        "a": st.integers(min_value=-(2**62), max_value=2**62),
        "b": st.none() | st.floats(allow_nan=False, allow_infinity=False, width=64),
    }
)
_row = st.fixed_dictionaries(
    {
        "tag": st.text(max_size=12),
        "inner": _inner,
        "nums": st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        "attrs": st.dictionaries(st.text(max_size=6), st.text(max_size=6), max_size=4),
        "again": st.none() | _inner,
        "color": st.sampled_from(["R", "G", "B"]),
        "fix": st.binary(min_size=4, max_size=4),
    }
)


@settings(max_examples=60, deadline=None)
@given(_row)
def test_datum_codec_roundtrips_arbitrary_values(row):
    buf = io.BytesIO()
    write_datum(buf, NESTED_SCHEMA, row, _names)
    buf.seek(0)
    assert read_datum(buf, NESTED_SCHEMA, _names) == row


@settings(max_examples=20, deadline=None)
@given(st.lists(_row, max_size=5))
def test_ocf_generic_roundtrips_row_lists(tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("avroprop") / "t.avro")
    write_ocf_generic(path, NESTED_SCHEMA, rows)
    assert list(read_ocf_generic(path)) == rows


def test_writer_concurrent_appends_rebase(spark, tmp_path):
    """Two writers racing appends: the metadata-version O_EXCL claim
    serializes them; the loser rebases onto the newer snapshot and
    both appends survive (no lost update, linear snapshot history)."""
    import threading

    root = str(tmp_path / "iw_race")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def worker(base: int) -> None:
        try:
            handle = IcebergWriter(spark, root)
            barrier.wait()
            handle.append(
                spark.range(base, base + 3).select(F.col("id").alias("k"))
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(b,)) for b in (100, 200)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    rows = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert rows == list(range(5)) + [100, 101, 102, 200, 201, 202]
    t = IcebergTable(root)
    snap_ids = sorted(s["snapshot-id"] for s in t.snapshots())
    assert snap_ids == [1, 2, 3]


# -- row-level delete / overwrite (round 6) ---------------------------

from plankton_spark.sources.iceberg_meta import IcebergConcurrentDelete  # noqa: E402


def test_writer_delete_where_roundtrip(spark, tmp_path):
    """DELETE rewrites only hit files; survivors stay; old snapshots
    still read their full file set (time travel)."""
    root = str(tmp_path / "iw_del")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 10).coalesce(1).select(F.col("id").alias("k")))
    w.append(spark.range(100, 105).coalesce(1).select(F.col("id").alias("k")))
    snap = w.delete_where(F.col("k") < 4)
    rows = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert rows == list(range(4, 10)) + list(range(100, 105))
    # time travel to the pre-delete snapshot still sees every row
    before = sorted(r.k for r in read_iceberg(spark, root, snapshot_id=2).collect())
    assert before == list(range(10)) + list(range(100, 105))
    # the untouched append file was carried forward, not rewritten
    t = IcebergTable(root)
    files_now = {f.rsplit("/", 1)[-1] for f in t.data_files(snap)}
    files_before = {f.rsplit("/", 1)[-1] for f in t.data_files(2)}
    assert files_now & files_before, "untouched data file should survive"


def test_writer_delete_retains_null_predicate_rows(spark, tmp_path):
    from pyspark.sql import Row

    root = str(tmp_path / "iw_delnull")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame(
            [Row(k=1, score=10), Row(k=2, score=None), Row(k=3, score=99)]
        )
    )
    w.delete_where(F.col("score") > 50)
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [1, 2], f"NULL-predicate row was dropped: {got}"


def test_writer_overwrite_replaces_and_time_travels(spark, tmp_path):
    root = str(tmp_path / "iw_ow")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    w.overwrite(spark.range(50, 53).select(F.col("id").alias("k")))
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == [50, 51, 52]
    assert sorted(r.k for r in read_iceberg(spark, root, snapshot_id=1).collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_writer_concurrent_deletes_fail_not_clobber(spark, tmp_path):
    """Two writers deleting overlapping rows from the same file: the
    loser must raise IcebergConcurrentDelete (its target file was
    rewritten), never commit stale tombstones — mirrors
    test_concurrent_delete_of_same_files_fails_not_clobbers."""
    import threading

    root = str(tmp_path / "iw_delrace")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 20).coalesce(1).select(F.col("id").alias("k")))
    barrier = threading.Barrier(2)
    outcomes: list[str] = []
    lock = threading.Lock()

    def worker(hi: int) -> None:
        handle = IcebergWriter(spark, root)
        barrier.wait()
        try:
            handle.delete_where(F.col("k") < hi)
            with lock:
                outcomes.append("ok")
        except IcebergConcurrentDelete:
            with lock:
                outcomes.append("conflict")

    threads = [threading.Thread(target=worker, args=(hi,)) for hi in (5, 8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert sorted(outcomes) in (["conflict", "ok"], ["ok", "ok"]), outcomes
    rows = sorted(r.k for r in read_iceberg(spark, root).collect())
    if outcomes == ["ok", "ok"]:
        assert rows == list(range(8, 20))
    else:
        assert rows in (list(range(5, 20)), list(range(8, 20))), rows
    assert len(rows) == len(set(rows))


def test_writer_append_during_delete_rebases(spark, tmp_path):
    """An APPEND landing between a DELETE's validation and its commit:
    the delete rebases (its target files are still live) and both
    commits survive."""
    root = str(tmp_path / "iw_adrace")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 10).coalesce(1).select(F.col("id").alias("k")))
    orig = w._commit_metadata
    injected = {"done": False}

    def racing_commit(version, metadata):
        if not injected["done"]:
            injected["done"] = True
            IcebergWriter(spark, root).append(
                spark.range(100, 103).select(F.col("id").alias("k"))
            )
        return orig(version, metadata)

    w._commit_metadata = racing_commit
    w.delete_where(F.col("k") < 4)
    w._commit_metadata = orig
    rows = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert rows == list(range(4, 10)) + [100, 101, 102]


# -- merge / optimize / schema evolution / streaming (round 6) --------


def test_writer_merge_upserts_and_prunes(spark, tmp_path):
    """MERGE parity with DeltaLogWriter.merge: matching keys update,
    new keys insert, and files whose footer key range cannot overlap
    the source's are carried forward untouched."""
    root = str(tmp_path / "iw_mrg")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(0, 10)
        .coalesce(1)
        .select(F.col("id").alias("k"), F.lit("old").alias("tag"))
    )
    w.append(
        spark.range(1000, 1010)
        .coalesce(1)
        .select(F.col("id").alias("k"), F.lit("old").alias("tag"))
    )
    before = set(IcebergTable(root).data_files(None))
    src = spark.createDataFrame(
        [(1003, "new"), (2000, "new")], "k long, tag string"
    )
    w.merge(src, "k")
    got = {(r.k, r.tag) for r in read_iceberg(spark, root).collect()}
    want = {(k, "old") for k in range(10)}
    want |= {(k, "old") for k in range(1000, 1010) if k != 1003}
    want |= {(1003, "new"), (2000, "new")}
    assert got == want
    after = set(IcebergTable(root).data_files(None))
    assert len(before & after) == 1  # only the [0,10) file survived untouched


def test_writer_merge_race_aborts_or_serializes(spark, tmp_path):
    import threading

    root = str(tmp_path / "iw_mrgrace")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(0, 20)
        .coalesce(1)
        .select(F.col("id").alias("k"), F.lit("old").alias("tag"))
    )
    barrier = threading.Barrier(2)
    outcomes: list[str] = []
    lock = threading.Lock()

    def worker(tag: str, keys: list[int]) -> None:
        h = IcebergWriter(spark, root)
        src = spark.createDataFrame([(k, tag) for k in keys], "k long, tag string")
        barrier.wait()
        try:
            h.merge(src, "k")
            with lock:
                outcomes.append("ok")
        except IcebergConcurrentDelete:
            with lock:
                outcomes.append("conflict")

    threads = [
        threading.Thread(target=worker, args=(t, ks))
        for t, ks in (("a", [1, 2]), ("b", [3, 4]))
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert sorted(outcomes) in (["conflict", "ok"], ["ok", "ok"]), outcomes
    rows = sorted((r.k, r.tag) for r in read_iceberg(spark, root).collect())
    assert [k for k, _ in rows] == list(range(20))
    n_new = sum(1 for _, t in rows if t in ("a", "b"))
    assert n_new == (4 if outcomes == ["ok", "ok"] else 2)


def test_writer_optimize_compacts_preserving_content(spark, tmp_path):
    root = str(tmp_path / "iw_opt")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 6).repartition(3).select(F.col("id").alias("k")))
    w.append(spark.range(6, 9).repartition(2).select(F.col("id").alias("k")))
    t0 = IcebergTable(root)
    pre_snap = t0.metadata["current-snapshot-id"]
    assert len(t0.data_files(None)) > 1
    w.optimize(num_files=1)
    t1 = IcebergTable(root)
    assert len(t1.data_files(None)) == 1
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == list(range(9))
    # time travel: the pre-compaction snapshot still reads its files
    assert sorted(
        r.k for r in read_iceberg(spark, root, snapshot_id=pre_snap).collect()
    ) == list(range(9))


def test_writer_schema_evolution_add_column(spark, tmp_path):
    from pyspark.sql import Row

    root = str(tmp_path / "iw_evo")
    w = IcebergWriter(spark, root)
    w.create(spark.createDataFrame([Row(k=1), Row(k=2)]))
    with pytest.raises(ValueError, match="merge_schema"):
        w.append(spark.createDataFrame([Row(k=3, tag="x")]))
    w.append(spark.createDataFrame([Row(k=3, tag="x")]), merge_schema=True)
    got = sorted(
        (r.k, r.tag) for r in read_iceberg(spark, root).collect()
    )
    assert got == [(1, None), (2, None), (3, "x")]
    md = IcebergTable(root).metadata
    assert md["current-schema-id"] == 1
    assert len(md["schemas"]) == 2
    # new field got a fresh id continuing last-column-id
    new_field = md["schemas"][1]["fields"][-1]
    assert new_field["name"] == "tag" and new_field["id"] == 2
    # dropping/retyping rejected
    with pytest.raises(ValueError, match="missing"):
        w.append(spark.createDataFrame([Row(k=9)]))
    # DSv2 wrapper null-fills pre-evolution files too
    register(spark)
    via = (
        spark.read.format("iceberglog").option("path", root).load()
    )
    assert sorted((r.k, r.tag) for r in via.collect()) == got


def test_iceberg_streaming_source(spark, tmp_path):
    """format("iceberglog") readStream: append snapshots stream as
    micro-batches from a checkpointed snapshot-index offset; a
    delete/rewrite snapshot refuses without ignoreChanges."""
    root = str(tmp_path / "iw_stream")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 3).select(F.col("id").alias("k")))
    w.append(spark.range(10, 13).select(F.col("id").alias("k")))
    register(spark)
    seen: dict[int, list[int]] = {}

    def grab(bdf, bid):
        seen.setdefault(bid, []).extend(r.k for r in bdf.collect())

    ckpt = str(tmp_path / "iw_stream_ckpt")

    def run_once():
        q = (
            spark.readStream.format("iceberglog")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(grab)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(v for vs in seen.values() for v in vs) == [0, 1, 2, 10, 11, 12]
    seen.clear()
    w.append(spark.range(100, 102).select(F.col("id").alias("k")))
    run_once()
    assert sorted(v for vs in seen.values() for v in vs) == [100, 101]
    # a row-level delete introduces DELETED entries → refuse to stream
    w.delete_where(F.col("k") == 0)
    with pytest.raises(Exception):
        run_once()


def test_writer_vacuum_removes_only_orphans(spark, tmp_path):
    root = str(tmp_path / "iw_vac")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    w.delete_where(F.col("k") < 2)
    import os as _os

    orphan = _os.path.join(root, "data", "snap0-orphan.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")
    _os.makedirs(_os.path.join(root, "_stage-crashed"), exist_ok=True)
    # default grace window protects in-flight writers' fresh files
    assert w.vacuum() == []
    removed = w.vacuum(grace_seconds=0.0)
    assert "data/snap0-orphan.parquet" in removed
    assert "_stage-crashed" in removed
    # historic snapshot (pre-delete) still reads; live state intact
    first = IcebergTable(root).snapshots()[0]["snapshot-id"]
    assert sorted(
        r.k for r in read_iceberg(spark, root, snapshot_id=first).collect()
    ) == list(range(5))
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == [2, 3, 4]


def test_merge_timestamp_key_equals_reference(spark, tmp_path):
    """Iceberg MERGE with a timestamp key: pruning compares via the
    ISO-8601 stat encoding; result must equal the reference
    (base anti-join source) UNION source semantics."""
    root = str(tmp_path / "iw_mts")
    w = IcebergWriter(spark, root)
    base = spark.sql(
        "SELECT timestampadd(HOUR, id, TIMESTAMP'2024-01-01 00:00:00') AS k,"
        " 'old' AS tag FROM range(10)"
    )
    src = spark.sql(
        "SELECT timestampadd(HOUR, id, TIMESTAMP'2024-01-01 05:00:00') AS k,"
        " 'new' AS tag FROM range(10)"
    )
    w.create(base.coalesce(1))
    w.merge(src, "k")
    got = {(r.k, r.tag) for r in read_iceberg(spark, root).collect()}
    want = {
        (r.k, r.tag)
        for r in base.join(src, "k", "left_anti").unionByName(src).collect()
    }
    assert got == want


def test_overwrite_replaces_schema(spark, tmp_path):
    """Iceberg overwrite with a different schema makes a new schema-id
    current in the same commit (overwriteSchema semantics); same-name
    fields keep their ids, new names get fresh ones."""
    from pyspark.sql import Row

    root = str(tmp_path / "iw_ovr_schema")
    w = IcebergWriter(spark, root)
    w.create(spark.createDataFrame([Row(k=1)]))
    w.overwrite(spark.createDataFrame([Row(k=2, tag="x")]))
    got = read_iceberg(spark, root).collect()
    assert [(r.k, r.tag) for r in got] == [(2, "x")]
    md = IcebergTable(root).metadata
    assert md["current-schema-id"] == 1
    fields = {f["name"]: f["id"] for f in md["schemas"][1]["fields"]}
    assert fields == {"k": 1, "tag": 2}  # k keeps id 1, tag gets a fresh id


def test_overwrite_rejects_retype(spark, tmp_path):
    """Retyping a column via overwrite is rejected: historic snapshots
    read with the CURRENT schema (data files carry all columns), so a
    retype would break time travel on pre-overwrite parquet."""
    from pyspark.sql import Row

    root = str(tmp_path / "iw_retype")
    w = IcebergWriter(spark, root)
    w.create(spark.createDataFrame([Row(k=1)]))
    with pytest.raises(ValueError, match="retype"):
        w.overwrite(spark.createDataFrame([Row(k="now-a-string")]))
    # table unchanged
    assert [(r.k,) for r in read_iceberg(spark, root).collect()] == [(1,)]


def test_read_iceberg_changes_feed(spark, tmp_path):
    from plankton_spark.sources.iceberg_meta import read_iceberg_changes

    root = str(tmp_path / "icdf")
    w = IcebergWriter(spark, root)
    s1 = w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    s2 = w.append(spark.range(5, 8).select(F.col("id").alias("k")))
    s3 = w.delete_where(F.col("k") < 2)
    got = sorted(
        (r.k, r._change_type)
        for r in read_iceberg_changes(spark, root, s1, s3).collect()
    )
    assert got == [(0, "delete"), (1, "delete"), (5, "insert"), (6, "insert"), (7, "insert")]
    s4 = w.optimize(num_files=1)
    assert read_iceberg_changes(spark, root, s3, s4).count() == 0


# -- identity-partitioned writes (round 6) ----------------------------


def test_partitioned_create_append_roundtrip(spark, tmp_path):
    """Identity partition spec: hive layout under data/, typed values
    in manifest partition records (spec column projection — files omit
    the source columns), reads re-attach them; appends inherit."""
    root = str(tmp_path / "ip")
    w = IcebergWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i)) for i in range(10)],
        "k long, status string, v double",
    )
    w.create(df, partition_by=["status"])
    w.append(
        spark.createDataFrame([(100, "C", 1.0)], "k long, status string, v double")
    )
    t = IcebergTable(root)
    assert t.partition_fields() == ["status"]
    got = sorted((r.k, r.status, r.v) for r in read_iceberg(spark, root).collect())
    assert got == [(i, "AB"[i % 2], float(i)) for i in range(10)] + [(100, "C", 1.0)]
    # manifest entries carry typed partition values; files live in hive dirs
    entries = t.data_entries(None)
    assert {pv["status"] for _, pv in entries} == {"A", "B", "C"}
    assert all("status=" in p for p, _ in entries)
    # spec metadata is well-formed
    spec = t.metadata["partition-spec"]
    assert spec[0]["transform"] == "identity" and spec[0]["field-id"] == 1000
    # DSv2 wrapper re-attaches partition values too
    register(spark)
    via = spark.read.format("iceberglog").option("path", root).load()
    assert sorted((r.k, r.status) for r in via.collect()) == [
        (k, s) for k, s, _ in got
    ]


def test_partitioned_delete_on_partition_column(spark, tmp_path):
    root = str(tmp_path / "ip_del")
    w = IcebergWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "ABC"[i % 3]) for i in range(12)], "k long, status string"
    )
    w.create(df, partition_by=["status"])
    w.delete_where(F.col("status") == "B")
    got = sorted((r.k, r.status) for r in read_iceberg(spark, root).collect())
    assert got == sorted(
        (i, "ABC"[i % 3]) for i in range(12) if "ABC"[i % 3] != "B"
    )
    # mixed predicate
    w.delete_where((F.col("status") == "A") & (F.col("k") >= 6))
    got = sorted((r.k, r.status) for r in read_iceberg(spark, root).collect())
    assert got == sorted(
        (i, s)
        for i in range(12)
        for s in ["ABC"[i % 3]]
        if s == "C" or (s == "A" and i < 6)
    )


def test_partitioned_merge_prunes_by_partition_value(spark, tmp_path):
    root = str(tmp_path / "ip_mrg")
    w = IcebergWriter(spark, root)
    base = spark.createDataFrame(
        [(i, i % 3, "old") for i in range(12)], "k long, bucket int, tag string"
    )
    w.create(base, partition_by=["bucket"])
    before = {p for p, pv in IcebergTable(root).data_entries(None) if pv["bucket"] == 2}
    src = spark.createDataFrame(
        [(0, 0, "new"), (99, 1, "new")], "k long, bucket int, tag string"
    )
    w.merge(src, "bucket")
    got = {(r.k, r.bucket, r.tag) for r in read_iceberg(spark, root).collect()}
    want = {(i, 2, "old") for i in range(12) if i % 3 == 2}
    want |= {(0, 0, "new"), (99, 1, "new")}
    assert got == want
    after = {p for p, pv in IcebergTable(root).data_entries(None) if pv["bucket"] == 2}
    assert before == after  # non-overlapping partition untouched
    with pytest.raises(ValueError, match="partition"):
        w.merge(spark.createDataFrame([(1, "x")], "k long, tag string"), "k")


def test_partitioned_optimize_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "ip_opt")
    w = IcebergWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "AB"[i % 2]) for i in range(20)], "k long, status string"
    ).repartition(4)
    s1 = w.create(df, partition_by=["status"])
    w.append(
        spark.createDataFrame(
            [(i, "AB"[i % 2]) for i in range(20, 40)], "k long, status string"
        ).repartition(4)
    )
    assert len(IcebergTable(root).data_entries(None)) > 2
    w.optimize(num_files=1)
    assert len(IcebergTable(root).data_entries(None)) == 2  # one per partition
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == list(range(40))
    assert sorted(
        r.k for r in read_iceberg(spark, root, snapshot_id=s1).collect()
    ) == list(range(20))


def test_partitioned_null_value_and_unsupported_type(spark, tmp_path):
    root = str(tmp_path / "ip_null")
    w = IcebergWriter(spark, root)
    df = spark.createDataFrame([(1, "A"), (2, None)], "k long, status string")
    w.create(df, partition_by=["status"])
    got = sorted(
        (r.k, r.status) for r in read_iceberg(spark, root).collect()
    )
    assert got == [(1, "A"), (2, None)]
    # unsupported partition key types fail loudly at create
    w2 = IcebergWriter(spark, str(tmp_path / "ip_bad"))
    tsdf = spark.sql("SELECT 1 AS k, TIMESTAMP'2024-01-01' AS ts")
    with pytest.raises(ValueError, match="unsupported partition column type"):
        w2.create(tsdf, partition_by=["ts"])


def test_partitioned_streaming_source(spark, tmp_path):
    root = str(tmp_path / "ip_stream")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame([(0, "A"), (1, "B")], "k long, status string"),
        partition_by=["status"],
    )
    w.append(spark.createDataFrame([(2, "A")], "k long, status string"))
    register(spark)
    seen: list[tuple] = []

    def grab(bdf, bid):
        seen.extend((r.k, r.status) for r in bdf.collect())

    q = (
        spark.readStream.format("iceberglog")
        .option("path", root)
        .load()
        .writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == [(0, "A"), (1, "B"), (2, "A")]


def test_partitioned_write_rejects_empty_string_value(spark, tmp_path):
    w = IcebergWriter(spark, str(tmp_path / "iempty"))
    df = spark.createDataFrame([(1, "A"), (2, "")], "k long, status string")
    with pytest.raises(ValueError, match="empty-string"):
        w.create(df, partition_by=["status"])


def test_external_nonidentity_spec_still_reads(spark, tmp_path):
    """An external table with a non-identity partition spec (its data
    files carry all source columns) must stay readable: the tolerant
    partition_fields returns [] and the plain multi-path scan runs;
    only WRITES raise."""
    root = str(tmp_path / "ibucket")
    w = IcebergWriter(spark, root)
    w.create(spark.createDataFrame([(1, "A"), (2, "B")], "k long, status string"))
    # mutate the metadata into a bucket-partitioned spec (external shape)
    import json as _json
    import os as _os

    meta = _os.path.join(root, "metadata")
    v = max(
        int(f[1:].split(".")[0])
        for f in _os.listdir(meta)
        if f.startswith("v") and f.endswith(".metadata.json")
    )
    path = _os.path.join(meta, f"v{v}.metadata.json")
    md = _json.load(open(path))
    md["partition-spec"] = [
        # void is the spec transform the writer (rightly) never stages
        # (bucket/truncate/hour/month/year graduated in r7)
        {"name": "k_void", "transform": "void", "source-id": 1, "field-id": 1000}
    ]
    _json.dump(md, open(path, "w"))
    got = sorted((r.k, r.status) for r in read_iceberg(spark, root).collect())
    assert got == [(1, "A"), (2, "B")]
    with pytest.raises(ValueError, match="unsupported partition transform"):
        IcebergWriter(spark, root).append(
            spark.createDataFrame([(3, "C")], "k long, status string")
        )


def test_vacuum_removes_orphans_in_partition_subdirs(spark, tmp_path):
    root = str(tmp_path / "ivac_part")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame([(1, "A"), (2, "B")], "k long, status string"),
        partition_by=["status"],
    )
    import os as _os

    orphan = _os.path.join(root, "data", "status=A", "snap0-orphan.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")
    removed = w.vacuum(grace_seconds=0.0)
    assert _os.path.join("data", "status=A", "snap0-orphan.parquet") in removed
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == [1, 2]


def test_partitioned_special_char_values_roundtrip(spark, tmp_path):
    weird = ["a=b", "a/b", "a b", "ünïcode", "a%20b"]
    rows = [(i, w) for i, w in enumerate(weird)]
    df = spark.createDataFrame(rows, "k long, status string")
    root = str(tmp_path / "iweird")
    IcebergWriter(spark, root).create(df, partition_by=["status"])
    got = sorted((r.k, r.status) for r in read_iceberg(spark, root).collect())
    assert got == sorted(rows)
    # typed manifest values carry the decoded strings
    vals = {pv["status"] for _, pv in IcebergTable(root).data_entries(None)}
    assert vals == set(weird)


# -- day() partition transform (round 6) ------------------------------


def test_day_transform_roundtrip_and_metadata_prune(spark, tmp_path):
    """day(ts): files partition by days-since-epoch derived ints
    while KEEPING the raw timestamp column — the idiomatic Iceberg
    timestamp partitioning. Pruning a date range is pure manifest
    metadata (typed ints), no file IO."""
    import datetime

    root = str(tmp_path / "iday")
    w = IcebergWriter(spark, root)
    df = spark.sql(
        "SELECT id AS k, timestampadd(HOUR, CAST(id*7 AS INT),"
        " TIMESTAMP'2024-01-01 00:00:00') AS ts FROM range(20)"
    )
    w.create(df, partition_by=["day(ts)"])
    t = IcebergTable(root)
    spec = t.metadata["partition-spec"]
    assert spec[0]["name"] == "ts_day" and spec[0]["transform"] == "day"
    # files carry the raw ts column (no re-attachment needed)
    assert t.partition_fields() == []
    got = sorted((r.k, r.ts) for r in read_iceberg(spark, root).collect())
    want = sorted((r.k, r.ts) for r in df.collect())
    assert got == want
    # manifest partition values are days-since-epoch ints
    epoch = datetime.date(1970, 1, 1)
    days = {pv["ts_day"] for _, pv in t.data_entries(None)}
    d0 = (datetime.date(2024, 1, 1) - epoch).days
    assert min(days) == d0 and max(days) > d0
    # metadata-only prune: only day-0 files selected
    day0 = [(p, pv) for p, pv in t.data_entries(None) if pv["ts_day"] == d0]
    n_day0 = sum(
        1 for r in df.collect() if r.ts.date() == datetime.date(2024, 1, 1)
    )
    from plankton_spark.sources.iceberg_meta import _assemble_iceberg

    pruned = _assemble_iceberg(spark, t.schema(), [], day0)
    assert pruned.count() == n_day0
    # appends inherit the transform
    w.append(
        spark.sql("SELECT CAST(100 AS BIGINT) AS k, TIMESTAMP'2024-06-01 12:00:00' AS ts")
    )
    assert read_iceberg(spark, root).count() == 21


def test_day_transform_rewrites_and_merge(spark, tmp_path):
    root = str(tmp_path / "iday_rw")
    w = IcebergWriter(spark, root)
    df = spark.sql(
        "SELECT id AS k, timestampadd(DAY, CAST(id % 3 AS INT),"
        " TIMESTAMP'2024-01-01 00:00:00') AS ts, 'old' AS tag FROM range(9)"
    )
    w.create(df, partition_by=["day(ts)"])
    # delete by a predicate on the raw ts (present in files)
    w.delete_where(F.col("ts") == "2024-01-02 00:00:00")
    assert read_iceberg(spark, root).count() == 6
    # merge on k: footer-stats pruning path (k lives in the files)
    src = spark.sql(
        "SELECT CAST(0 AS BIGINT) AS k, TIMESTAMP'2024-01-01 00:00:00' AS ts, 'new' AS tag"
    )
    w.merge(src, "k")
    got = {(r.k, r.tag) for r in read_iceberg(spark, root).collect()}
    assert (0, "new") in got and (0, "old") not in got
    assert len(got) == 6
    # compaction keeps the layout and the content
    w.optimize(num_files=1)
    assert read_iceberg(spark, root).count() == 6
    assert {pv["ts_day"] for _, pv in IcebergTable(root).data_entries(None)} == {
        19723,
        19725,
    }


def test_day_transform_requires_temporal_source(spark, tmp_path):
    w = IcebergWriter(spark, str(tmp_path / "iday_bad"))
    with pytest.raises(ValueError, match="day\\(\\) needs a date/timestamp"):
        w.create(
            spark.createDataFrame([(1, "x")], "k long, s string"),
            partition_by=["day(s)"],
        )


def test_day_transform_is_utc_not_session_tz(spark, tmp_path):
    """day() of a timestamptz is defined in UTC by the spec: an
    instant at 2024-01-11 04:00 UTC must land in day 19733 even when
    the session timezone would call it Jan 10 — external readers
    compute the UTC day, and a session-tz derivation would make their
    metadata pruning skip the wrong files."""
    instant = 1704945600  # 2024-01-11 04:00:00 UTC
    utc_day = instant // 86400
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql(
            f"SELECT CAST(1 AS BIGINT) AS k, timestamp_seconds({instant}) AS ts"
        )
        root = str(tmp_path / "iday_tz")
        IcebergWriter(spark, root).create(df, partition_by=["day(ts)"])
        days = {pv["ts_day"] for _, pv in IcebergTable(root).data_entries(None)}
        assert days == {utc_day}, days
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_partition_by_rejects_unknown_transform_and_name_clash(spark, tmp_path):
    w = IcebergWriter(spark, str(tmp_path / "ibadspec"))
    df = spark.sql("SELECT CAST(1 AS BIGINT) AS k, TIMESTAMP'2024-01-01' AS ts")
    with pytest.raises(ValueError, match="unsupported partition transform"):
        w.create(df, partition_by=["void(ts)"])
    clash = df.withColumn("ts_day", F.lit(7))
    with pytest.raises(ValueError, match="collide"):
        IcebergWriter(spark, str(tmp_path / "iclash")).create(
            clash, partition_by=["day(ts)"]
        )


# ---------------------------------------------------------------------
# bucket / hour / truncate transforms (r6 verdict #3 + #8)
# ---------------------------------------------------------------------

from plankton_spark.sources.iceberg_meta import (  # noqa: E402
    _assemble_iceberg,
    iceberg_bucket,
    murmur3_32,
)
from pyspark.sql import types as T  # noqa: E402


def _signed32(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


def test_murmur3_matches_spec_vectors():
    """The Iceberg spec's Appendix-B hash requirement test vectors:
    wrong murmur3 = silently incompatible bucket layouts across
    engines."""
    import datetime

    assert _signed32(murmur3_32((34).to_bytes(8, "little", signed=True))) == 2017239379
    assert _signed32(murmur3_32("iceberg".encode())) == 1210000089
    d = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert _signed32(murmur3_32(d.to_bytes(8, "little", signed=True))) == -653330422
    micros = int(
        datetime.datetime(
            2017, 11, 16, 22, 31, 8, tzinfo=datetime.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert _signed32(murmur3_32(micros.to_bytes(8, "little", signed=True))) == -2047944441
    # int and long hash identically (both encoded as 8-byte LE long)
    assert iceberg_bucket(34, T.IntegerType(), 16) == iceberg_bucket(
        34, T.LongType(), 16
    )


def test_bucket_transform_roundtrip_and_prune(spark, tmp_path):
    """bucket(8, k): manifests carry spec murmur3 bucket ids; a key
    lookup prunes to ONE bucket's files from metadata alone, and the
    staged bucket of every row matches the driver-side scalar."""
    root = str(tmp_path / "ibucket")
    w = IcebergWriter(spark, root)
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    w.create(df, partition_by=["bucket(8, k)"])
    t = IcebergTable(root)
    spec = t.partition_spec()
    assert spec[0]["name"] == "k_bucket" and spec[0]["transform"] == "bucket[8]"
    # full roundtrip, source column kept in files
    got = sorted((r.k, r.v) for r in read_iceberg(spark, root).collect())
    assert got == [(i, 2 * i) for i in range(100)]
    # every file's manifest bucket id matches recomputing from content
    for p, pv in t.data_entries(None):
        ks = [r.k for r in spark.read.parquet(p).collect()]
        assert {iceberg_bucket(k, T.LongType(), 8) for k in ks} == {pv["k_bucket"]}
    # metadata-only prune for an equality predicate
    key = 42
    b = iceberg_bucket(key, T.LongType(), 8)
    entries = [(p, pv) for p, pv in t.data_entries(None) if pv["k_bucket"] == b]
    assert 0 < len(entries) < len(t.data_entries(None))
    pruned = _assemble_iceberg(spark, t.schema(), [], entries).where(
        F.col("k") == key
    )
    assert [(r.k, r.v) for r in pruned.collect()] == [(42, 84)]
    # appends inherit the transform
    w.append(spark.sql("SELECT CAST(1000 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v"))
    assert read_iceberg(spark, root).count() == 101


def test_bucket_transform_string_source(spark, tmp_path):
    root = str(tmp_path / "ibucket_s")
    df = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(40)], "k long, s string"
    )
    IcebergWriter(spark, root).create(df, partition_by=["bucket(4, s)"])
    t = IcebergTable(root)
    for p, pv in t.data_entries(None):
        ss = [r.s for r in spark.read.parquet(p).collect()]
        assert {iceberg_bucket(s, T.StringType(), 4) for s in ss} == {pv["s_bucket"]}
    assert read_iceberg(spark, root).count() == 40


def test_bucket_transform_null_source_lands_null_partition(spark, tmp_path):
    root = str(tmp_path / "ibucket_n")
    df = spark.createDataFrame([(1, 10), (2, None)], "k long, v long")
    IcebergWriter(spark, root).create(df, partition_by=["bucket(4, v)"])
    pvs = {pv["v_bucket"] for _, pv in IcebergTable(root).data_entries(None)}
    assert None in pvs and len(pvs) == 2
    got = sorted((r.k, r.v) for r in read_iceberg(spark, root).collect())
    assert got == [(1, 10), (2, None)]


def test_hour_transform_roundtrip_prune_and_utc(spark, tmp_path):
    """hour(ts): hours-since-epoch ints in manifests, UTC-defined for
    timestamptz regardless of session tz."""
    root = str(tmp_path / "ihour")
    instant = 1704945600  # 2024-01-11 04:00:00 UTC
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql(
            f"SELECT id AS k, timestamp_seconds({instant} + id*1800) AS ts"
            " FROM range(8)"
        )
        IcebergWriter(spark, root).create(df, partition_by=["hour(ts)"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    t = IcebergTable(root)
    assert t.partition_spec()[0]["transform"] == "hour"
    hours = {pv["ts_hour"] for _, pv in t.data_entries(None)}
    assert hours == {instant // 3600 + i for i in range(4)}, hours
    got = read_iceberg(spark, root)
    assert got.count() == 8
    # prune to one hour = exactly two half-hour rows
    h0 = instant // 3600
    one = [(p, pv) for p, pv in t.data_entries(None) if pv["ts_hour"] == h0]
    assert _assemble_iceberg(spark, t.schema(), [], one).count() == 2


def test_hour_transform_requires_timestamp_source(spark, tmp_path):
    w = IcebergWriter(spark, str(tmp_path / "ihour_bad"))
    with pytest.raises(ValueError, match="hour\\(\\) needs a timestamp"):
        w.create(
            spark.createDataFrame([(1,)], "k long").select(
                "k", F.lit("2024-01-01").cast("date").alias("d")
            ),
            partition_by=["hour(d)"],
        )


def test_truncate_transform_string_and_int(spark, tmp_path):
    """truncate[W]: strings keep their first W chars; ints round
    toward -inf in W-sized steps (spec floored modulo)."""
    root = str(tmp_path / "itrunc_s")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alabama"), (3, "beta"), (4, "al")],
        "k long, s string",
    )
    IcebergWriter(spark, root).create(df, partition_by=["truncate(2, s)"])
    t = IcebergTable(root)
    assert t.partition_spec()[0]["transform"] == "truncate[2]"
    pvs = {pv["s_trunc"] for _, pv in t.data_entries(None)}
    assert pvs == {"al", "be"}
    got = sorted((r.k, r.s) for r in read_iceberg(spark, root).collect())
    assert got == [(1, "alpha"), (2, "alabama"), (3, "beta"), (4, "al")]
    # prune on the truncated prefix of an equality literal
    one = [(p, pv) for p, pv in t.data_entries(None) if pv["s_trunc"] == "al"]
    pruned = _assemble_iceberg(spark, t.schema(), [], one)
    assert sorted(r.k for r in pruned.collect()) == [1, 2, 4]

    root2 = str(tmp_path / "itrunc_i")
    di = spark.createDataFrame([(i, v) for i, v in enumerate([-7, -1, 0, 9, 10])],
                               "k long, v long")
    IcebergWriter(spark, root2).create(di, partition_by=["truncate(10, v)"])
    t2 = IcebergTable(root2)
    pvs2 = {pv["v_trunc"] for _, pv in t2.data_entries(None)}
    assert pvs2 == {-10, 0, 10}, pvs2  # floored: -7 → -10
    assert read_iceberg(spark, root2).count() == 5


def test_truncate_rejects_unsupported_source(spark, tmp_path):
    w = IcebergWriter(spark, str(tmp_path / "itrunc_bad"))
    with pytest.raises(ValueError, match="truncate\\(\\) supports"):
        w.create(
            spark.sql("SELECT CAST(1.5 AS DOUBLE) AS d"),
            partition_by=["truncate(2, d)"],
        )


# ---------------------------------------------------------------------
# ADVICE r6 fixes
# ---------------------------------------------------------------------


def test_partition_specs_only_metadata_resolves(spark, tmp_path):
    """v2-style metadata carrying ONLY partition-specs/default-spec-id
    (no legacy top-level partition-spec) must resolve the spec — NOT
    read as spec-less and NOT stage unpartitioned appends (ADVICE #2)."""
    import json as _json
    import os as _os

    root = str(tmp_path / "ispecs_only")
    w = IcebergWriter(spark, root)
    df = spark.createDataFrame([(1, "A"), (2, "B")], "k long, st string")
    w.create(df, partition_by=["st"])
    meta_dir = _os.path.join(root, "metadata")
    vs = sorted(
        f for f in _os.listdir(meta_dir) if f.endswith(".metadata.json")
    )
    p = _os.path.join(meta_dir, vs[-1])
    with open(p) as f:
        md = _json.load(f)
    del md["partition-spec"]  # leave only partition-specs + default-spec-id
    with open(p, "w") as f:
        _json.dump(md, f)
    t = IcebergTable(root)
    assert [f["name"] for f in t.partition_spec()] == ["st"]
    assert t.partition_fields() == ["st"]
    got = sorted((r.k, r.st) for r in read_iceberg(spark, root).collect())
    assert got == [(1, "A"), (2, "B")]
    # appends still stage PARTITIONED files
    w.append(spark.createDataFrame([(3, "A")], "k long, st string"))
    entries = IcebergTable(root).data_entries(None)
    assert all(pv.get("st") in ("A", "B") for _, pv in entries)
    assert read_iceberg(spark, root).count() == 3


def test_stream_offsets_keyed_on_snapshot_id(spark, tmp_path):
    """Offsets carry the last-consumed snapshot-id; resolution happens
    against the CURRENT list, and a vanished id is a hard error, not a
    silent replay/skip (ADVICE #5)."""
    from plankton_spark.sources.iceberg_meta import IcebergStreamReader

    root = str(tmp_path / "istream_off")
    w = IcebergWriter(spark, root)
    w.create(spark.range(3).select(F.col("id").alias("k")))
    w.append(spark.range(3, 5).select(F.col("id").alias("k")))
    r = IcebergStreamReader(root, ignore_changes=False)
    first = r.initialOffset()
    latest = r.latestOffset()
    assert "last_snapshot_id" in latest and latest["last_snapshot_id"] is not None
    files = r._added(first, latest)
    assert len(files) == sum(
        1 for _ in IcebergTable(root).data_files(None)
    )
    # consuming from snapshot 1 yields only the append's files
    snaps = IcebergTable(root).snapshots()
    mid = {"last_snapshot_id": snaps[0]["snapshot-id"]}
    tail = r._added(mid, latest)
    assert 0 < len(tail) < len(files)
    # legacy positional checkpoints still resolve
    assert len(r._added({"index": 1}, latest)) == len(tail)
    # a checkpointed id that no longer exists fails loudly
    with pytest.raises(ValueError, match="no longer in the metadata"):
        r._added({"last_snapshot_id": 999999}, latest)


def test_assemble_table_root_terminates_on_relative_paths(spark, tmp_path):
    """A relative entry path with no data/ segment must not spin the
    root-derivation loop forever (ADVICE #3) — abspath anchors it and
    the walk stops when dirname stops shrinking."""
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    f = tmp_path / "nodatadir" / "file.parquet"
    f.parent.mkdir()
    _pq.write_table(_pa.table({"k": _pa.array([1, 2], _pa.int64())}), str(f))
    rel = _os.path.relpath(str(f), _os.getcwd())
    assert not _os.path.isabs(rel)
    schema = T.StructType([T.StructField("k", T.LongType())])
    df = _assemble_iceberg(spark, schema, [], [(rel, {})])
    assert df.count() == 2


def test_month_year_transforms_roundtrip_and_prune(spark, tmp_path):
    """month()/year(): months/years-from-epoch ints (1970-01 = 0) in
    the manifests, UTC-defined for timestamptz; spec examples pinned
    (2017-11 -> 574, 2017 -> 47)."""
    root = str(tmp_path / "imonth")
    df = spark.sql(
        "SELECT id AS k, timestampadd(DAY, CAST(id * 20 AS INT),"
        " TIMESTAMP'2017-11-16 22:31:08') AS ts FROM range(6)"
    )
    IcebergWriter(spark, root).create(df, partition_by=["month(ts)"])
    t = IcebergTable(root)
    assert t.partition_spec()[0]["transform"] == "month"
    months = {pv["ts_month"] for _, pv in t.data_entries(None)}
    assert 574 in months and months == {574, 575, 576, 577}, months
    assert read_iceberg(spark, root).count() == 6
    # month 574 = 2017-11: only id 0 (the +20d steps land in December)
    one = [(p, pv) for p, pv in t.data_entries(None) if pv["ts_month"] == 574]
    assert _assemble_iceberg(spark, t.schema(), [], one).count() == 1
    two = [(p, pv) for p, pv in t.data_entries(None) if pv["ts_month"] == 575]
    assert _assemble_iceberg(spark, t.schema(), [], two).count() == 2

    root2 = str(tmp_path / "iyear")
    d2 = spark.sql(
        "SELECT id AS k, date_add(DATE'2017-12-30', CAST(id * 300 AS INT))"
        " AS d FROM range(4)"
    )
    IcebergWriter(spark, root2).create(d2, partition_by=["year(d)"])
    years = {pv["d_year"] for _, pv in IcebergTable(root2).data_entries(None)}
    assert years == {47, 48, 49, 50}, years  # 2017..2020
    assert read_iceberg(spark, root2).count() == 4


def test_month_transform_requires_temporal_source(spark, tmp_path):
    w = IcebergWriter(spark, str(tmp_path / "imonth_bad"))
    with pytest.raises(ValueError, match="month\\(\\) needs a date/timestamp"):
        w.create(
            spark.createDataFrame([(1, "x")], "k long, s string"),
            partition_by=["month(s)"],
        )


# ---------------------------------------------------------------------
# Field-id resolution + rename evolution (round 7)
# ---------------------------------------------------------------------


def test_staged_files_carry_field_ids(spark, tmp_path):
    import pyarrow.parquet as _pq

    root = str(tmp_path / "ifid")
    w = IcebergWriter(spark, root)
    w.create(spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("s")))
    t = IcebergTable(root)
    assert t.files_carry_field_ids()
    p = t.data_entries(None)[0][0]
    sch = _pq.read_schema(p)
    ids = {f.name: int(f.metadata[b"PARQUET:field_id"]) for f in sch}
    assert ids == {"k": 1, "s": 2}


def test_rename_column_reads_old_files_by_field_id(spark, tmp_path):
    root = str(tmp_path / "irename")
    w = IcebergWriter(spark, root)
    w.create(spark.range(3).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    w.append(spark.sql("SELECT CAST(10 AS BIGINT) AS k, CAST(20 AS BIGINT) AS v"))
    w.rename_column("v", "val")
    t = IcebergTable(root)
    assert [f.name for f in t.schema().fields] == ["k", "val"]
    # Spark path: old files (physical name 'v') resolve by field id
    got = sorted((r.k, r.val) for r in read_iceberg(spark, root).collect())
    assert got == [(0, 0), (1, 2), (2, 4), (10, 20)]
    # DSv2 wrapper path: pyarrow field-id fallback
    register(spark)
    df = spark.read.format("iceberglog").option("path", root).load()
    got2 = sorted((r.k, r.val) for r in df.collect())
    assert got2 == got
    # appends after the rename stage under the NEW name, same id
    w.append(spark.sql("SELECT CAST(30 AS BIGINT) AS k, CAST(60 AS BIGINT) AS val"))
    assert sorted(r.val for r in read_iceberg(spark, root).collect()) == [
        0, 2, 4, 20, 60,
    ]
    # time travel BEFORE the rename still reads (ids stable)
    v1 = read_iceberg(spark, root, snapshot_id=1)
    assert sorted(r.val for r in v1.collect()) == [0, 2, 4]


def test_rename_refuses_idless_files(spark, tmp_path):
    root = author_iceberg_orders(spark, SF0001, name="irename_noid")
    w = IcebergWriter(spark, root)
    with pytest.raises(ValueError, match="no\\s+parquet field ids|carries no"):
        w.rename_column("o_orderstatus", "status")


def test_rename_refuses_partition_source_and_bad_names(spark, tmp_path):
    root = str(tmp_path / "irename_part")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame([(1, "A")], "k long, st string"),
        partition_by=["st"],
    )
    with pytest.raises(ValueError, match="partition"):
        w.rename_column("st", "status")
    with pytest.raises(ValueError, match="no column"):
        w.rename_column("zz", "yy")
    with pytest.raises(ValueError, match="exists"):
        w.rename_column("k", "st")


def test_add_column_evolution_composes_with_field_ids(spark, tmp_path):
    """Old files miss the new column's field id entirely — the read
    must null-fill, not error, on both read paths."""
    root = str(tmp_path / "ifid_evo")
    w = IcebergWriter(spark, root)
    w.create(spark.range(2).select(F.col("id").alias("k")))
    w.append(
        spark.sql("SELECT CAST(5 AS BIGINT) AS k, 'new' AS tag"),
        merge_schema=True,
    )
    got = sorted((r.k, r.tag) for r in read_iceberg(spark, root).collect())
    assert got == [(0, None), (1, None), (5, "new")]
    # and a rename of the EVOLVED column still resolves everywhere
    w.rename_column("tag", "label")
    got2 = sorted((r.k, r.label) for r in read_iceberg(spark, root).collect())
    assert got2 == [(0, None), (1, None), (5, "new")]


def test_bucket_of_timestamp_uses_exact_micros(spark, tmp_path):
    """int(ts.timestamp()*1e6) is off by 1µs for ~1% of microsecond
    timestamps (r7 review #2) — the driver-side bucket of a literal
    must agree with the staged unix_micros path bit-exactly."""
    import datetime

    from plankton_spark.sources.iceberg_meta import (
        _bucket_of_long,
        iceberg_bucket,
    )
    from pyspark.sql import types as T

    ts = datetime.datetime(
        2038, 2, 27, 21, 18, 46, 981929, tzinfo=datetime.timezone.utc
    )
    exact = (
        ts - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    ) // datetime.timedelta(microseconds=1)
    assert exact % 10 == 9  # the float path would compute ...928
    assert iceberg_bucket(ts, T.TimestampType(), 64) == _bucket_of_long(
        exact, 64
    )
    # end-to-end: the staged bucket of this instant matches
    root = str(tmp_path / "ibucket_ts")
    df = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS k,"
        " timestamp_micros(CAST(2150918326981929 AS BIGINT)) AS ts"
    )
    IcebergWriter(spark, root).create(df, partition_by=["bucket(64, ts)"])
    pv = IcebergTable(root).data_entries(None)[0][1]
    assert pv["ts_bucket"] == iceberg_bucket(ts, T.TimestampType(), 64)


def test_rename_swap_resolves_by_id_in_wrapper(spark, tmp_path):
    """Rename sequences that REUSE an old name (a->tmp, b->a, tmp->b)
    must not transpose columns in the pyarrow read paths (r7 review
    #7 — id resolution wins over name for id-carrying files)."""
    root = str(tmp_path / "irename_swap")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame([(1, 100), (2, 200)], "a long, b long")
    )
    w.rename_column("a", "tmp")
    w.rename_column("b", "a")
    w.rename_column("tmp", "b")
    # logical a now holds the ORIGINAL b values and vice versa
    got = sorted((r.a, r.b) for r in read_iceberg(spark, root).collect())
    assert got == [(100, 1), (200, 2)]
    register(spark)
    df = spark.read.format("iceberglog").option("path", root).load()
    got2 = sorted((r.a, r.b) for r in df.collect())
    assert got2 == [(100, 1), (200, 2)]


def test_iceberg_optimize_zorder_tightens_stats(spark, tmp_path):
    """OPTIMIZE ZORDER parity with Delta/planktable: z-clustered files
    are narrow in BOTH z dimensions, so a narrow predicate on either
    dimension prunes files by footer stats."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from plankton_spark.sources.iceberg_meta import (
        IcebergTable,
        IcebergWriter,
        read_iceberg,
    )

    root = str(tmp_path / "ib_z")
    w = IcebergWriter(spark, root)
    df = spark.range(0, 4000).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    w.create(df.repartition(8))
    w.optimize(num_files=4, zorder_by=["x", "y"])
    t = IcebergTable(root)
    files = t.data_files()
    assert len(files) == 4
    # each z-ordered file must span well under the full domain in x
    spans = []
    for p in files:
        md = pq.ParquetFile(p).metadata
        mn = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(mx - mn)
    assert sum(sp < 64 for sp in spans) >= 2, spans
    assert read_iceberg(spark, root).count() == 4000


def test_drop_column_metadata_only(spark, tmp_path):
    root = str(tmp_path / "idrop")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(3).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            (F.col("id") * 3).alias("x"),
        )
    )
    w.drop_column("v")
    df = read_iceberg(spark, root)
    assert df.columns == ["k", "x"]
    assert sorted((r.k, r.x) for r in df.collect()) == [(0, 0), (1, 3), (2, 6)]
    # bytes still physically in the old file (no rewrite happened)
    import pyarrow.parquet as _pq

    t = IcebergTable(root)
    p = t.data_entries(None)[0][0]
    assert "v" in {f.name for f in _pq.read_schema(p)}
    # appends use the narrowed schema
    w.append(spark.createDataFrame([(10, 30)], "k long, x long"))
    got = sorted((r.k, r.x) for r in read_iceberg(spark, root).collect())
    assert got == [(0, 0), (1, 3), (2, 6), (10, 30)]


def test_add_after_drop_does_not_resurrect(spark, tmp_path):
    """A later ADD of the same NAME gets a fresh field id, so the
    dropped column's bytes (retired id) stay invisible — old rows
    read null for the re-added column, not the stale values."""
    root = str(tmp_path / "idrop2")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(2).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    )
    w.drop_column("v")
    w.append(
        spark.createDataFrame([(10, 99)], "k long, v long"), merge_schema=True
    )
    got = {r.k: r.v for r in read_iceberg(spark, root).collect()}
    assert got[10] == 99
    assert got[0] is None and got[1] is None, got


def test_drop_column_guards(spark, tmp_path):
    root = str(tmp_path / "idropg")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(2).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
        ),
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition"):
        w.drop_column("p")
    with pytest.raises(ValueError, match="no column"):
        w.drop_column("nope")
    w2 = IcebergWriter(spark, str(tmp_path / "idropg1"))
    w2.create(spark.range(2).select(F.col("id").alias("k")))
    with pytest.raises(ValueError, match="only column"):
        w2.drop_column("k")


def test_widen_column_reads_both_generations(spark, tmp_path):
    root = str(tmp_path / "iwide")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(3).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("float").alias("v"),
        )
    )
    w.widen_column("k", "long")
    w.widen_column("v", "double")
    # append with the WIDE schema after the promotion
    w.append(spark.createDataFrame([(10, 10.5)], "k long, v double"))
    df = read_iceberg(spark, root)
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    got = sorted((r.k, round(r.v, 1)) for r in df.collect())
    assert got == [(0, 0.0), (1, 1.0), (2, 2.0), (10, 10.5)]


def test_widen_column_refuses_out_of_spec(spark, tmp_path):
    root = str(tmp_path / "iwide2")
    w = IcebergWriter(spark, root)
    w.create(
        spark.range(2).select(
            F.col("id").alias("k"),
            F.col("id").cast("decimal(5,2)").alias("d"),
        )
    )
    with pytest.raises(ValueError, match="not an allowed"):
        w.widen_column("k", "int")  # narrowing
    with pytest.raises(ValueError, match="not an allowed"):
        w.widen_column("d", "decimal(10,4)")  # scale change
    w.widen_column("d", "decimal(12,2)")  # precision growth OK
    df = read_iceberg(spark, root)
    assert dict(df.dtypes)["d"] == "decimal(12,2)"
    assert df.count() == 2


def test_v3_column_defaults(spark, tmp_path):
    """initial-default read-time fill is per-file exact; write-default
    materializes only when the column is omitted; explicit NULLs
    survive; combination with row-level deletes refuses; metadata
    bumps to v3."""
    import json

    from plankton_spark.sources.iceberg_meta import (
        IcebergTable,
        IcebergWriter,
        read_iceberg,
    )

    root = str(tmp_path / "t")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame([(i, "A") for i in range(20)], "k long, s string")
    )
    w.add_column("p", "long", initial_default=5, write_default=7)
    # pre-ALTER files: read-time fill
    out = read_iceberg(spark, root)
    assert out.where(F.col("p") == 5).count() == 20
    # omitted on write → write-default
    w.append(spark.createDataFrame([(100, "B")], "k long, s string"))
    # explicit NULL survives (defaults are fallbacks, not coalesce)
    w.append(
        spark.createDataFrame(
            [(200, "C", None)], "k long, s string, p long"
        )
    )
    out = read_iceberg(spark, root)
    assert out.where(F.col("k") == 100).first()["p"] == 7
    assert out.where(F.col("k") == 200).first()["p"] is None
    assert out.where(F.col("p") == 5).count() == 20
    t = IcebergTable(root)
    assert int(t.metadata["format-version"]) == 3
    fld = next(
        f for f in t._current_ice_schema()["fields"] if f["name"] == "p"
    )
    assert fld["initial-default"] == 5 and fld["write-default"] == 7
    # defaults + row-level deletes: refuse, never approximate
    w.delete_where_dv(F.col("k") == 0)
    with pytest.raises(ValueError, match="initial-default"):
        read_iceberg(spark, root).collect()
