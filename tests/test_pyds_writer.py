"""Python DataSourceWriter (pyjsonl sink): file-per-task layout,
manifest commit, orphan cleanup, overwrite semantics."""

from __future__ import annotations

import json
import os

from plankton_spark.sources.pyds import register_sink


def _write(spark, path, n_rows=20, parts=3, mode="overwrite"):
    register_sink(spark)  # idempotent re-register
    df = spark.range(n_rows).selectExpr("id", "id % 5 AS k").repartition(parts)
    df.write.format("pyjsonl").mode(mode).option("path", path).save()


def test_writer_layout_and_manifest(spark, tmp_path):
    path = str(tmp_path / "out")
    _write(spark, path, n_rows=20, parts=3)
    files = sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))
    assert len(files) == 3
    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    assert sorted(manifest) == files  # manifest == exactly the data files
    rows = []
    for fn in files:
        with open(os.path.join(path, fn)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(20))


def test_overwrite_replaces_and_orphans_removed(spark, tmp_path):
    path = str(tmp_path / "out")
    _write(spark, path, n_rows=10, parts=2)
    # plant an orphan as a failed/speculative task would leave behind
    with open(os.path.join(path, "part-99999-deadbeef.jsonl"), "w") as f:
        f.write('{"id": 999, "k": 0}\n')
    _write(spark, path, n_rows=6, parts=2)
    files = sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))
    assert len(files) == 2
    assert not any("deadbeef" in f for f in files)
    back = spark.read.json(path)  # _manifest.json is _-prefixed → ignored
    assert sorted(r["id"] for r in back.collect()) == list(range(6))


def test_append_preserves_prior_committed_files(spark, tmp_path):
    """Append into a directory holding a previous committed write must
    keep that data: run-scoped prefixes stop commit() from treating the
    older run's files as orphans (a silent data-loss path before)."""
    path = str(tmp_path / "out")
    _write(spark, path, n_rows=10, parts=2)
    _write(spark, path, n_rows=6, parts=2, mode="append")
    back = spark.read.json(path)
    assert sorted(r["id"] for r in back.collect()) == sorted(
        list(range(10)) + list(range(6))
    )
    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    files = sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))
    assert sorted(manifest) == files  # manifest covers both runs


def test_abort_scoped_to_run(spark, tmp_path):
    """abort() may only delete the failing run's own files."""
    import pytest

    path = str(tmp_path / "out")
    _write(spark, path, n_rows=10, parts=2)
    register_sink(spark)
    bad = spark.range(4).selectExpr(
        "id", "CAST(raise_error('boom') AS STRING) AS k"
    )
    with pytest.raises(Exception):
        bad.write.format("pyjsonl").mode("append").option("path", path).save()
    back = spark.read.json(path)
    assert sorted(r["id"] for r in back.collect()) == list(range(10))


def test_writer_requires_path(spark):
    import pytest

    register_sink(spark)
    with pytest.raises(Exception, match="path"):
        spark.range(3).write.format("pyjsonl").mode("overwrite").save()
