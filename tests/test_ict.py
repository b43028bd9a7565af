"""In-commit timestamps (Delta `inCommitTimestamp` writer feature):
enablement protocol/properties, monotonic stamping, first-action
placement, ICT-over-mtime time travel, and history surfacing."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from tests.conftest import SF0001


def _commits(root):
    log_dir = os.path.join(root, "_delta_log")
    out = {}
    for f in sorted(os.listdir(log_dir)):
        if f.endswith(".json") and f[:-5].isdigit():
            with open(os.path.join(log_dir, f)) as fh:
                out[int(f[:-5])] = [json.loads(x) for x in fh if x.strip()]
    return out


def _make(spark, tmp_path, name="t"):
    from plankton_spark.sources.delta_log import DeltaLogWriter

    root = str(tmp_path / name)
    o = read_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).where(F.col("o_orderkey") < 300)
    w = DeltaLogWriter(spark, root)
    w.create(o)
    return root, w, o


def test_enablement_protocol_and_properties(spark, tmp_path):
    root, w, o = _make(spark, tmp_path)
    v = w.enable_ict()
    commits = _commits(root)
    actions = commits[v]
    # commitInfo is the FIRST action and carries the ICT
    assert "commitInfo" in actions[0]
    ict = actions[0]["commitInfo"]["inCommitTimestamp"]
    prot = next(a["protocol"] for a in actions if "protocol" in a)
    assert prot["minWriterVersion"] == 7
    assert "inCommitTimestamp" in prot["writerFeatures"]
    # legacy writer version 2 features carried over, reader side untouched
    assert {"appendOnly", "invariants"} <= set(prot["writerFeatures"])
    assert prot["minReaderVersion"] == 1 and "readerFeatures" not in prot
    md = next(a["metaData"] for a in actions if "metaData" in a)
    cfg = md["configuration"]
    assert cfg["delta.enableInCommitTimestamps"] == "true"
    assert int(cfg["delta.inCommitTimestampEnablementVersion"]) == v
    assert int(cfg["delta.inCommitTimestampEnablementTimestamp"]) == ict


def test_subsequent_commits_stamp_monotonic_ict(spark, tmp_path):
    root, w, o = _make(spark, tmp_path)
    w.enable_ict()
    w.append(o.limit(10))
    w.append(o.limit(5))
    commits = _commits(root)
    icts = []
    for v in sorted(commits)[1:]:
        first = commits[v][0]
        assert "commitInfo" in first, f"v{v}: commitInfo must be first"
        icts.append(first["commitInfo"]["inCommitTimestamp"])
    assert icts == sorted(icts) and len(set(icts)) == len(icts)


def test_ict_survives_backdated_predecessor(spark, tmp_path):
    """A predecessor whose ICT sits in the future (clock skew) forces
    prev+1, not wall clock."""
    root, w, o = _make(spark, tmp_path)
    w.enable_ict()
    # forge: rewrite the last commit's ICT far into the future
    commits = _commits(root)
    v = max(commits)
    future = int(time.time() * 1000) + 10_000_000
    actions = commits[v]
    actions[0]["commitInfo"]["inCommitTimestamp"] = future
    path = os.path.join(root, "_delta_log", f"{v:020d}.json")
    with open(path, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    w.append(o.limit(3))
    commits = _commits(root)
    assert commits[max(commits)][0]["commitInfo"][
        "inCommitTimestamp"
    ] == future + 1


def test_timestamp_travel_uses_ict_not_mtime(spark, tmp_path):
    """Scrambled file mtimes must not affect TIMESTAMP AS OF once ICT
    is enabled."""
    from plankton_spark.sources.delta_log import read_delta, version_at_timestamp

    root, w, o = _make(spark, tmp_path)
    w.enable_ict()
    w.append(o.limit(10))
    w.append(o.limit(5))
    commits = _commits(root)
    versions = sorted(commits)
    icts = {
        v: commits[v][0]["commitInfo"]["inCommitTimestamp"]
        for v in versions[1:]
    }
    # scramble mtimes: set every commit file's mtime to NOW + an hour
    for v in versions:
        p = os.path.join(root, "_delta_log", f"{v:020d}.json")
        os.utime(p, (time.time() + 3600, time.time() + 3600))
    mid = versions[-2]
    assert version_at_timestamp(root, icts[mid]) == mid
    assert version_at_timestamp(root, icts[mid] + 1000000) == versions[-1]
    n_mid = read_delta(spark, root, version=mid).count()
    n_tt = read_delta(spark, root, timestamp_ms=icts[mid]).count()
    assert n_tt == n_mid


def test_history_reports_ict(spark, tmp_path):
    from plankton_spark.sources.delta_log import delta_history

    root, w, o = _make(spark, tmp_path)
    w.enable_ict()
    w.append(o.limit(10))
    commits = _commits(root)
    hist = {h["version"]: h for h in delta_history(root)}
    for v in sorted(commits)[1:]:
        assert (
            hist[v]["timestamp_ms"]
            == commits[v][0]["commitInfo"]["inCommitTimestamp"]
        )


def test_enable_twice_refuses(spark, tmp_path):
    root, w, o = _make(spark, tmp_path)
    w.enable_ict()
    import pytest

    with pytest.raises(ValueError, match="already enabled"):
        w.enable_ict()


def test_non_ict_table_unaffected(spark, tmp_path):
    """Tables that never enabled ICT keep bare action commits (no
    injected commitInfo) and mtime-based travel."""
    root, w, o = _make(spark, tmp_path)
    w.append(o.limit(10))
    for v, actions in _commits(root).items():
        assert not any(
            "inCommitTimestamp" in (a.get("commitInfo") or {})
            for a in actions
        )


def test_bare_commitinfo_gains_ict_not_duplicated(spark, tmp_path):
    """A commit that already carries a commitInfo WITHOUT an ICT
    (operation label only) must get the timestamp merged in — not a
    second commitInfo (the spec allows at most one per commit)."""
    root, w, o = _make(spark, tmp_path)
    w.enable_ict()
    v = w._commit_with_retry(
        [{"commitInfo": {"operation": "CUSTOM"}}]
    )
    actions = _commits(root)[v]
    infos = [a for a in actions if "commitInfo" in a]
    assert len(infos) == 1
    assert actions[0] is not None and "commitInfo" in actions[0]
    assert actions[0]["commitInfo"]["operation"] == "CUSTOM"
    assert "inCommitTimestamp" in actions[0]["commitInfo"]
