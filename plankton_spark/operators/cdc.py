"""CDC consumer building block: materialize a replica's LAST-IMAGE
state from a change feed — the downstream half of Change Data Capture
(the upstream halves are sources/delta_log.py:read_delta_cdf /
format("deltacdf") and sources/iceberg_meta.py:read_iceberg_changelog).

A sink consuming a feed (replica sync, search-index refresh,
materialized cache) needs "the latest surviving row per key", which is
one windowed reduction — NOT a per-commit replay loop: at 100 TB of
feed the per-key last image is a single shuffle on the key, and
commits that touched a key many times collapse before any target IO.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

# Within one commit a key carries either an insert, a delete, or an
# update preimage+postimage pair; ordering the pair puts the postimage
# last so "max (version, rank)" is the key's state after the commit.
_RANK = {
    "update_preimage": 0,
    "delete": 1,
    "insert": 2,
    "update_postimage": 3,
}


def cdf_last_image(feed, key: str, version_col: str = "_commit_version"):
    """The replica STATE a change feed implies: for each key, the last
    change wins (ordered by commit version, then the change-type rank
    above), and keys whose last change is a delete (or a dangling
    preimage) drop out. Returns the feed's data columns — exactly the
    rows a synced replica would hold.

    Deterministic by construction when the feed is well-formed (one
    terminal change per key per commit); the window partitions by key,
    so the reduction is one key-shuffle regardless of feed length —
    the shape that lets a consumer apply a week of busy history in
    one pass instead of replaying commits."""
    rank = F.coalesce(
        *[
            F.when(F.col("_change_type") == t, F.lit(r))
            for t, r in _RANK.items()
        ]
    )
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col("__ct_rank").desc()
    )
    last = (
        feed.withColumn("__ct_rank", rank)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where(F.col("_change_type").isin("insert", "update_postimage"))
    )
    drop = ["__ct_rank", "__rn", "_change_type", version_col]
    if "_commit_timestamp" in feed.columns:
        drop.append("_commit_timestamp")
    if "_snapshot_id" in feed.columns:
        drop.append("_snapshot_id")
    return last.drop(*drop)
