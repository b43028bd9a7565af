"""Method-level time attribution inside the Hudi write lifecycle of
q_hudi_record_index: wraps HudiWriter internals with timers (read-only
diagnostics; no engine changes)."""

from __future__ import annotations

import collections
import functools
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from plankton_spark.io import read_table  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402
from plankton_spark.sources import hudi_meta as hm  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

ACC: dict[str, list[float]] = collections.defaultdict(list)


def timed(cls, name):
    orig = getattr(cls, name)

    @functools.wraps(orig)
    def wrap(*a, **kw):
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            ACC[name].append(time.time() - t0)

    setattr(cls, name, wrap)


for m in [
    "_merge_mor",
    "_delete_mor",
    "_merge",
    "insert",
    "create",
    "_collapse_precombine",
    "_probe_tagged_unique",
    "_bloom_candidate_set",
    "_rli_lookup",
    "_write_groups",
    "_write_staged_groups",
    "_metadata_update",
    "_merge_mor_meta",
    "compact",
    "_complete",
    "_attach_meta",
    "_write_empty_base",
]:
    timed(hm.HudiWriter, m)


def main() -> None:
    spark = get_spark("profile-rli-fine", shuffle_partitions=32)
    base = "/tmp/prof_rli_fine"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    o = read_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    o.write.format("noop").mode("overwrite").save()
    k = F.col("o_orderkey")

    def lifecycle(root, **kw):
        w = hm.HudiWriter(
            spark, root, record_key="o_orderkey",
            partition_field="o_orderstatus", group_buckets=2, **kw,
        )
        w.create(o.where(k < 1200))
        w2 = hm.HudiWriter(spark, root)
        upd = o.where(k < 150).withColumn("o_orderstatus", F.lit("U"))
        ins = o.where((k >= 2000) & (k < 2100)).withColumn(
            "o_orderstatus", F.lit("N")
        )
        w2.upsert(upd.unionByName(ins))
        w2.delete_keys(o.where((k < 2100) & (k % 13 == 0)).select("o_orderkey"))
        return w2

    t0 = time.time()
    lifecycle(base + "/rli", record_index=True)
    lifecycle(base + "/twin", metadata_table=True)
    total = time.time() - t0
    print(f"lifecycles total {total:6.2f}s")
    # NOTE: times are nested (create contains _write_groups contains
    # _metadata_update ...) — read as inclusive per call site.
    for name, ts in sorted(ACC.items(), key=lambda kv: -sum(kv[1])):
        print(
            f"{name:24s} n={len(ts):3d} sum={sum(ts):6.2f}s "
            f"max={max(ts):5.2f}s"
        )


if __name__ == "__main__":
    main()
