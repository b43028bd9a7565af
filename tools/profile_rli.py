"""Attribute q_hudi_record_index's wall to its phases: the two write
lifecycles (create / upsert / delete per table) vs the verification
reads (twin exceptAll, RLI parity, counts, final agg). Read-only
diagnostics for the round-13 optimization log."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from plankton_spark.io import read_table  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402
from plankton_spark.sources.hudi_meta import HudiWriter, read_hudi  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
VIRTUAL = os.environ.get("RLI_VIRTUAL", "") == "1"


def main() -> None:
    spark = get_spark("profile-rli", shuffle_partitions=32)
    base = "/tmp/prof_rli"
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    o = read_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    o.write.format("noop").mode("overwrite").save()  # warm session
    k = F.col("o_orderkey")
    marks: list[tuple[str, float]] = []

    def mark(label):
        marks.append((label, time.time()))

    def lifecycle(root, tag, **kw):
        w = HudiWriter(
            spark,
            root,
            record_key="o_orderkey",
            partition_field="o_orderstatus",
            group_buckets=2,
            **({"populate_meta_fields": False} if VIRTUAL else {}),
            **kw,
        )
        mark(f"{tag}:init")
        w.create(o.where(k < 1200))
        mark(f"{tag}:create")
        w2 = HudiWriter(spark, root)
        upd = o.where(k < 150).withColumn("o_orderstatus", F.lit("U"))
        ins = o.where((k >= 2000) & (k < 2100)).withColumn(
            "o_orderstatus", F.lit("N")
        )
        w2.upsert(upd.unionByName(ins))
        mark(f"{tag}:upsert")
        w2.delete_keys(o.where((k < 2100) & (k % 13 == 0)).select("o_orderkey"))
        mark(f"{tag}:delete")
        return w2

    mark("start")
    w_rli = lifecycle(base + "/rli", "rli", record_index=True)
    lifecycle(base + "/twin", "twin", metadata_table=True)

    cols = ["o_orderkey", "o_orderstatus"]
    snap_rli = read_hudi(spark, base + "/rli").select(cols)
    snap_bloom = read_hudi(spark, base + "/twin").select(cols)
    mark("verify:build")
    snap_rli.exceptAll(snap_bloom).isEmpty()
    mark("verify:twin_ab")
    snap_bloom.exceptAll(snap_rli).isEmpty()
    mark("verify:twin_ba")
    if VIRTUAL:
        disk = (
            read_hudi(spark, base + "/rli")
            .withColumn(
                "__b",
                F.substring_index(F.col("_metadata.file_path"), "/", -1),
            )
            .select(
                F.col("o_orderkey").cast("string").alias("__key"),
                F.element_at(F.split("__b", "_"), 1).alias("__fid"),
            )
        )
    else:
        disk = read_hudi(spark, base + "/rli", with_meta=True).select(
            F.col("_hoodie_record_key").alias("__key"),
            F.element_at(F.split("_hoodie_file_name", "_"), 1).alias("__fid"),
        )
    idx = w_rli._rli_lookup().select("__key", "__fid")
    idx.exceptAll(disk).isEmpty()
    mark("verify:parity_ab")
    disk.exceptAll(idx).isEmpty()
    mark("verify:parity_ba")
    idx.count()
    mark("verify:count")
    snap_rli.agg(
        F.count(F.lit(1)), F.sum("o_orderkey"),
        F.sum(F.when(F.col("o_orderstatus") == "U", 1).otherwise(0)),
    ).collect()
    mark("verify:final_agg")

    prev = marks[0][1]
    for label, t in marks[1:]:
        print(f"{label:24s} {t - prev:6.2f}s")
        prev = t
    print(f"{'TOTAL':24s} {marks[-1][1] - marks[0][1]:6.2f}s")


if __name__ == "__main__":
    main()
