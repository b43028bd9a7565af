"""Fine-grained driver-side attribution of q_stream_hudi_incr
(round 14, r13 verdict item 4): wraps the HudiWriter internals with
timers and cProfiles the whole lifecycle so the ~per-action driver
dead time decomposes into plan construction, py4j waits, local
timeline IO and Spark jobs.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import shutil
import sys
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from plankton_spark.io import read_table  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402
from plankton_spark.sources import hudi_meta  # noqa: E402
from plankton_spark.sources.hudi_meta import HudiWriter, register  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

PHASES: list[tuple[str, float]] = []


def timed(tag, fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    PHASES.append((tag, time.time() - t0))
    return out


def wrap(cls, name):
    orig = getattr(cls, name)

    def inner(self, *a, **kw):
        t0 = time.time()
        out = orig(self, *a, **kw)
        PHASES.append((f"  .{name}", time.time() - t0))
        return out

    setattr(cls, name, inner)


def main() -> None:
    spark = get_spark("profile-hudi-fine", shuffle_partitions=32)
    register(spark)
    root = "/tmp/profile_hudi_fine/tbl"
    sink = root + "_sink"
    ckpt = root + "_ckpt"
    shutil.rmtree("/tmp/profile_hudi_fine", ignore_errors=True)
    os.makedirs("/tmp/profile_hudi_fine", exist_ok=True)

    o = read_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    o.write.format("noop").mode("overwrite").save()
    k = F.col("o_orderkey")

    for m in (
        "_collapse_precombine",
        "_probe_tagged_unique",
        "_write_groups",
        "_attach_meta",
        "_complete",
        "_check_unique_keys",
    ):
        wrap(HudiWriter, m)

    def drain(tag):
        q = (
            spark.readStream.format("hudiincr")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .queryName(f"prof_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    prof = cProfile.Profile()
    prof.enable()
    w = timed(
        "writer-init",
        HudiWriter,
        spark,
        root,
        record_key="o_orderkey",
        table_type="MERGE_ON_READ",
    )
    timed("create", w.create, o.where(k < 1000))
    upd1 = o.where(k < 200).withColumn("o_orderstatus", F.lit("U"))
    ins = o.where((k >= 1000) & (k < 1200))
    timed("upsert1", w.upsert, upd1.unionByName(ins))
    timed("drain1", drain, "d1")
    timed("upsert2", w.upsert, o.where(k < 100).withColumn("o_orderstatus", F.lit("V")))
    timed("compact", w.compact)
    timed("drain2", drain, "d2")
    seq_map = spark.createDataFrame(
        [("a", 1)], "_hoodie_commit_time string, seq int"
    )
    feed = spark.read.parquet(sink)
    agg = (
        feed.join(F.broadcast(seq_map), "_hoodie_commit_time", "left")
        .groupBy(F.coalesce("seq", F.lit(-1)).alias("seq"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    timed("final-agg", lambda: agg.collect())
    prof.disable()

    total = sum(s for tag, s in PHASES if not tag.startswith("  ."))
    print(f"\n== phases (total {total:.2f}s) ==")
    for tag, s in PHASES:
        print(f"{tag:28s} {s:6.2f}s")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    out = "/tmp/profile_hudi_fine/cprofile.txt"
    with open(out, "w") as fh:
        st.stream = fh
        st.print_stats(60)
    print(f"cprofile -> {out}")


if __name__ == "__main__":
    main()
