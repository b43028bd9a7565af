"""Time the components of q_stream_hudi_incr (the gate's slowest
query) to attribute its wall: Hudi writer ops (create/upsert/compact,
each with metadata-table maintenance) vs the two structured-streaming
drains. Read-only diagnostics for the round-13 optimization log.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from plankton_spark.io import read_table  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402
from plankton_spark.sources.hudi_meta import HudiWriter, register  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("profile-stream-hudi", shuffle_partitions=32)
    register(spark)
    root = "/tmp/prof_stream_hudi/tbl"
    sink = root + "_sink"
    ckpt = root + "_ckpt"
    shutil.rmtree("/tmp/prof_stream_hudi", ignore_errors=True)
    os.makedirs("/tmp/prof_stream_hudi", exist_ok=True)

    o = read_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    o.write.format("noop").mode("overwrite").save()  # warm session
    k = F.col("o_orderkey")

    t0 = time.time()
    w = HudiWriter(spark, root, record_key="o_orderkey", table_type="MERGE_ON_READ")
    w.create(o.where(k < 1000))
    t1 = time.time()
    upd1 = o.where(k < 200).withColumn("o_orderstatus", F.lit("U"))
    ins = o.where((k >= 1000) & (k < 1200))
    w.upsert(upd1.unionByName(ins))
    t2 = time.time()

    def drain():
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

    drain()
    t3 = time.time()
    w.upsert(o.where(k < 100).withColumn("o_orderstatus", F.lit("V")))
    t4 = time.time()
    w.compact()
    t5 = time.time()
    drain()
    t6 = time.time()
    print(f"create          {t1 - t0:6.2f}s")
    print(f"upsert1         {t2 - t1:6.2f}s")
    print(f"drain1          {t3 - t2:6.2f}s")
    print(f"upsert2         {t4 - t3:6.2f}s")
    print(f"compact         {t5 - t4:6.2f}s")
    print(f"drain2          {t6 - t5:6.2f}s")
    print(f"total           {t6 - t0:6.2f}s")


if __name__ == "__main__":
    main()
