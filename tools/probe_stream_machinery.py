"""Round-14 experiment (r13 verdict item 7): how much of a streaming
drain's wall is fixed query start/stop machinery vs data work?

Method: build the q_stream_hudi_incr table (create + upsert), then
time three availableNow drains of the hudiincr source against the SAME
checkpoint: drain1 carries the two instants' data, drain2 and drain3
have ZERO pending instants — the microbatch still starts, resolves
offsets, commits and stops, so their wall is the pure machinery cost.
machinery_fraction = empty_drain / data_drain. If >= 0.8 the
per-drain wall is start/stop + offset/commit-log fixed cost and there
is no engine-side lever short of forking the machinery (the r13
hypothesis); otherwise the delta is the optimization target.

Also times a 4th drain after one more upsert (warm machinery + data)
to separate first-drain Python-worker spin-up from steady state.
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
    spark = get_spark("probe-stream-machinery", shuffle_partitions=32)
    register(spark)
    root = "/tmp/probe_stream_mach/tbl"
    sink = root + "_sink"
    ckpt = root + "_ckpt"
    shutil.rmtree("/tmp/probe_stream_mach", ignore_errors=True)
    os.makedirs("/tmp/probe_stream_mach", exist_ok=True)

    o = read_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    o.write.format("noop").mode("overwrite").save()  # warm session
    k = F.col("o_orderkey")

    w = HudiWriter(spark, root, record_key="o_orderkey", table_type="MERGE_ON_READ")
    w.create(o.where(k < 1000))
    w.upsert(o.where(k < 200).withColumn("o_orderstatus", F.lit("U")))

    def drain(tag: str) -> float:
        t0 = time.time()
        q = (
            spark.readStream.format("hudiincr")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .queryName(f"probe_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s")
        return dt

    d_data = drain("drain1 (2 instants of data, cold machinery)")
    d_empty1 = drain("drain2 (ZERO pending data)")
    d_empty2 = drain("drain3 (ZERO pending data)")
    w.upsert(o.where(k < 100).withColumn("o_orderstatus", F.lit("V")))
    d_data2 = drain("drain4 (1 instant of data, warm machinery)")
    empty = min(d_empty1, d_empty2)
    print(
        f"machinery fraction (empty/warm-data): {empty / d_data2:.2f}; "
        f"(empty/cold-data): {empty / d_data:.2f}"
    )


if __name__ == "__main__":
    main()
