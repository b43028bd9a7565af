"""Round-11 second-half sf10 soak: run the new heavy queries at 100×
rows (cold, then warm) and print one timing line each — the
data-proportionality check BASELINE.md records per round. Bench-only;
the oracle gate stays at sf0.01.

Usage: python tools/soak_r11b.py [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plankton_spark.registry import all_queries  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q_hudi_read",
    "q_hudi_incremental",
    "q_hudi_mor_read",
    "q_hudi_mor_compact",
    "q_stream_hudi_incr",
    "q_iceberg_changelog_eq",
    "q_stream_streamjoin_full",
    "q_sample_dsir",
    "q_knn_pq",
    "q_tpcds_chansets",
    "q_tpcds_widecond",
    "q_tpcds_revbands",
    "q_tpcds_shipratio",
    "q_deltalog_defaults",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
    spark = get_spark("soak-r11b")
    qs = all_queries()
    for name in QUERIES:
        fn = qs[name]
        t0 = time.time()
        n_cold = fn(spark, sf_dir).count()
        cold = time.time() - t0
        t1 = time.time()
        n_warm = fn(spark, sf_dir).count()
        warm = time.time() - t1
        print(
            f"{name:28s} cold={cold:7.1f}s warm={warm:7.1f}s rows={n_cold}"
            + ("" if n_cold == n_warm else f" WARM_ROWS={n_warm} MISMATCH")
        , flush=True)


if __name__ == "__main__":
    main()
