"""Dump .explain("formatted") for named queries → plans/r14/.

Usage: python tools/dump_plans_r14.py <suffix> <query> [<query> ...]

Writes plans/r14/<query>_<suffix>.txt at sf0.001 (plan shape is
scale-invariant for these queries; the small fixture keeps the dump
cheap). Run with suffix=before on the pre-optimization tree (git
worktree at the round's base commit) and suffix=after at HEAD.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from plankton_spark.registry import all_queries  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT = os.environ.get("PLANS_OUT", "plans/r14")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump-plans-r14", shuffle_partitions=32)
    reg = all_queries()
    os.makedirs(OUT, exist_ok=True)
    import time
    for name in names:
        t0 = time.time()
        df = reg[name](spark, SF)
        build_s = time.time() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"dumped {name}_{suffix} build={build_s:.2f}s")


if __name__ == "__main__":
    main()
