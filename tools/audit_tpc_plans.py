"""Round-14 TPC-H/TPC-DS plan audit (r13 verdict item 8): for every
q_tpch_* / q_tpcds_* query, dump the formatted physical plan at sf0.1
and flag the plan smells the verdict names:

- SortMergeJoin / ShuffledHashJoin where a side might be broadcastable
  (reported with the join keys so a human can judge dimension size)
- scans whose PushedFilters is empty while the query filters that table
- CartesianProduct / BroadcastNestedLoopJoin
- Exchange SinglePartition feeding a Sort (global-sort shape)

Usage: python tools/audit_tpc_plans.py [out_dir]
Writes <out_dir>/<name>_audit.txt for flagged queries and prints a
one-line summary per query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

from plankton_spark.registry import all_queries  # noqa: E402
from plankton_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpc_audit"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("audit-tpc-plans", shuffle_partitions=32)
    reg = all_queries()
    names = sorted(
        n for n in reg if n.startswith(("q_tpch_", "q_tpcds_"))
    )
    n_flagged = 0
    for name in names:
        try:
            df = reg[name](spark, SF)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        smells = []
        n_smj = plan.count("SortMergeJoin")
        n_shj = plan.count("ShuffledHashJoin")
        n_bhj = plan.count("BroadcastHashJoin")
        if "CartesianProduct" in plan:
            smells.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            smells.append("BNLJ")
        # scans with no pushed filters at all
        empty_pushed = len(
            re.findall(r"PushedFilters: \[\]", plan)
        )
        # Exchange SinglePartition followed (plan-order) by a Sort
        if re.search(r"Exchange SinglePartition[\s\S]{0,400}?\bSort\b", plan):
            smells.append("SINGLEPART-SORT")
        line = (
            f"{name}: SMJ={n_smj} SHJ={n_shj} BHJ={n_bhj} "
            f"emptyPushed={empty_pushed}"
            + (" " + ",".join(smells) if smells else "")
        )
        print(line)
        if smells or n_smj > 0:
            n_flagged += 1
            with open(os.path.join(out_dir, f"{name}_audit.txt"), "w") as fh:
                fh.write(line + "\n\n" + plan)
    print(f"== audited {len(names)}, flagged {n_flagged} -> {out_dir}")


if __name__ == "__main__":
    main()
