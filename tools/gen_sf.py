"""Scale-up fixture generator: builds an sfN directory by unioning K
key-shifted copies of a source sf directory (default: 10 x sf0.1 →
"sf1" under /root/repo/.scratch). Bench-only — the oracle gate stays
on the driver's sf0.01 fixtures; this exists to expose
data-proportional behavior that fixed costs mask at sf0.1.

Key spaces shift consistently across tables (copy i adds i * span to
every instance of a key), so join fan-outs and group cardinalities
scale the way a real 10x corpus would. nation/region stay fixed (the
dimension tables a 100 TB warehouse also keeps small). documents.text
is passed through a per-copy character rotation: within-copy near-dup
structure is preserved exactly, while cross-copy shingles diverge —
without this, every doc would gain 9 exact near-dups and the dedup
queries would measure a 90%-duplicate corpus instead of a scaled one.

Usage: python tools/gen_sf.py [--copies 10] [--src /root/testdata/sf0.1]
                              [--out /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from plankton_spark.session import get_spark  # noqa: E402

# Per-copy text dialects via composed character rotations over three
# DISJOINT 5-letter alphabets: copy i rotates vowels by i%5, one
# consonant set by (i//5)%5, another by (i//25)%5 → 125 distinct
# bijections, so up to 125 copies have pairwise-divergent shingles
# (the old single-alphabet scheme collided past 10 copies, which
# would have turned a 100-copy corpus into 90% cross-copy dups).
DIALECT_SETS = ("aeiou", "ntrls", "dhcmf")


def dialect_mapping(i: int) -> tuple[str, str]:
    def rot(s: str, k: int) -> str:
        k %= len(s)
        return s[k:] + s[:k]

    frm = "".join(DIALECT_SETS)
    to = (
        rot(DIALECT_SETS[0], i % 5)
        + rot(DIALECT_SETS[1], (i // 5) % 5)
        + rot(DIALECT_SETS[2], (i // 25) % 5)
    )
    return frm, to


def _span(df, col: str) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def _copies(df, n: int, shifts: dict[str, int], extra=None):
    """Union n copies of df, adding i * span to each keyed column."""
    parts = []
    for i in range(n):
        c = df
        for col, span in shifts.items():
            c = c.withColumn(col, (F.col(col) + F.lit(i * span)).cast(df.schema[col].dataType))
        if extra is not None:
            c = extra(c, i)
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    ap.add_argument(
        "--tables",
        default="all",
        help="comma list (e.g. documents,embeddings) or 'all'",
    )
    args = ap.parse_args()
    n = args.copies
    if n > 125:
        raise SystemExit("dialect scheme supports at most 125 copies")
    wanted = None if args.tables == "all" else set(args.tables.split(","))

    def keep(name):
        return wanted is None or name in wanted

    spark = get_spark("gen-sf", shuffle_partitions=32)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(args.out, exist_ok=True)

    def src(name):
        # raw read: events.ts stays a nanos LONG and is written back as
        # a plain long, which read_table's ns→µs conversion handles
        return spark.read.parquet(f"{args.src}/{name}.parquet")

    def write(df, name, parts=8):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{args.out}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{args.out}/{name}.parquet').count()} rows")

    # dimensions stay single-copy
    if keep("region"):
        write(src("region"), "region", 1)
    if keep("nation"):
        write(src("nation"), "nation", 1)
    if any(keep(t) for t in ("supplier", "customer", "part", "orders", "lineitem")):
        supplier = src("supplier")
        customer = src("customer")
        part = src("part")
        orders = src("orders")
        span_supp = _span(supplier, "s_suppkey")
        span_cust = _span(customer, "c_custkey")
        span_part = _span(part, "p_partkey")
        span_ord = _span(orders, "o_orderkey")
        if keep("supplier"):
            write(_copies(supplier, n, {"s_suppkey": span_supp}), "supplier", 4)
        if keep("customer"):
            write(_copies(customer, n, {"c_custkey": span_cust}), "customer", 8)
        if keep("part"):
            write(_copies(part, n, {"p_partkey": span_part}), "part", 8)
        if keep("orders"):
            write(
                _copies(orders, n, {"o_orderkey": span_ord, "o_custkey": span_cust}),
                "orders",
                16,
            )
        if keep("lineitem"):
            write(
                _copies(
                    src("lineitem"),
                    n,
                    {
                        "l_orderkey": span_ord,
                        "l_partkey": span_part,
                        "l_suppkey": span_supp,
                    },
                ),
                "lineitem",
                32,
            )

    if keep("events"):
        events = src("events")
        write(
            _copies(
                events,
                n,
                {
                    "event_id": _span(events, "event_id"),
                    "user_id": _span(events, "user_id"),
                },
            ),
            "events",
            16,
        )

    if keep("documents"):
        docs = src("documents")
        span_doc = _span(docs, "doc_id")

        def dialect(c, i):
            frm, to = dialect_mapping(i)
            return c.withColumn("text", F.translate("text", frm, to))

        write(_copies(docs, n, {"doc_id": span_doc}, extra=dialect), "documents", 8)

    if keep("embeddings"):
        emb = src("embeddings")
        write(_copies(emb, n, {"vec_id": _span(emb, "vec_id")}), "embeddings", 8)


if __name__ == "__main__":
    main()
