"""Column profiling (the ANALYZE TABLE / data-quality-report surface).

``profile_table`` computes, per numeric column, the statistics an
optimizer's CBO and a data-quality gate both read: row count,
non-null count, distinct count, decimal-exact min/max — in ONE pass
over the table with every aggregate partial-combinable.

The distinct count is the scale decision. Exact multi-column
COUNT(DISTINCT) compiles to an EXPAND that multiplies scanned rows by
the number of profiled columns (measured 4.9x wall at sf10 for 4
columns — the worst data-bound ratio in the BASELINE.md soak). At
100 TB that is the wrong default for an ANALYZE surface, so the
default here is HLL++ (``approx_count_distinct``, merge-commutative
sketches, ~1.6 KB state per column, single-scan linear) and exact is
the ``exact=True`` opt-in for small/dimension tables where the EXPAND
is affordable. tests/test_plans.py asserts the default plan contains
no Expand node and the exact plan does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str],
    *,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One-scan column profile: (col, n_rows, n_nonnull, n_distinct,
    min_v, max_v), one output row per profiled column.

    ``exact=False`` (default) estimates n_distinct with HLL++ at
    relative standard deviation ``rsd`` — no EXPAND, linear at any
    scale. ``exact=True`` uses COUNT(DISTINCT) — exact, but the plan
    EXPANDs rows x len(cols); reserve it for bounded tables.
    """
    aggs = []
    for c in cols:
        nd = (
            F.countDistinct(c)
            if exact
            else F.approx_count_distinct(c, rsd=rsd)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).cast("long").alias(f"{c}__nn"),
            nd.cast("long").alias(f"{c}__nd"),
            F.round(F.min(c).cast("decimal(18,4)").cast("double"), 4).alias(
                f"{c}__mn"
            ),
            F.round(F.max(c).cast("decimal(18,4)").cast("double"), 4).alias(
                f"{c}__mx"
            ),
        ]
    # ONE agg computing all 5*len(cols) aggregates in a single scan,
    # then stack() pivots the single wide row into one row per column.
    wide = df.select(*cols).agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col, n_rows, n_nonnull, n_distinct, min_v, max_v)"
    )
