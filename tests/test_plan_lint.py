"""Plan-lint sweep over EVERY registered query (r6 verdict #1).

test_plans.py pins the plan shape of individual showcase queries;
this sweep is the safety net for the other 180: it builds each
registered query's plan at sf0.001 and rejects the two patterns that
are correct-but-melting at 100 TB:

- an unpartitioned window (``Window.orderBy`` with no partition spec):
  Spark inserts ``Exchange SinglePartition`` and one task holds every
  row — exactly the regression that slipped into q_sort_nulls and
  q_stream_watermark while only q_win_ntile_pctrank was asserted;
- a ``CartesianProduct`` join (all-pairs blowup).

Plus a parametrized skew lint (r6 verdict #7) asserting every
declared shuffle-heavy op's key-width caps hold, so a query edit
can't silently reintroduce a wide key that only CI telemetry
(tests/test_skewwatch.py) would have measured.
"""

from __future__ import annotations

import re

import pytest

from plankton_spark.framework.skewwatch import (
    fuzzy_block_skew,
    gemm_cell_skew,
    hh_candidate_skew,
    lsh_bucket_skew,
    span_bucket_skew,
)
from plankton_spark.registry import all_queries
from tests.conftest import SF0001

# Unpartitioned windows whose input is BOUNDED by construction, so the
# single partition holds a handful of rows at any scale. Every entry
# needs a justification here:
#   q_cte_query — RANK over the aggregated CTE; input cardinality is
#     the number of distinct mktsegments (~5) regardless of data size.
#   q_tpcds_rankdelta — ROW_NUMBER over LIMIT-10 subqueries (constant
#     10 rows at any scale; the global sort is TopK, not a full sort).
WINDOW_ALLOW = {"q_cte_query", "q_tpcds_rankdelta"}

# Queries whose cross join is declared and bounded:
#   q_join_cross — the cross-join coverage query itself (5x5 dims).
#   q_sim_jaccard — declared bounded pairwise (doc_id < 50 contract).
CARTESIAN_ALLOW = {"q_join_cross", "q_sim_jaccard"}


def _split_top_level(s: str) -> list[str]:
    """Split an argument list on commas not nested inside parens."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _windowspec_args(line: str) -> list[list[str]]:
    """All windowspecdefinition(...) argument lists on a plan line,
    extracted with paren balancing (args may nest, e.g. CAST(...))."""
    specs = []
    for m in re.finditer(r"windowspecdefinition\(", line):
        depth, i = 1, m.end()
        while i < len(line) and depth:
            if line[i] == "(":
                depth += 1
            elif line[i] == ")":
                depth -= 1
            i += 1
        specs.append(_split_top_level(line[m.end() : i - 1]))
    return specs


def unpartitioned_windows(optimized_plan: str) -> list[str]:
    """Window nodes whose spec has NO partition columns.

    In the optimized plan a windowspecdefinition lists partition
    columns first (bare references, no sort direction), then order
    columns (`col ASC NULLS FIRST`), then the frame. If the FIRST
    argument carries a sort direction, the partition spec is empty —
    the single-partition trap. (Bracket-group counting is ambiguous:
    `Window [exprs], [part]` and `Window [exprs], [order]` both print
    two groups.)
    """
    bad = []
    for line in optimized_plan.splitlines():
        node = line.lstrip(" :+-")
        if not node.startswith("Window ["):
            continue
        for args in _windowspec_args(node):
            if args and re.search(r"\b(ASC|DESC)\b", args[0]):
                bad.append(node[:200])
                break
    return bad


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_unpartitioned_window_or_cartesian(spark, name):
    df = all_queries()[name](spark, SF0001)
    qe = df._jdf.queryExecution()
    if name not in WINDOW_ALLOW:
        bad = unpartitioned_windows(qe.optimizedPlan().toString())
        assert not bad, (
            f"{name}: unpartitioned Window (single-partition at scale); "
            f"use operators.global_row_number / exclusive_prefix_max or "
            f"allowlist with a boundedness justification:\n" + "\n".join(bad)
        )
    if name not in CARTESIAN_ALLOW:
        phys = qe.sparkPlan().toString()
        assert "CartesianProduct" not in phys, f"{name}: CartesianProduct in plan"


# ---------------------------------------------------------------------------
# Skew-cap lint: every declared shuffle-heavy op, one parametrized test.
# Each watcher measures the op's actual key-width distribution on the
# fixture and the assertion is the cap the operator's guard promises.
# ---------------------------------------------------------------------------

def _assert_capped(rec):
    assert rec["n_keys"] > 0, rec
    assert rec["n_wide"] == 0, f"keys wider than cap: {rec}"


def _assert_budget(rec):
    assert 0 < rec["n_keys"] <= rec["candidate_budget"], rec


SKEW_LINTS = {
    "lsh_bucket": (lsh_bucket_skew, "_assert_guarded"),
    "gemm_cell": (gemm_cell_skew, "_assert_capped"),
    "span_bucket": (span_bucket_skew, "_assert_capped"),
    "hh_candidates": (hh_candidate_skew, "_assert_budget"),
    "fuzzy_block": (fuzzy_block_skew, "_assert_capped"),
}


@pytest.mark.parametrize("op", sorted(SKEW_LINTS))
def test_shuffle_heavy_op_skew_caps(spark, op):
    watcher, mode = SKEW_LINTS[op]
    rec = watcher(spark, SF0001)
    if mode == "_assert_budget":
        _assert_budget(rec)
    elif mode == "_assert_guarded":
        # LSH buckets may exceed the cap pre-guard; the sub-bucket
        # split guarantees the post-guard cell width is <= cap.
        assert rec["n_keys"] > 0, rec
        assert rec["max_guarded_width"] <= rec["cap"], rec
    else:
        _assert_capped(rec)
