"""Determinism helpers (SURVEY.md §2.0 policy).

Cross-engine value-hash matching demands bit-identical outputs from
Spark and DuckDB. The rules, shared by every declared query:

- Sums/avgs over double money/qty columns go through exact
  DECIMAL(18,4) accumulation (associative ⇒ immune to Spark's
  partial-aggregation order), then a single cast back to DOUBLE and
  a ROUND. Per-row double arithmetic (a*b, 1-x) is IEEE-deterministic
  in both engines; only *reductions* need the decimal detour.
- AVG is expressed as decimal-SUM / COUNT (DuckDB's AVG accumulates
  in floating point, which is order-sensitive).
- Timestamps: never emit a raw timestamp column; emit
  ``date_format(...)`` strings or epoch integers.
- Collections: emit sorted arrays or string-joined sorted arrays.
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
# Raw money columns in the fixtures are exactly 2-decimal (verified at
# sf0.1), so casting them to DECIMAL(12,2) is lossless; products of
# D2-cast factors stay exact in decimal ((12,2)*(12,2)->(25,4),
# *(12,2)->(38,6)) — never round a multi-factor double to decimal, the
# tie-rounding differs between Spark (HALF_UP) and DuckDB.
D2 = "decimal(12,2)"

# Narrow decimal images (optimization round 13, guide §2.3 "narrower
# types ... only when provably safe"): Spark stores a Decimal compactly
# in a long only while precision <= 18 — and SUM's accumulator gets
# operand precision + 10 — so a sum over operands wider than
# precision 8 runs every per-row add through serialized BigDecimal in
# the aggregation buffer. Measured on the flagship aggregate: the
# narrow operand set below cuts the single-task aggregation pass ~40%
# with BIT-IDENTICAL outputs (same scale → same HALF_UP cast rounding;
# exactness verified cell-by-cell at sf0.001/0.01/0.1).
#
# Domain preconditions (each verified over every fixture SF, and loud
# on violation — ANSI mode is Spark 4's default and DuckDB always
# errors, so an out-of-domain value fails the query rather than
# corrupting it):
#   D2_MONEY: 2-decimal money columns < 10^6 (TPC-H price domain is
#     generator-bounded at ~10^5.03; o_totalprice < 10^5.75). The
#     (18,2) sum accumulator holds 10^16 cents — at TPC-H sf100000
#     (~100 TB) the largest per-group price sum is ~6·10^15, inside
#     the ceiling; beyond that, widen back to DEC.
#   D2_QTY: quantity-like columns < 10^4 (l_quantity <= 50).
#   D4_VALUE: <10^4 measures (events.value < 10^3) at scale 4 — the
#     SAME scale as DEC, so the cast rounds identically for ANY input
#     in range, not just 2-decimal ones.
#   D2_FACTOR: unit factors in [0,10) (1±discount/tax).
D2_MONEY = "decimal(8,2)"
D2_QTY = "decimal(6,2)"
D4_VALUE = "decimal(8,4)"
D2_FACTOR = "decimal(3,2)"


def money(c: Column) -> Column:
    """Lossless decimal image of a 2-decimal money/qty double column."""
    return c.cast(D2)


def dsum(c: Column, alias: str, scale: int = 4, dec: str = DEC) -> Column:
    """Order-insensitive SUM of a double column, rounded, as double.

    ``dec`` may be narrowed to one of the domain-verified images above
    when the column's value domain provably fits (guide §2.3) — the
    value is unchanged, the aggregation buffer stays long-backed."""
    return F.round(F.sum(c.cast(dec)).cast("double"), scale).alias(alias)


def dsum_dec(c: Column, alias: str, scale: int = 4) -> Column:
    """SUM of an already-exact decimal expression, rounded double."""
    return F.round(F.sum(c).cast("double"), scale).alias(alias)


def davg(c: Column, alias: str, scale: int = 6, dec: str = DEC) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, rounded double."""
    return F.round(F.sum(c.cast(dec)).cast("double") / F.count(c), scale).alias(alias)


def sql_sum(x: str, alias: str, scale: int = 4, dec: str = "DECIMAL(18,4)") -> str:
    return f"ROUND(CAST(SUM(CAST({x} AS {dec})) AS DOUBLE), {scale}) AS {alias}"


def sql_money(x: str, dec: str = "DECIMAL(12,2)") -> str:
    return f"CAST({x} AS {dec})"


def sql_sum_dec(x: str, alias: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM({x}) AS DOUBLE), {scale}) AS {alias}"


def sql_avg(x: str, alias: str, scale: int = 6, dec: str = "DECIMAL(18,4)") -> str:
    return (
        f"ROUND(CAST(SUM(CAST({x} AS {dec})) AS DOUBLE)"
        f" / COUNT({x}), {scale}) AS {alias}"
    )


def fmt_ts(c: Column, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (tz-safe, ns-safe)."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)


def sql_fmt_ts(x: str, alias: str) -> str:
    return f"strftime({x}, '%Y-%m-%d %H:%M:%S') AS {alias}"


def driver_scalar(df):
    """Fetch ONE row of a global aggregate to the driver.

    This is the sanctioned driver-side fetch for scalar control flow
    (adaptive sizing, refusal guards): callers must pass a frame that
    is a global aggregate — one row by construction, metadata-scale
    at any corpus size. Kept as a named choke point so the plan tests
    can exempt scalar fetches while still failing any op that pulls
    query DATA through DataFrame.collect (see
    tests/test_plans.py::test_gemm_ops_never_collect_to_driver).
    """
    rows = df.collect()
    if len(rows) != 1:
        raise AssertionError(
            f"driver_scalar expects a 1-row global aggregate, got "
            f"{len(rows)} rows"
        )
    return rows[0]


def round_ratio6(p: Column, q: Column) -> Column:
    """Exact HALF-UP 6-digit rounding of the POSITIVE integer ratio
    p/q, emitted as a double — the cross-engine answer to ROUND
    half-ties (round-12 sf0.1 soak): a small-integer ratio can land
    exactly on x.xxxxxx5, where Spark rounds half-up and DuckDB
    half-even. floor((2p·10⁶ + q) / 2q) computes the half-up rounding
    in pure int64 via Spark's integral ``div`` (IntegralDivide —
    true 64-bit division, no double conversion), so exactness holds
    whenever 2p·10⁶ + q fits int64 (p < ~4.6·10¹²); the final /10⁶
    maps the same integer to the same double in both engines. SQL
    twin: sql_ratio6."""
    num = p.cast("long") * F.lit(2000000) + q.cast("long")
    den = q.cast("long") * F.lit(2)
    quot = F.call_function("div", num, den)
    return quot.cast("double") / F.lit(1000000.0)


def sql_ratio6(p: str, q: str) -> str:
    """DuckDB-oracle twin of round_ratio6 (`//` floor-divides
    BIGINTs; all inputs positive)."""
    return (
        f"CAST((2 * ({p}) * 1000000 + ({q})) // (2 * ({q})) AS DOUBLE)"
        " / 1000000.0"
    )


def lit_array_sql(values) -> str:
    """SQL text of a nested numeric ARRAY literal — see lit_array for
    the type-pinning rules. Exposed separately so larger hand-written
    F.expr() expressions can inline constant arrays without paying
    per-element py4j construction either."""

    def enc(v) -> str:
        if isinstance(v, bool):
            raise TypeError("lit_array is for numeric literals")
        if isinstance(v, int):
            return str(v) if -2147483648 <= v <= 2147483647 else f"{v}L"
        if isinstance(v, float):
            return f"{v!r}D"
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(enc(x) for x in v) + ")"
        raise TypeError(f"lit_array: unsupported element {type(v)!r}")

    return enc(list(values))


def lit_array(values) -> Column:
    """Nested numeric ARRAY literal built as ONE parsed SQL expression
    instead of one ``F.lit``/``F.array`` py4j round trip per element
    (optimization round 13): a 48x64 plane matrix costs ~3 000 py4j
    calls (~1 ms each of driver latency) the literal-text form does
    not. Value- and type-identical to the F.array(*[F.lit(v) ...])
    construction it replaces: ints in int32 range render bare (INT,
    as py4j maps them), wider ints render with the L suffix (BIGINT),
    floats render as repr()+D — repr round-trips exactly through
    Java's correctly-rounded Double.parseDouble, and the D suffix pins
    DoubleType (a bare decimal literal would parse as DECIMAL)."""
    return F.expr(lit_array_sql(values))
