"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs each registered query on Spark AND its oracle SQL on DuckDB over
the same fixture dir, then compares: row count, column names, and an
order-insensitive exact value comparison (strictly stronger than the
driver's value-hash — if this passes, any sane hash matches).

Usage:
    python tools/check_queries.py [--sf DIR] [names...]
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from plankton_spark.io import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        # the driver's fixtures are single files; gen_sf.py scale-up
        # fixtures are Spark DIRECTORY outputs — glob the parts then
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{path}')"
        )
    return con


def canon(v) -> str:
    """Canonical string per cell; exact for floats (repr round-trips bits)."""
    if v is None:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "<null>" if math.isnan(f) else repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT or v is pd.NA:
        return "<null>"
    return str(v)


def normalize(df: pd.DataFrame) -> tuple[list[str], list[str]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["\x1f".join(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return cols, sorted(rows)


@dataclass
class Result:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = 0
    oracle_rows: int = -1
    diffs: list[str] = field(default_factory=list)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> Result:
    s_cols, s_rows = normalize(spark_pdf)
    d_cols, d_rows = normalize(duck_pdf)
    r = Result(name, True, spark_rows=len(s_rows), oracle_rows=len(d_rows))
    if s_cols != d_cols:
        r.ok = False
        r.detail = f"columns differ: spark={s_cols} duckdb={d_cols}"
        return r
    if len(s_rows) != len(d_rows):
        r.ok = False
        r.detail = f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    # hoist the set builds: putting set(...) in the comprehension's
    # condition re-evaluates it PER ELEMENT — O(n²), which turned the
    # sf0.1 soak's 120k-row outputs into ~20 min/query (round-12
    # finding; invisible at sf0.01's small results)
    d_set, s_set = set(d_rows), set(s_rows)
    only_s = [x for x in s_rows if x not in d_set]
    only_d = [x for x in d_rows if x not in s_set]
    if only_s or only_d:
        r.ok = False
        if not r.detail:
            r.detail = f"values differ ({len(only_s)} spark-only / {len(only_d)} duckdb-only)"
        for x in only_s[:3]:
            r.diffs.append("spark : " + x.replace("\x1f", " | "))
        for x in only_d[:3]:
            r.diffs.append("duckdb: " + x.replace("\x1f", " | "))
    return r


def run_one(spark, con, name: str, fn, oracle: str | None, sf_dir: str) -> Result:
    try:
        spark_pdf = fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return Result(name, False, detail=f"SPARK ERROR: {type(e).__name__}: {e}")
    if oracle is None:
        ok = True  # rows-only check: just require it ran
        return Result(name, ok, detail="rows-only (no oracle)", spark_rows=len(spark_pdf))
    try:
        duck_pdf = con.execute(oracle).fetchdf()
    except Exception as e:  # noqa: BLE001
        return Result(name, False, detail=f"DUCKDB ERROR: {type(e).__name__}: {e}")
    return compare(name, spark_pdf, duck_pdf)
