"""Shared parquet-footer statistics helpers for the table formats
(planktable, Delta log, Iceberg) — one encoder, one footer reader, so
a fix to either reaches every format (the round-6 review found two
parallel implementations drifting: table_format's lacked the
bytes-decode branch delta_log's had).
"""

from __future__ import annotations


def stat_encode(v):
    """JSON-safe stat value: timestamps/dates become ISO-8601 strings
    (lexicographic == chronological, so range compares stay correct —
    callers comparing against these must encode their bounds the same
    way); bytes decode to str or drop to None (unusable as a stat)."""
    import datetime

    if isinstance(v, bytes):
        try:
            return v.decode()
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def file_stats(path: str) -> dict:
    """Delta-spec per-file stats from the parquet footer (no data IO):
    {"numRecords", "minValues", "maxValues", "nullCount"}."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            try:
                s = col.statistics
                if s is None:
                    continue
                nulls[name] = nulls.get(name, 0) + (s.null_count or 0)
                if not s.has_min_max:
                    continue
                mn, mx = stat_encode(s.min), stat_encode(s.max)
            except Exception:
                continue
            if mn is None or mx is None:
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return {
        "numRecords": md.num_rows,
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": nulls,
    }
