"""Regression tests for events.ts physical-encoding handling: the
driver's fixture generator has shipped both TIMESTAMP(NANOS) (readable
only as epoch-nanos long) and TIMESTAMP(MICROS); io.read_table and the
streaming source must normalize either to µs TimestampType."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from plankton_spark.io import read_table


TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 1),
    datetime.datetime(2024, 1, 1, 0, 0, 2),
]


def _events_table(ts_array):
    return pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_read_table_normalizes_both_ts_encodings(spark, tmp_path, unit):
    d = tmp_path / f"fixture_{unit}"
    d.mkdir()
    tbl = _events_table(pa.array(TS, pa.timestamp(unit)))
    pq.write_table(tbl, str(d / "events.parquet"))
    df = read_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == TS  # session tz is UTC → values preserved exactly
