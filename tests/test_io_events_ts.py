"""Regression tests for events.ts physical-encoding handling: the
driver's fixture generator has shipped TIMESTAMP(NANOS) (readable only
as epoch-nanos long) and TIMESTAMP(MICROS) NTZ across rounds; harden
the two normalization points (io.read_table and the streaming source)
against every encoding a parquet writer can emit — ns, µs/ms (NTZ and
UTC-adjusted), and legacy INT96 — so the next fixture regeneration
cannot repeat round 4's bench crash."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from plankton_spark.io import read_table
from plankton_spark.streaming.jobs import _events_ts_encoding, _normalized_events_stream


TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 1),
    datetime.datetime(2024, 1, 1, 0, 0, 2),
]

# encoding label -> (arrow ts type, write kwargs)
ENCODINGS = {
    "us": (pa.timestamp("us"), {}),
    "ns": (pa.timestamp("ns"), {}),
    "ms": (pa.timestamp("ms"), {}),
    "us_utc": (pa.timestamp("us", tz="UTC"), {}),
    "ms_utc": (pa.timestamp("ms", tz="UTC"), {}),
    "int96": (pa.timestamp("ns"), {"use_deprecated_int96_timestamps": True}),
}


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


def _write_fixture(d, enc):
    d.mkdir()
    ts_type, kwargs = ENCODINGS[enc]
    tbl = _events_table(pa.array(TS, ts_type))
    pq.write_table(tbl, str(d / "events.parquet"), **kwargs)
    return str(d / "events.parquet")


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_read_table_normalizes_every_ts_encoding(spark, tmp_path, enc):
    d = tmp_path / f"fixture_{enc}"
    _write_fixture(d, enc)
    df = read_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == TS  # session tz is UTC → values preserved exactly


def test_encoding_probe_classification(tmp_path):
    expected = {
        "us": "ntz",
        "ms": "ntz",
        "ns": "ns-long",
        "us_utc": "ltz",
        "ms_utc": "ltz",
        "int96": "ltz",  # pyarrow shows INT96 as timestamp[ns]; must NOT route to the long branch
    }
    for enc, want in expected.items():
        f = _write_fixture(tmp_path / f"probe_{enc}", enc)
        assert _events_ts_encoding(f) == want, enc


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_streaming_source_normalizes_every_ts_encoding(spark, tmp_path, enc):
    d = tmp_path / f"stream_{enc}"
    src = _write_fixture(d, enc)
    stream = _normalized_events_stream(spark, str(d), src)
    assert stream.schema["ts"].dataType.simpleString() == "timestamp"
    q = (
        stream.writeStream.format("memory")
        .queryName(f"ts_enc_{enc}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["ts"] for r in spark.sql(f"select ts from ts_enc_{enc}").collect()
    )
    assert got == TS
