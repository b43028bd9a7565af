"""Unit tests for the pure-Python Avro OCF codec + DataSource
(plankton_spark/sources/avro_ocf.py)."""

from __future__ import annotations

import io
import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from plankton_spark.sources import avro_ocf
from tests.conftest import SF0001  # noqa: F401  (shared session fixture import)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_zigzag_varint_roundtrip(n):
    buf = io.BytesIO()
    avro_ocf.write_long(buf, n)
    buf.seek(0)
    assert avro_ocf.read_long(buf) == n


SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": "double"},
        {"name": "b", "type": "boolean"},
    ],
}

ROWS = [
    (1, "alpha", 1.5, True),
    (2, None, -0.25, False),
    (3, "émoji ✓", 2.0**-40, True),
    (4, "", 1e300, False),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_codecs(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    n = avro_ocf.write_ocf(p, SCHEMA, ROWS, codec=codec)
    assert n == len(ROWS)
    assert list(avro_ocf.read_ocf(p)) == ROWS


def test_ocf_multiblock_and_header(tmp_path):
    p = str(tmp_path / "blocks.avro")
    rows = [(i, f"s{i}", i / 7.0, i % 2 == 0) for i in range(1000)]
    avro_ocf.write_ocf(p, SCHEMA, rows, block_rows=64)  # forces 16 blocks
    schema, codec, sync, offset = avro_ocf.read_ocf_header(p)
    assert schema == json.loads(json.dumps(SCHEMA))
    assert codec == "deflate"
    assert len(sync) == 16
    with open(p, "rb") as f:
        assert f.read(4) == avro_ocf.MAGIC
    assert list(avro_ocf.read_ocf(p)) == rows


def test_ocf_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "corrupt.avro")
    avro_ocf.write_ocf(p, SCHEMA, ROWS)
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # clobber last sync byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        list(avro_ocf.read_ocf(p))


def test_spark_datasource_roundtrip(spark, tmp_path):
    avro_ocf.register(spark)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "c", -1.0)],
        "k long, s string, x double",
    )
    path = str(tmp_path / "ds")
    df.write.format("pyavro").option("path", path).mode("overwrite").save()
    files = [e for e in os.listdir(path) if e.endswith(".avro")]
    assert files and not any(e.startswith(".") for e in files)
    back = spark.read.format("pyavro").option("path", path).load()
    assert back.schema.simpleString() == df.schema.simpleString()
    assert sorted(back.collect()) == sorted(df.collect())


def test_spark_datasource_overwrite_replaces(spark, tmp_path):
    avro_ocf.register(spark)
    path = str(tmp_path / "ow")
    a = spark.range(10).select("id")
    b = spark.range(3).select("id")
    a.write.format("pyavro").option("path", path).mode("overwrite").save()
    b.write.format("pyavro").option("path", path).mode("overwrite").save()
    back = spark.read.format("pyavro").option("path", path).load()
    assert back.count() == 3


def test_unsupported_type_rejected(spark, tmp_path):
    avro_ocf.register(spark)
    df = spark.createDataFrame([([1, 2],)], "arr array<int>")
    with pytest.raises(Exception, match="unsupported Spark type"):
        df.write.format("pyavro").option("path", str(tmp_path / "bad")).mode(
            "overwrite"
        ).save()


def test_impl_gate_auto_falls_back_to_python(spark):
    """No spark-avro jar in this environment → auto resolves python."""
    assert avro_ocf.jvm_avro_available(spark) is False
    assert avro_ocf.resolve_impl(spark) == "python"


def test_impl_gate_forced_jvm_without_jar_raises(spark):
    spark.conf.set(avro_ocf.IMPL_CONF, "jvm")
    try:
        with pytest.raises(RuntimeError, match="classpath"):
            avro_ocf.resolve_impl(spark)
    finally:
        spark.conf.unset(avro_ocf.IMPL_CONF)


def test_impl_gate_auto_prefers_jvm_when_present(spark, monkeypatch):
    monkeypatch.setattr(avro_ocf, "jvm_avro_available", lambda s: True)
    assert avro_ocf.resolve_impl(spark) == "jvm"
    spark.conf.set(avro_ocf.IMPL_CONF, "python")
    try:
        # explicit python wins even with the jar present
        assert avro_ocf.resolve_impl(spark) == "python"
    finally:
        spark.conf.unset(avro_ocf.IMPL_CONF)


def test_impl_gate_invalid_value_rejected(spark):
    spark.conf.set(avro_ocf.IMPL_CONF, "nope")
    try:
        with pytest.raises(ValueError, match="auto|jvm|python"):
            avro_ocf.resolve_impl(spark)
    finally:
        spark.conf.unset(avro_ocf.IMPL_CONF)


def test_write_read_helpers_roundtrip(spark, tmp_path):
    path = str(tmp_path / "helpers_avro")
    df = spark.range(20).select(F.col("id").alias("k"))
    used = avro_ocf.write_avro(spark, df, path)
    assert used == "python"
    back = avro_ocf.read_avro(spark, path)
    assert sorted(r.k for r in back.collect()) == list(range(20))
