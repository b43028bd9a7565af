"""timestampNtz Delta table feature: protocol declaration on create,
value-preserving NTZ round-trip across session timezones, evolution
refusal without the feature, and reader-gate acceptance."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plankton_spark.io import read_table
from tests.conftest import SF0001


def _ntz_df(spark):
    rows = [
        (1, datetime.datetime(2024, 3, 1, 23, 30, 0)),
        (2, datetime.datetime(2024, 7, 4, 0, 15, 0)),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("wall", T.TimestampNTZType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_create_declares_feature_and_roundtrips(spark, tmp_path):
    import json
    import os

    from plankton_spark.sources.delta_log import DeltaLogWriter, read_delta

    root = str(tmp_path / "ntz")
    DeltaLogWriter(spark, root).create(_ntz_df(spark))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    prot = next(a["protocol"] for a in actions if "protocol" in a)
    assert prot["minReaderVersion"] == 3 and prot["minWriterVersion"] == 7
    assert "timestampNtz" in prot["readerFeatures"]
    assert "timestampNtz" in prot["writerFeatures"]
    assert {"appendOnly", "invariants"} <= set(prot["writerFeatures"])

    out = read_delta(spark, root)
    assert isinstance(out.schema["wall"].dataType, T.TimestampNTZType)
    got = {r["id"]: r["wall"] for r in out.collect()}
    assert got[1] == datetime.datetime(2024, 3, 1, 23, 30, 0)
    assert got[2] == datetime.datetime(2024, 7, 4, 0, 15, 0)


def test_ntz_values_timezone_invariant(spark, tmp_path):
    """NTZ is wall-clock: reading under a different session timezone
    must return the SAME naive datetime (an LTZ column would shift)."""
    from plankton_spark.sources.delta_log import DeltaLogWriter, read_delta

    root = str(tmp_path / "tzswap")
    DeltaLogWriter(spark, root).create(_ntz_df(spark))
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = {r["id"]: r["wall"] for r in read_delta(spark, root).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert got[1] == datetime.datetime(2024, 3, 1, 23, 30, 0)


def test_plain_table_keeps_legacy_protocol(spark, tmp_path):
    import json
    import os

    from plankton_spark.sources.delta_log import DeltaLogWriter

    root = str(tmp_path / "plain")
    o = read_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).where(F.col("o_orderkey") < 300)
    DeltaLogWriter(spark, root).create(o)
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    prot = next(a["protocol"] for a in actions if "protocol" in a)
    assert prot == {"minReaderVersion": 1, "minWriterVersion": 2}


def test_evolution_refuses_ntz_without_feature(spark, tmp_path):
    from plankton_spark.sources.delta_log import (
        DeltaLogWriter,
        DeltaProtocolError,
    )

    root = str(tmp_path / "evo")
    o = read_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).where(F.col("o_orderkey") < 300)
    w = DeltaLogWriter(spark, root)
    w.create(o)
    evolved = o.withColumn(
        "wall", F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    )
    with pytest.raises(DeltaProtocolError, match="timestampNtz"):
        w.append(evolved, merge_schema=True)


def test_append_ntz_on_featured_table(spark, tmp_path):
    from plankton_spark.sources.delta_log import DeltaLogWriter, read_delta

    root = str(tmp_path / "app")
    w = DeltaLogWriter(spark, root)
    w.create(_ntz_df(spark))
    more = _ntz_df(spark).withColumn("id", F.col("id") + 10)
    w.append(more)
    assert read_delta(spark, root).count() == 4
