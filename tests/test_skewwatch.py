"""Skew-telemetry tests (VERDICT r2 #9): observe()-instrumented key
width metrics for the dedup/ANN operators, recorded in the run
ledger so a skew regression fails CI instead of surfacing as a
straggler at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.skewwatch import (
    gemm_cell_skew,
    key_width_skew,
    lsh_bucket_skew,
)
from plankton_spark.queries.llm_dedup import LSH_BUCKET_CAP
from tests.conftest import SF0001


def test_key_width_skew_exact_values(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "ledger.jsonl"))
    # 3 keys with widths 1, 3, 6
    df = spark.createDataFrame(
        [(k,) for k, w in ((0, 1), (1, 3), (2, 6)) for _ in range(w)], "k int"
    )
    rec = key_width_skew(df, ["k"], op="unit", ledger=ledger, cap=4)
    assert rec["max_width"] == 6
    assert rec["n_keys"] == 3
    assert rec["n_wide"] == 1  # only width-6 exceeds cap 4
    assert rec["max_guarded_width"] == 4
    rows = list(ledger.records())
    assert len(rows) == 1 and rows[0]["op"] == "unit"
    assert rows[0]["kind"] == "skew_metrics" and rows[0]["max_width"] == 6


def test_lsh_bucket_skew_recorded_and_guarded(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "ledger.jsonl"))
    rec = lsh_bucket_skew(spark, SF0001, ledger)
    assert rec["n_keys"] > 0
    assert rec["cap"] == LSH_BUCKET_CAP
    # the sub-bucket guard bounds every candidate-join cell
    assert rec["max_guarded_width"] <= LSH_BUCKET_CAP
    saved = list(ledger.records())[0]
    assert saved["op"] == "lsh_bucket_skew"
    assert saved["max_width"] == rec["max_width"]


def test_gemm_cell_skew_within_2x_ideal(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "ledger.jsonl"))
    rec = gemm_cell_skew(spark, SF0001, ledger)
    assert rec["n_keys"] > 0
    # block hash must not degenerate: every cell within 2x ideal share
    assert rec["n_wide"] == 0, rec
    assert list(ledger.records())[0]["op"] == "gemm_cell_skew"
