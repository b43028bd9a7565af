"""Skew-telemetry tests (VERDICT r2 #9): observe()-instrumented key
width metrics for the dedup/ANN operators, recorded in the run
ledger so a skew regression fails CI instead of surfacing as a
straggler at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plankton_spark.framework.ledger import RunLedger
from plankton_spark.framework.skewwatch import (
    fuzzy_block_skew,
    gemm_cell_skew,
    hh_candidate_skew,
    key_width_skew,
    lsh_bucket_skew,
    span_bucket_skew,
)
from plankton_spark.queries.llm_dedup import LSH_BUCKET_CAP, SPAN_STOP_CAP
from plankton_spark.queries.llm_text import FUZZY_BLOCK_CAP
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


def test_span_bucket_skew_under_stop_cap(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "ledger.jsonl"))
    rec = span_bucket_skew(spark, SF0001, ledger)
    assert rec["n_keys"] > 0  # the fixture does contain duplicated spans
    # no boilerplate span may exceed the stop-span cap: the self-join
    # fan-out per bucket is width^2, so a wide bucket is the scale bug
    assert rec["n_wide"] == 0, rec
    assert rec["max_width"] <= SPAN_STOP_CAP
    assert list(ledger.records())[0]["op"] == "span_bucket_skew"


def test_hh_candidate_set_within_budget(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "ledger.jsonl"))
    rec = hh_candidate_skew(spark, SF0001, ledger)
    # the broadcast recount join is only valid while the candidate set
    # respects the MG bound of partitions x capacity rows
    assert 0 < rec["n_keys"] <= rec["candidate_budget"], rec
    assert list(ledger.records())[0]["op"] == "hh_candidate_skew"


def test_fuzzy_block_skew_no_degenerate_block(spark, tmp_path):
    ledger = RunLedger(str(tmp_path / "ledger.jsonl"))
    rec = fuzzy_block_skew(spark, SF0001, ledger)
    assert rec["n_keys"] > 1  # >1 block: the key is discriminating
    # a degenerate block key (all names in one bucket) must trip here
    assert rec["n_wide"] == 0, rec
    assert rec["max_width"] <= FUZZY_BLOCK_CAP
    assert list(ledger.records())[0]["op"] == "fuzzy_block_skew"
