"""Branch tests for warehouse.py + graph triangles — properties the
oracle gate can't distinguish (a shared bug would pass parity):
SCD2 version pairing, drift sensitivity on a constructed shift, and
an independent Python triangle count.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from plankton_spark.registry import all_queries
from tests.conftest import SF001


def test_scd2_version_pairing(spark):
    rows = all_queries()["q_merge_scd2"](spark, SF001).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["c_custkey"], []).append(r)
    assert len(by_cust) > 100
    n_changed = 0
    for k, rs in by_cust.items():
        assert k % 3 == 0
        versions = sorted(r["version"] for r in rs)
        if len(rs) == 1:
            # untouched: single current v1 with the original segment
            assert versions == [1]
            assert rs[0]["is_current"] is True
            assert rs[0]["segment"] != "UPGRADED"
        else:
            # changed: v1 expired + v2 current UPGRADED
            n_changed += 1
            assert versions == [1, 2]
            v = {r["version"]: r for r in rs}
            assert v[1]["is_current"] is False
            assert v[2]["is_current"] is True
            assert v[2]["segment"] == "UPGRADED"
            assert v[1]["segment"] != "UPGRADED"
    assert n_changed > 10


def _write_events(spark, tmpdir, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")


def test_drift_zero_on_identical_halves(spark, tmp_path):
    """Same bucket histogram in both halves → tvd exactly 0."""
    rows = []
    for half, day in ((0, 5), (1, 20)):
        for i in range(100):
            rows.append(
                (
                    half * 1000 + i,
                    datetime.datetime(2024, 1, day, 12, 0, 0),
                    i,
                    "click",
                    float((i % 10) * 10 + 5),  # buckets 0..9 uniformly
                    "{}",
                )
            )
    _write_events(spark, tmp_path, rows)
    out = all_queries()["q_drift_tvd"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_before"] == 100 and r["n_after"] == 100
    assert r["tvd"] == 0.0


def test_drift_detects_full_shift(spark, tmp_path):
    """Disjoint buckets between halves → tvd exactly 1."""
    rows = []
    for i in range(50):
        rows.append(
            (i, datetime.datetime(2024, 1, 3, 8, 0, 0), i, "view", 5.0, "{}")
        )  # bucket 0
    for i in range(80):
        rows.append(
            (
                1000 + i,
                datetime.datetime(2024, 1, 25, 8, 0, 0),
                i,
                "view",
                95.0,
                "{}",
            )
        )  # bucket 9
    _write_events(spark, tmp_path, rows)
    out = all_queries()["q_drift_tvd"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["tvd"] == 1.0
    assert out[0]["n_buckets"] == 2


def test_drift_overflow_bucket_clamps(spark, tmp_path):
    """Values past 90 all land in bucket 9 (LEAST clamp)."""
    rows = [
        (1, datetime.datetime(2024, 1, 3, 8, 0, 0), 1, "x", 95.0, "{}"),
        (2, datetime.datetime(2024, 1, 3, 8, 0, 0), 2, "x", 480.0, "{}"),
        (3, datetime.datetime(2024, 1, 25, 8, 0, 0), 3, "x", 150.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = all_queries()["q_drift_tvd"](spark, str(tmp_path)).collect()
    # one shared bucket → identical (degenerate) distributions
    assert out[0]["n_buckets"] == 1 and out[0]["tvd"] == 0.0


def test_triangles_match_python_bruteforce(spark):
    """Independent adjacency-set triangle count over the SAME edge
    set the query builds (collected once; ~2.5k edges at sf0.01)."""
    from plankton_spark.io import table_view

    table_view(spark, SF001, "lineitem")
    edges = spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey AS pk, l_suppkey AS sk
          FROM lineitem WHERE l_partkey % 13 = 0
          GROUP BY l_partkey, l_suppkey
        ),
        deg AS (SELECT pk FROM ps GROUP BY pk HAVING COUNT(*) <= 20)
        SELECT DISTINCT a.sk AS s1, b.sk AS s2
        FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
        JOIN deg ON a.pk = deg.pk
        """
    ).collect()
    adj: dict[int, set] = {}
    for r in edges:
        adj.setdefault(r["s1"], set()).add(r["s2"])
    n_tri = 0
    checksum = 0
    for a, nbrs in adj.items():
        for b in nbrs:
            common = nbrs & adj.get(b, set())
            n_tri += len(common)
            for c in common:
                checksum += a + b + c
    out = all_queries()["q_graph_triangles"](spark, SF001).collect()[0]
    assert out["n_edges"] == len(edges)
    assert out["n_triangles"] == n_tri > 0
    assert out["vertex_checksum"] == checksum


def test_mad_exact_median_odd_and_even(spark, tmp_path):
    """Hand-derived median/MAD for odd AND even counts — the branch
    class a shared interpolation bug would pass through oracle
    parity. Values in cents space; med2x = 2x median, mad4x = 4x MAD."""
    ts = datetime.datetime(2024, 1, 5, 8, 0, 0)
    # odd group: cents {1,2,3,4,100} → median 3 cents → med2x = 6;
    # dev2x = |2c-6| = {4,2,0,2,194}, sorted {0,2,2,4,194}; odd count
    # takes the middle (2) twice → mad4x = 4 (i.e. MAD = 1 cent)
    rows = [
        (i, ts, i, "odd", float(v), "{}")
        for i, v in enumerate([0.01, 0.02, 0.03, 0.04, 1.00])
    ]
    # even group: values 1,2,3,4 cents → median 2.5 → med2x = 5
    # dev2x = |2c-5| → {3,1,1,3} sorted {1,1,3,3} two-middle = 1+3=4
    rows += [
        (100 + i, ts, i, "even", float(v), "{}")
        for i, v in enumerate([0.01, 0.02, 0.03, 0.04])
    ]
    from tests.test_warehouse import _write_events

    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in all_queries()["q_anomaly_mad"](spark, str(tmp_path)).collect()
    }
    odd, even = out["odd"], out["even"]
    assert odd["n_events"] == 5
    assert odd["median2x_cents"] == 6      # 2 x 3 cents
    # dev2x values: {|2-6|,|4-6|,|6-6|,|8-6|,|200-6|} = {4,2,0,2,194}
    # sorted {0,2,2,4,194}, middle (n=5) = 2 taken twice → mad4x = 4
    assert odd["mad4x_cents"] == 4
    # outlier rule: 2*dev2x > 3*mad4x=12 → dev2x > 6 → only 194
    assert odd["n_outliers"] == 1
    assert even["n_events"] == 4
    assert even["median2x_cents"] == 5     # 2 x 2.5 cents
    assert even["mad4x_cents"] == 4        # 1 + 3
    # 2*dev2x > 12 → dev2x > 6 → none of {1,1,3,3}
    assert even["n_outliers"] == 0


def test_rolling_dau_window_semantics(spark, tmp_path):
    """Hand-derived rolling 7-day distinct counts: a user active on
    day d covers window-ends d..d+6; ends exist only for days with
    any activity."""
    ts = datetime.datetime
    rows = [
        # user 1 active day 0 (Jan 1), user 2 active day 0 and day 8
        (1, ts(2024, 1, 1, 10, 0, 0), 1, "click", 1.0, "{}"),
        (2, ts(2024, 1, 1, 11, 0, 0), 2, "click", 1.0, "{}"),
        (3, ts(2024, 1, 9, 11, 0, 0), 2, "click", 1.0, "{}"),
        # user 3 active day 5 (Jan 6)
        (4, ts(2024, 1, 6, 9, 0, 0), 3, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["day_index"]: r["rolling_7d_users"]
        for r in all_queries()["q_win_rolling_dau"](
            spark, str(tmp_path)
        ).collect()
    }
    # ends exist only for active days: 0, 5, 8
    assert set(out) == {0, 5, 8}
    assert out[0] == 2        # users 1,2 (day-0 activity)
    assert out[5] == 3        # users 1,2 (day 0 covers 0..6) + user 3
    assert out[8] == 2        # user 3 (day 5 covers 5..11) + user 2 (day 8)
