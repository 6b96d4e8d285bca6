"""asof_join_backward semantics: inclusivity at equal ts, null when no
prior right row, per-key isolation, and plan shape (one window shuffle,
no join node)."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


def test_asof_backward_semantics(spark):
    from pdf_extraction_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [
            (1, 100, _ts(10), 5.0),   # before any right row -> null match
            (2, 100, _ts(20), 6.0),   # exactly at a right ts -> inclusive
            (3, 100, _ts(35), 7.0),   # between right rows -> latest prior
            (4, 200, _ts(50), 8.0),   # other key: must not see key 100
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(20), 1.0),
            (100, _ts(30), 2.0),
            (100, _ts(40), 3.0),
            (200, _ts(49), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join_backward(
        left, right, on="user_id", ts_col="ts", right_cols=["value"]
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert got[1]["matched_ts"] is None and got[1]["matched_value"] is None
    assert got[2]["matched_ts"] == _ts(20) and got[2]["matched_value"] == 1.0
    assert got[3]["matched_ts"] == _ts(30) and got[3]["matched_value"] == 2.0
    assert got[4]["matched_ts"] == _ts(49) and got[4]["matched_value"] == 9.0


def test_asof_plan_has_no_join(spark):
    """The union+window construction must not plan a join (the naive
    equi-join + argmax shape explodes per key at scale)."""
    from pdf_extraction_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(1, 1, _ts(1), 1.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 1.0)], "user_id long, ts timestamp, value double"
    )
    plan = (
        asof_join_backward(left, right, on="user_id", ts_col="ts", right_cols=["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # exactly the window shuffle
