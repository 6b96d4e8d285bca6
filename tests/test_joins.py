"""asof_join_backward semantics: inclusivity at equal ts, null when no
prior right row, per-key isolation, and plan shape (one window shuffle,
no join node)."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


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


def test_interval_join_boundaries_and_buckets(spark):
    from pdf_extraction_spark.operators.joins import interval_join_bucketed

    # interval [10s, 70s] spans several 30s buckets; points at the exact
    # boundaries are inclusive, just outside is excluded
    points = spark.createDataFrame(
        [(1, 7, _ts(9)), (2, 7, _ts(10)), (3, 7, _ts(40)),
         (4, 7, _ts(70)), (5, 7, _ts(71)), (6, 8, _ts(40))],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, 100, _ts(10), _ts(70))],
        "user_id long, signup_id long, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join_bucketed(
        points, intervals, on="user_id", ts_col="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=30,
    )
    assert sorted(r["event_id"] for r in out.collect()) == [2, 3, 4]


def test_interval_join_plans_equi_join(spark):
    """The bucketized construction must produce a hash/merge equi-join,
    never the BroadcastNestedLoopJoin a raw range predicate plans."""
    from pdf_extraction_spark.operators.joins import interval_join_bucketed

    points = spark.createDataFrame(
        [(1, 7, _ts(9))], "event_id long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, 1, _ts(1), _ts(99))],
        "user_id long, signup_id long, start_ts timestamp, end_ts timestamp",
    )
    plan = interval_join_bucketed(
        points, intervals, on="user_id", ts_col="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=30,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_reserved_internal_names_rejected(spark):
    """Inputs already carrying an internal staging column must raise, not
    silently corrupt the construction."""
    import pytest

    from pdf_extraction_spark.operators.joins import (
        asof_join_backward,
        interval_join_bucketed,
    )

    left = spark.createDataFrame(
        [(1, 100, _ts(10), 0)], "event_id long, user_id long, ts timestamp, _ts long"
    )
    right = spark.createDataFrame(
        [(100, _ts(5), 1.0)], "user_id long, ts timestamp, px double"
    )
    with pytest.raises(ValueError, match="_ts"):
        asof_join_backward(
            left, right, on="user_id", ts_col="ts", right_cols=["px"]
        )

    points = spark.createDataFrame(
        [(1, 7, _ts(9), 0)], "event_id long, user_id long, ts timestamp, _bkt long"
    )
    intervals = spark.createDataFrame(
        [(7, _ts(1), _ts(99))],
        "user_id long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(ValueError, match="_bkt"):
        interval_join_bucketed(
            points, intervals, on="user_id", ts_col="ts",
            start_col="start_ts", end_col="end_ts", bucket_seconds=30,
        )
