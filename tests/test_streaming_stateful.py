"""Event-time + stateful streaming semantics:

* watermarked tumbling-window aggregation drops rows later than the
  watermark and matches the batch computation for on-time data;
* applyInPandasWithState sessionizer emits closed sessions identical to
  the batch gap-sessionization for sessions that are provably closed.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest


def _write_events(dir_path, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(dir_path, name))


def _t(m, s=0):
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m, seconds=s)


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    """Append-mode event-time windows: a window finalizes exactly once
    when the watermark passes its end, and a row arriving after that is
    dropped (visible in numRowsDroppedByWatermark), not merged."""
    import time

    from pdf_extraction_spark.streaming.ingest import stream_windowed_counts

    inp = str(tmp_path / "in")
    # batch 0: on-time events; max ts 0:10 -> watermark 0:08 from batch 1 on
    _write_events(
        inp,
        "b1.parquet",
        [
            (1, _t(0, 10), 1, "click", 1.0),
            (2, _t(0, 40), 1, "click", 2.0),
            (3, _t(1, 10), 2, "view", 3.0),
            (4, _t(10, 0), 3, "click", 4.0),
        ],
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic file->batch order
    # batch 1: watermark 0:08 > window ends 0:01/0:02 -> both finalize+evict
    _write_events(inp, "b2.parquet", [(6, _t(11, 0), 3, "click", 5.0)])
    time.sleep(1.1)
    # batch 2: arrives AFTER its window was finalized -> must be dropped
    _write_events(inp, "b3.parquet", [(5, _t(0, 30), 1, "click", 100.0)])

    out = stream_windowed_counts(
        spark, inp, window_seconds=60, watermark_seconds=120, max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    # finalized windows exclude the late row; each emitted exactly once
    assert final[(_t(0, 0), "click")] == (2, 3.0)
    assert final[(_t(1, 0), "view")] == (1, 3.0)
    # tail windows (0:10/0:11) never finalize (watermark stops at 0:09)
    assert (_t(10, 0), "click") not in final
    # the drop is observable in the state-operator metrics
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_stateful_sessionize_matches_batch_for_closed_sessions(spark, tmp_path):
    from pdf_extraction_spark.streaming.ingest import stream_sessionize

    inp = str(tmp_path / "in")
    gap = 600  # 10 min
    # user 1: events at 0:00 and 0:05 (one session), then 1:00 (> gap ->
    # closes session 1, opens session 2).  user 2: single event at 0:00,
    # then 2:00 closes it.
    _write_events(
        inp,
        "b1.parquet",
        [
            (1, _t(0), 1, "click", 0.0),
            (2, _t(5), 1, "click", 0.0),
            (3, _t(0), 2, "view", 0.0),
        ],
    )
    import time

    time.sleep(1.1)  # distinct mtimes -> deterministic file->batch order
    _write_events(
        inp,
        "b2.parquet",
        [
            (4, _t(60), 1, "click", 0.0),
            (5, _t(120), 2, "view", 0.0),
        ],
    )
    out = stream_sessionize(spark, inp, gap_seconds=gap, max_files_per_trigger=1)
    # NOTE: availableNow + ProcessingTimeTimeout never self-terminates —
    # Spark keeps scheduling no-data micro-batches to service the pending
    # state timeouts.  Poll the sink for the expected closed sessions,
    # then stop the query explicitly (and ALWAYS stop: a leaked query
    # would keep burning CPU under every later test).
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        # generous: late in a full-suite run the JVM is under GC/codegen
        # pressure and no-data timeout batches can lag well past 90 s
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            if spark.sql("SELECT count(*) FROM sessions").collect()[0][0] >= 2:
                break
            time.sleep(1)
        got = {
            (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
    finally:
        q.stop()
    # sessions provably CLOSED by a later event:
    assert got[(1, _t(0))] == (_t(5), 2)
    assert got[(2, _t(0))] == (_t(0), 1)
