"""Seeded randomized cross-checks: the distributed implementations of the
as-of join, interval join, and connected components are compared against
brute-force Python references on randomized (but deterministic, seed=7)
inputs large enough to exercise ties, empty keys, and multi-bucket spans.

One Spark job per operator (hypothesis-per-example would pay Spark's
job-launch latency hundreds of times for the same coverage).
"""

from __future__ import annotations

import datetime as dt
import random


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=int(s))


def test_asof_join_vs_bruteforce(spark):
    rng = random.Random(7)
    left = [
        (i, rng.randrange(12), _ts(rng.randrange(0, 5000)), float(i))
        for i in range(300)
    ]
    right = []
    used = set()
    for j in range(300):
        k = (rng.randrange(12), rng.randrange(0, 5000))
        if k in used:
            continue  # keep (key, ts) unique as the operator requires
        used.add(k)
        right.append((k[0], _ts(k[1]), float(1000 + j)))

    from pdf_extraction_spark.operators.joins import asof_join_backward

    ldf = spark.createDataFrame(
        left, "event_id long, user_id long, ts timestamp, value double"
    )
    rdf = spark.createDataFrame(right, "user_id long, ts timestamp, value double")
    got = {
        r["event_id"]: (r["matched_ts"], r["matched_value"])
        for r in asof_join_backward(
            ldf, rdf, on="user_id", ts_col="ts", right_cols=["value"]
        ).collect()
    }
    for event_id, key, ts, _ in left:
        cands = [(rts, rv) for rk, rts, rv in right if rk == key and rts <= ts]
        want = max(cands) if cands else (None, None)
        assert got[event_id] == want, f"event {event_id}"


def test_interval_join_vs_bruteforce(spark):
    rng = random.Random(7)
    points = [
        (i, rng.randrange(8), _ts(rng.randrange(0, 3000))) for i in range(250)
    ]
    intervals = []
    for j in range(60):
        start = rng.randrange(0, 2800)
        intervals.append(
            (rng.randrange(8), j, _ts(start), _ts(start + rng.randrange(1, 400)))
        )

    from pdf_extraction_spark.operators.joins import interval_join_bucketed

    pdf = spark.createDataFrame(points, "event_id long, user_id long, ts timestamp")
    idf = spark.createDataFrame(
        intervals,
        "user_id long, signup_id long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r["event_id"], r["iv_signup_id"])
        for r in interval_join_bucketed(
            pdf, idf, on="user_id", ts_col="ts",
            start_col="start_ts", end_col="end_ts", bucket_seconds=100,
        ).collect()
    )
    want = sorted(
        (eid, sid)
        for eid, pk, pts in points
        for ik, sid, s, e in intervals
        if pk == ik and s <= pts <= e
    )
    assert got == want


def test_components_vs_union_find(spark):
    rng = random.Random(7)
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.randrange(80), rng.randrange(80)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    from pdf_extraction_spark.operators.dedup import dedup_components

    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_components(pdf).collect()}
    assert got == want
