"""Temporal join operators Spark lacks natively, built scale-first.

as-of join: the classic "latest right row at or before each left row's
timestamp, per key" (trades-vs-quotes, event attribution).  The naive
formulation — equi-join on key + ts filter + argmax — explodes to
|L|x|R| per key before pruning.  The scale-safe shape used here is the
UNION + WINDOW construction: tag both inputs, union them, and take the
running `last(right_payload, ignorenulls)` over (key, ts) order.  ONE
shuffle (the window partition on key), zero join expansion, and skew
behaves like any keyed window (salt the key upstream if one key owns the
timeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def _assert_no_reserved(reserved: tuple[str, ...], *dfs: DataFrame) -> None:
    """The join constructions stage work in internal columns; an input
    that already carries one of those names would silently collide and
    corrupt results — fail fast instead."""
    for df in dfs:
        clash = sorted(set(df.columns) & set(reserved))
        if clash:
            raise ValueError(
                f"input columns {clash} collide with reserved internal "
                f"names {sorted(reserved)}; rename them before the join"
            )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """For each left row: the right row with the greatest ts <= left.ts
    (inclusive) sharing the join key; right columns come back
    null when no prior right row exists (left-outer as-of semantics,
    matching DuckDB's ``ASOF LEFT JOIN`` on ``l.ts >= r.ts``).

    ``right`` must be unique per (on, ts) — at-equal-ts ties are
    otherwise resolved arbitrarily; pre-aggregate the right side if its
    key is not unique.

    Output: every left column, plus ``{prefix}{ts_col}`` and
    ``{prefix}{c}`` for each c in right_cols.
    """
    _assert_no_reserved(("_k", "_ts", "_side", "_l", "_r", "_rm"), left, right)
    r_payload = [ts_col] + list(right_cols)
    l_struct = StructType([StructField(f.name, f.dataType, True) for f in left.schema])
    r_struct = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in r_payload]
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )
    # right rows with the same ts sort BEFORE the left row (_side 0 < 1),
    # so an exactly-simultaneous right row is visible — inclusive >=
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_rm", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        "_l.*",
        *[F.col(f"_rm.{c}").alias(f"{prefix}{c}") for c in r_payload],
    )


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    prefix: str = "iv_",
) -> DataFrame:
    """Point-in-interval join ("which events fall inside which windows")
    as an EQUI-join: without this construction Spark plans a range join
    as BroadcastNestedLoopJoin — |P| x |I| work per key.

    Each point has exactly ONE time bucket (floor(epoch/bucket)); each
    interval is replicated to every bucket it overlaps (sequence +
    explode, JVM-side).  The equi-join on (key, bucket) then meets every
    containment pair exactly once — points own a single bucket, so no
    dedup pass is needed — and the exact ``start <= ts <= end`` filter
    runs only on bucket-collocated pairs.  Pick ``bucket_seconds`` near
    the typical interval length: replication factor = interval span /
    bucket + 1.

    Output: every point column, plus each interval column prefixed.
    """
    _assert_no_reserved(("_bkt", "_ik"), points, intervals)
    p = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    )
    iv = intervals.select(
        F.col(on).alias("_ik"),
        *[F.col(c).alias(f"{prefix}{c}") for c in intervals.columns if c != on],
    )
    iv = iv.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(f"{prefix}{start_col}")) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(f"{prefix}{end_col}")) / bucket_seconds),
            )
        ),
    )
    joined = p.join(iv, (p[on] == iv["_ik"]) & (p["_bkt"] == iv["_bkt"]))
    return (
        joined.filter(
            (F.col(ts_col) >= F.col(f"{prefix}{start_col}"))
            & (F.col(ts_col) <= F.col(f"{prefix}{end_col}"))
        )
        .drop("_bkt", "_ik")
    )
