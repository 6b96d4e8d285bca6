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
