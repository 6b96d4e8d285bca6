"""Vector (embedding) column functions — JVM-side higher-order expressions.

Floats are cast to double BEFORE any arithmetic and accumulated with a
LEFT fold from 0.0, so results are bit-identical to the DuckDB oracle
(IEEE ops are deterministic given identical operand order; 0.0 + x == x).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
