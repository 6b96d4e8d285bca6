"""Approximate-nearest-neighbor search over an embedding column.

* brute_force_topk — exact cosine top-k: the correctness baseline.  The
  query side is small by construction, so Spark broadcasts it; candidates
  stream through a single projection + window, no all-pairs shuffle.
* bucketed_topk — the scale path: restrict candidates to a coarse bucket
  (IVF cell id, LSH bucket, or any precomputed partition key).  At 10^12
  rows the bucket join prunes candidate sets by orders of magnitude while
  the per-bucket math is identical to the baseline.
* lsh_bucket — deterministic random-hyperplane LSH bucket id, derived from
  md5-seeded ±1 projections (no model state to ship, reproducible across
  engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_extraction_spark.functions.text import hash60
from pdf_extraction_spark.functions.vectors import cosine


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query row: (query_id, neighbor_id, rank).

    Ties break on neighbor id, so ranks are fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    # broadcast the small query side; candidates never shuffle
    scored = v.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Top-k within the query's coarse bucket (IVF-style candidate pruning)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(bucket_col).alias("bucket"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(bucket_col).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_bucket(vec_col, num_planes: int = 8, dim: int = 64):
    """Random-hyperplane LSH bucket id (0 .. 2^num_planes - 1).

    Plane p's weight for dimension d is +1 if bit 0 of
    hash60('p|<p>|d|<d>') else -1 — deterministic, engine-portable, no
    stored model.  Bucket bit p = (dot(vec, plane_p) > 0).
    """
    def plane_dot(p):
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.element_at(vec_col, d + 1).cast("double")
                * F.when(
                    hash60(
                        F.concat(
                            F.lit("p|"),
                            p.cast("string"),
                            F.lit("|d|"),
                            d.cast("string"),
                        )
                    ).bitwiseAND(F.lit(1))
                    == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        F.lit(0),
        lambda acc, p: acc
        + F.when(plane_dot(p) > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)),
    )
