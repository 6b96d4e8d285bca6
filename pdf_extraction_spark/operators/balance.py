"""Under-split input guard for expensive Arrow-batched kernels.

Every codec/extraction operator in this engine is an embarrassingly
parallel per-document kernel (``mapInPandas`` with no shuffle).  That
plan is exactly right at crawl scale, where the scan itself yields
thousands of input splits — but ``mapInPandas`` can never run wider
than its input partitioning, and a small parquet file with a single
row group (or any unsplittable input: one gzip member, one tiny file)
yields ONE split, serializing the whole kernel onto one core while the
rest of the cluster idles.

``rebalance_if_undersplit`` is the standard Spark remedy ("repartition
before an expensive UDF when the scan under-splits"): when — and only
when — the input's partition count is below the cluster's default
parallelism, insert one round-robin Exchange ahead of the kernel.  The
data moved is the operator's (small) input rows, never the kernel's
output.  At 100 TB the scan provides >= cores splits and the guard is
a no-op: no Exchange appears in the plan, preserving the shuffle-free
scale shape (asserted both ways in tests/test_plan_quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_if_undersplit(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's default
    parallelism iff its current partitioning is narrower.  Streaming
    DataFrames and anything whose partition count cannot be probed are
    returned unchanged."""
    try:
        if df.isStreaming:
            return df
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
    except Exception:
        pass
    return df
