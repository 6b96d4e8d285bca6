"""Partitioning/skew behavior of the explicit repartition (north_rule:
"partitioning / shuffle / skew handled explicitly").

A Zipf-skewed crawl means one host can contribute a huge share of rows; a
host-keyed shuffle would pile them on one executor.  The pipeline keys by
xxhash64(full url) (+ size salt), so rows spread uniformly regardless of
host skew.  This test constructs the pathological case — EVERY row from
one host — and asserts the distribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _one_host_pages(spark, n=20000):
    return spark.range(n).select(
        F.concat(F.lit("https://hot-host.example/page/"), F.col("id")).alias("url"),
        F.lit(None).cast("binary").alias("html"),
        # size-skewed: 1% of docs are ~100x larger
        F.when(F.col("id") % 100 == 0, F.expr("repeat('x', 5000)"))
        .otherwise(F.expr("repeat('y', 50)"))
        .alias("text"),
    )


def _partition_counts(df):
    return {
        r["pid"]: r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    }


def test_salted_repartition_spreads_hot_host(spark):
    from pdf_extraction_spark.operators.extract import salted_repartition

    pages = _one_host_pages(spark)
    parts = _partition_counts(salted_repartition(pages, 16, salt_buckets=8))
    assert len(parts) == 16  # every partition participates
    mean = 20000 / 16
    assert max(parts.values()) < 1.3 * mean, parts
    assert min(parts.values()) > 0.7 * mean, parts

    # the naive host-keyed shuffle this replaces: everything lands together
    host_keyed = pages.repartition(
        16, F.xxhash64(F.regexp_extract("url", r"https://([^/]+)/", 1))
    )
    naive = _partition_counts(host_keyed)
    assert max(naive.values()) == 20000  # one partition takes the whole host


def test_salted_repartition_spreads_giant_docs(spark):
    """Bytes (not just rows) distribute: the size salt keeps a run of giant
    documents from stacking onto few partitions."""
    from pdf_extraction_spark.operators.extract import salted_repartition

    pages = _one_host_pages(spark)
    by_part = (
        salted_repartition(pages, 16, salt_buckets=8)
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum(F.length("text")).alias("bytes"))
        .collect()
    )
    sizes = [r["bytes"] for r in by_part]
    assert len(sizes) == 16
    assert max(sizes) < 2.0 * (sum(sizes) / len(sizes)), sizes
