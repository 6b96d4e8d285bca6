"""Spark-side extraction operator: Arrow-batched ``mapInPandas`` around the
pure-Python kernels (pdf_extraction_spark.kernel).

Design (SURVEY §1.4, §3): one row = one document end-to-end through the
UDF — pages/lines of a document never cross a partition boundary, because
the F10/F12 semantics are order-sensitive *within* a document and the
per-document function is pure, so partitioning can never change content.
The Spark plan around this node is fully declarative (scan → prune →
repartition → ArrowEvalPython → sink) and Catalyst prunes the fat `html`
binary column out of the parquet scan whenever a caller selects only
text-layer columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pdf_extraction_spark.operators.balance import rebalance_if_undersplit

FIELD_PAIR = StructType(
    [StructField("field", StringType()), StructField("value", StringType())]
)
SPAN = StructType(
    [
        StructField("label", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]
)
EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("doc_kind", StringType()),
        StructField("extracted_text", StringType()),
        StructField("fields", ArrayType(FIELD_PAIR)),
        StructField("page_fields", ArrayType(ArrayType(FIELD_PAIR))),
        StructField("spans", ArrayType(SPAN)),
        StructField("error", StringType()),
    ]
)

_COLS = ["url", "doc_kind", "extracted_text", "fields", "page_fields", "spans", "error"]


def _pairs(items):
    if items is None:
        return None
    return [{"field": f, "value": v} for f, v in items]


def _extract_batches(batches: Iterator[pd.DataFrame], max_doc_chars=None) -> Iterator[pd.DataFrame]:
    # import inside the worker so the kernel module pickles by name
    from pdf_extraction_spark.kernel import extract_document

    for pdf in batches:
        # columnar accumulation: building a DataFrame from per-column lists
        # is several times faster than from a list of per-row dicts, and
        # this is the hottest loop of the flagship metric (docs/sec)
        c_url, c_kind, c_text, c_fields, c_pages, c_spans, c_err = (
            [], [], [], [], [], [], []
        )
        for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
            url, kind, etext, fields, page_fields, spans, err = extract_document(
                url, html if html is not None else None, text, max_doc_chars
            )
            c_url.append(url)
            c_kind.append(kind)
            c_text.append(etext)
            c_fields.append(_pairs(fields))
            c_pages.append(
                None if page_fields is None else [_pairs(p) for p in page_fields]
            )
            c_spans.append(
                None
                if spans is None
                else [{"label": l, "start": s, "end": e} for l, s, e in spans]
            )
            c_err.append(err)
        yield pd.DataFrame(
            {
                "url": c_url,
                "doc_kind": c_kind,
                "extracted_text": c_text,
                "fields": c_fields,
                "page_fields": c_pages,
                "spans": c_spans,
                "error": c_err,
            },
            columns=_COLS,
        )


def extract_documents(pages: DataFrame, max_doc_chars: int | None = None) -> DataFrame:
    """pages(url, html, text, ...) -> extraction records (EXTRACT_SCHEMA).

    Selects only the three columns the kernel needs, so Catalyst prunes
    everything else (incl. `warc_ts`/`lang`) out of the source scan.
    ``max_doc_chars``: per-document input-size cap; oversize documents land
    on the ``error`` column (F18) instead of stalling a worker.
    """
    import functools

    fn = functools.partial(_extract_batches, max_doc_chars=max_doc_chars)
    return rebalance_if_undersplit(pages.select("url", "html", "text")).mapInPandas(
        fn, schema=EXTRACT_SCHEMA
    )


KV_LONG_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("field", StringType()),
        StructField("value", StringType()),
        StructField("ord", IntegerType()),
    ]
)


def _kv_long_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pdf_extraction_spark.kernel import extract_fields_direct

    for pdf in batches:
        ids, fields, values, ords = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            pairs = extract_fields_direct(text or "")
            if not pairs:
                continue
            for i, (f, v) in enumerate(pairs):
                ids.append(doc_id)
                fields.append(f)
                values.append(v)
                ords.append(i)
        yield pd.DataFrame(
            {"doc_id": ids, "field": fields, "value": values, "ord": ords}
        )


def extract_fields_long(df: DataFrame, id_col, text_col) -> DataFrame:
    """Kernel-backed KV extraction to long format: (doc_id, field, value, ord).

    ``ord`` is the field's first-occurrence position (F10 column order).
    The id rides through the Arrow exchange as a string and is restored by
    the caller if needed.
    """
    src = df.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    return rebalance_if_undersplit(src).mapInPandas(_kv_long_batches, schema=KV_LONG_SCHEMA)


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 0) -> DataFrame:
    """Explicit skew-aware repartition (north_rule requirement).

    Key = xxhash64(url) — uniform over documents regardless of host skew
    (Zipf hosts share no key because the full url is unique).  When rows
    are *size*-skewed (a handful of huge documents), add a deterministic
    secondary salt derived from the document size so giant docs spread
    across `salt_buckets` extra partitions instead of stacking up.
    """
    key = F.xxhash64("url")
    if salt_buckets > 1:
        size_col = F.coalesce(
            F.length("text").cast("long"), F.length("html").cast("long"), F.lit(0)
        )
        key = F.xxhash64("url", (size_col % salt_buckets).cast("string"))
    return df.repartition(num_partitions, key)



def skew_profile(
    df: DataFrame,
    key_col: str,
    id_col: str,
    *,
    size_col: str | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Per-key skew diagnosis feeding the salting decision: how unevenly do
    rows (and bytes) pile onto each partition key, and how flat does a
    ``salt_buckets``-way salt make the worst key?

    Two shuffles, both over aggregated data: groupBy(key) and
    groupBy(key, salt) — never a row-level wide operation.  The grand
    total is a 1-row aggregate broadcast back over the per-key rows (NOT
    an over-() window, which would collapse all rows onto one partition).
    The salt is md5-derived from the row id — deterministic and
    engine-portable, the same bucketing a salted repartition would use.
    All metrics are integers; share_bp is basis points of the total
    (truncating division, `div` in Spark == `//` in DuckDB for
    non-negative operands).
    """
    key = F.col(key_col).alias("key")
    sz = (F.length(size_col) if size_col else F.lit(1)).cast("long")
    per_key = (
        df.select(key, sz.alias("sz"))
        .groupBy("key")
        .agg(F.count("*").alias("n_rows"), F.sum("sz").alias("n_bytes"))
    )
    totals = per_key.agg(F.sum("n_rows").alias("total_rows"))
    salt = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % salt_buckets
    )
    salted = (
        df.select(key, salt.alias("salt"))
        .groupBy("key", "salt")
        .agg(F.count("*").alias("bn"))
        .groupBy("key")
        .agg(F.max("bn").alias("max_salted_bucket"))
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .join(salted, "key")
        .select(
            F.col("key").alias(key_col),
            "n_rows",
            "n_bytes",
            F.expr("n_rows * 10000 div total_rows").alias("share_bp"),
            "max_salted_bucket",
        )
    )
