"""Deterministic sampling / mixing operators for training-data assembly.

Both operators are reproducible by construction (md5-derived decisions,
no RNG state) so a re-run — or a resumed job — selects the identical
subset, and both have exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_extraction_spark.functions.text import tokens


def hash_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_bp: dict[str, int],
    *,
    default_bp: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    ``md5hash(id) % 10000 < rate_bp[stratum]`` (rates in basis points).

    This is the standard "mixing weights" primitive: upsample/downsample
    each source to its target share without an RNG.  Scan-local (no
    shuffle, no UDF); the keep-predicate pushes into the scan.  The
    md5-derived hash is uniform and engine-portable, so the DuckDB twin
    selects the byte-identical subset.
    """
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % 10000
    )
    rate = F.lit(default_bp)
    for stratum, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.filter(h < rate)


def token_budget_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    strata_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Per-stratum greedy token-budget packing: walk each stratum in id
    order, keep documents while the running token total stays within
    ``budget_tokens`` — the epoch-budgeting step of corpus assembly.

    One shuffle (the window partition on the stratum); the running sum is
    a single window pass.  Deterministic order = deterministic pack.
    Output: (id, stratum, n_tokens, cum_tokens) for kept docs.
    """
    n = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(strata_col),
            n.cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the context-window chunking step of training-data prep.

    Starts advance by ``chunk_tokens - overlap``; the final window is the
    (possibly short) tail.  Pure JVM expressions: tokens are let-bound so
    the per-chunk slice does not re-tokenize (CollapseProject would
    otherwise inline the split() once per chunk), and explode turns the
    chunk array into rows.  No shuffle; parallelism = scan splits.

    Output: (id, chunk_id, chunk_start, chunk_n_tokens, chunk_text).
    """
    from pdf_extraction_spark.functions.text import let_bound

    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def chunks(ts):
        n = F.size(ts)
        # ceil((n - overlap) / step), floored at 1 for any non-empty doc
        # (a doc shorter than the overlap still yields its single chunk)
        n_chunks = F.greatest(
            F.lit(1), (F.floor((n - F.lit(overlap) - 1) / step) + 1).cast("int")
        )
        arr = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.struct(
                c.alias("chunk_id"),
                (c * step).alias("chunk_start"),
                F.least(F.lit(chunk_tokens), n - c * step).alias("chunk_n_tokens"),
                F.array_join(
                    F.slice(ts, c * step + 1, chunk_tokens), " "
                ).alias("chunk_text"),
            ),
        )
        # split('') yields [''], so n >= 1 always; the n<=0 guard exists
        # only for defensive symmetry (sequence(0,-1) would DESCEND)
        return F.when(n <= 0, F.slice(arr, 1, 0)).otherwise(arr)

    exploded = df.select(
        F.col(id_col),
        F.explode(let_bound(tokens(F.col(text_col)), chunks)).alias("c"),
    )
    return exploded.select(
        id_col,
        F.col("c.chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk_start").cast("long").alias("chunk_start"),
        F.col("c.chunk_n_tokens").cast("long").alias("chunk_n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
