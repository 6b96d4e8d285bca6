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
