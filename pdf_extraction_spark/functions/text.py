"""Column-level text functions — pure Spark SQL expressions (JVM-side,
whole-stage-codegen friendly; no Python in the hot path).

Every function here has an exact DuckDB-SQL twin used by the driver's
oracle comparison, so the arithmetic is chosen to be engine-portable:
integer math where possible, md5-derived 60-bit hashes (both engines parse
15 hex chars identically), left-fold accumulation for any float work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed stopword list shared with the DuckDB oracle (keep sorted, tiny).
STOPWORDS = ["a", "and", "in", "of", "the"]


def tokens(col) -> Column:
    """Whitespace tokenization; matches regexp_split_to_array(trim(x),'\\s+')."""
    return F.split(F.trim(col), r"\s+")


def n_tokens(col) -> Column:
    return F.size(tokens(col))


def stopword_hits(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))


def word_ngrams_all(toks: Column, n: int) -> Column:
    """All word n-grams in position order (duplicates kept) as
    'w1 w2 … wn' strings — the order-sensitive form (winnowing needs it)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda j: F.array_join(F.slice(toks, j + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-grams (set semantics — Jaccard/MinHash form)."""
    return F.array_distinct(word_ngrams_all(toks, n))


def hash60(col) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5, base-16 parsed.

    Portable: DuckDB twin is CAST(('0x' || substr(md5(x),1,15)) AS UBIGINT).
    60 bits always fits a signed BIGINT in both engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signature(grams: Column, num_perms: int) -> Column:
    """MinHash signature: perm p's hash of gram g = hash60(p || '|' || g).

    A classic 'k independent hash functions via seed-prefixing' scheme —
    entirely JVM-side via higher-order functions; no UDF.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perms - 1)),
        lambda p: F.array_min(
            F.transform(
                grams, lambda g: hash60(F.concat(p.cast("string"), F.lit("|"), g))
            )
        ),
    )


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: band b's key = md5 of its signature slice + band id."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat(
                b.cast("string"),
                F.lit(":"),
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
            )
        ),
    )


def simhash_sql(hashes_expr: str) -> str:
    """60-bit SimHash as a Spark SQL expression string over a long-array
    column/expression (duplicate tokens weighted).

    bit j of the fingerprint is 1 iff sum over hashes of
    (+1 if bit j of the hash else -1) is > 0 (strict).  Pure integer math
    -> bit-identical across engines.

    This is a SQL string (not a Column builder) because shiftright with a
    non-literal shift amount is only reachable through the SQL parser —
    the PySpark `F.shiftright` wrapper requires a Python int.
    """
    return (
        "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) -> acc + "
        f"(CASE WHEN aggregate({hashes_expr}, CAST(0 AS BIGINT), (s, h) -> s + "
        "(CASE WHEN (shiftright(h, j) & 1) = 1 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(-1 AS BIGINT) END)) > 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END))"
    )


def simhash_from_hashes(hashes_col: str) -> Column:
    """SimHash Column from a materialized array<long> column name."""
    return F.expr(simhash_sql(hashes_col))


def hamming_sql(a_expr: str, b_expr: str) -> str:
    """Hamming distance between two 60-bit fingerprints (SQL string;
    popcount via bit-position fold)."""
    return (
        "aggregate(sequence(0, 59), 0, (acc, j) -> acc + "
        f"CAST((shiftright({a_expr} ^ {b_expr}, j) & 1) AS INT))"
    )


def hamming60(a_col: str, b_col: str) -> Column:
    return F.expr(hamming_sql(a_col, b_col))
