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
    'w1 w2 … wn' strings — the order-sensitive form (winnowing needs it).

    The token array is let-bound: the per-position slice would otherwise
    re-evaluate the split() once per gram position."""

    def build(ts):
        grams = F.transform(
            F.sequence(F.lit(0), F.size(ts) - n),
            lambda j: F.array_join(F.slice(ts, j + 1, n), " "),
        )
        return F.when(F.size(ts) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return let_bound(toks, build)


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-grams (set semantics — Jaccard/MinHash form)."""
    return F.array_distinct(word_ngrams_all(toks, n))


def content_fingerprint(text_col: str = "text") -> Column:
    """md5 of the whitespace-normalized, lowercased RAW text — THE shared
    exact-dup identity of the engine (exact-dup = raw byte equality up to
    case/whitespace).

    Batch incremental dedup (``incremental_new_docs``), the bucketed
    corpus writer (``write_fingerprint_corpus``), streaming dedup
    (``stream_dedup``), and the curation pipeline's dedup key AND
    commit-group key are all built from THIS one expression.  Their
    correctness depends on agreeing byte-for-byte (duplicates must land
    in the same commit group / state bucket / corpus bucket), so the
    expression lives in exactly one place — never re-inline it.
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def hash60(col) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5, base-16 parsed.

    Portable: DuckDB twin is CAST(('0x' || substr(md5(x),1,15)) AS UBIGINT).
    60 bits always fits a signed BIGINT in both engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def minhash_coeffs(num_perms: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_p, b_p), derived from
    md5 at plan-build time and embedded as literals in BOTH the Spark plan
    and the DuckDB oracle SQL. a_p < 2^31, gram hash < 2^32, so
    a*h + b < 2^63 — no overflow in either engine (Spark 4 runs ANSI)."""
    import hashlib

    out = []
    for p in range(num_perms):
        a = 1 + int(hashlib.md5(f"minhash-a:{p}".encode()).hexdigest()[:8], 16) % (
            2**31 - 1
        )
        b = int(hashlib.md5(f"minhash-b:{p}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out


def hash32(col) -> Column:
    """32-bit hash: first 8 hex chars of md5 (DuckDB twin:
    CAST(('0x' || substr(md5(x),1,8)) AS UBIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def let_bound(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``body`` as a bound variable.

    Catalyst's CollapseProject inlines intermediate projections, so an
    "already materialized" array column gets recomputed at every reference
    in the next select — quadratic for window-min / per-perm folds over an
    md5-hashed gram array (verified: winnowing went 205s -> seconds at
    sf0.1).  ``transform(array(v), x -> body(x))[1]`` is the standard
    let-binding: the lambda variable holds the evaluated value.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def minhash_signature(hashes: Column, num_perms: int) -> Column:
    """MinHash signature over a PRE-HASHED gram array (``array<long>``).

    Each gram is md5-hashed ONCE (hash32); permutation p is the universal
    hash (a_p*h + b_p) mod PRIME — plain long arithmetic per perm instead
    of a fresh md5, which is ~16x less hashing at num_perms=16.
    """
    def sig(hs):
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        hs,
                        lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME),
                    )
                )
                for a, b in minhash_coeffs(num_perms)
            ]
        )

    return let_bound(hashes, sig)


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

    The hashes expression is let-bound (evaluated once), because the outer
    per-bit fold references it 60 times and CollapseProject would otherwise
    inline and recompute the token-hash transform per bit.
    """
    return (
        f"element_at(transform(array({hashes_expr}), hs -> "
        "aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) -> acc + "
        "(CASE WHEN aggregate(hs, CAST(0 AS BIGINT), (s, h) -> s + "
        "(CASE WHEN (shiftright(h, j) & 1) = 1 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(-1 AS BIGINT) END)) > 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END))"
        "), 1)"
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
