"""Deduplication operators for large-scale training-data pipelines.

All four families are implemented Spark-first (declarative DataFrame ops,
no Python in the hot path) and designed for 100 TB scale:

* exact:          one shuffle on the content hash, map-side partial agg.
* MinHash + LSH:  signatures/bands are per-row JVM expressions (no
                  shuffle); the candidate join shuffles on band keys only.
                  Bucket sizes are NOT naturally bounded — short or highly
                  similar documents can collapse one band onto thousands of
                  docs (measured: one bucket held 834 of 10k docs = 85% of
                  all candidate pairs), so `max_bucket` drops degenerate
                  buckets before the self-join; their members are still
                  covered by the other bands and by exact dedup.
                  Verification runs only on candidates, never all pairs.
* SimHash:        per-row 60-bit fingerprint; near-dup = same fingerprint
                  bucket (or small Hamming radius via banding).
* n-gram Jaccard: exact pairwise check, to be used only inside a blocking
                  key (LSH candidates or small blocks) — the quadratic path
                  is the verifier, not the discovery mechanism.
* embedding cosine: see operators/similarity.py (shared kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_extraction_spark.functions.text import (
    band_keys,
    hash32,
    hash60,
    minhash_signature,
    simhash_from_hashes,
    tokens,
    word_ngrams,
)
from pdf_extraction_spark.functions.vectors import cosine


def exact_dedup(
    df: DataFrame, id_col: str, key
) -> DataFrame:
    """Exact dedup on a content key: one row per key, keep min(id).

    Returns (dedup_key, keep_id, dup_count).  Single hash-shuffle on the
    key; Catalyst does map-side partial aggregation automatically.
    """
    return (
        df.select(F.col(id_col).alias("_id"), key.alias("dedup_key"))
        .groupBy("dedup_key")
        .agg(
            F.min("_id").alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    block_cols: list[str] | None = None,
    num_threshold: int = 1,
    den_threshold: int = 2,
) -> DataFrame:
    """All pairs (within blocking keys) with n-gram Jaccard >= num/den.

    The threshold is a rational (integer) comparison —
        den * |A ∩ B|  >=  num * |A ∪ B|
    — so there is no float anywhere; results are engine-exact.
    Output: (id_a, id_b, inter_size, union_size), id_a < id_b.
    """
    grams = df.select(
        F.col(id_col).alias("_id"),
        *(block_cols or []),
        word_ngrams(tokens(F.col(text_col)), n).alias("grams"),
        F.size(word_ngrams(tokens(F.col(text_col)), n)).alias("_sz"),
    ).filter(F.col("_sz") > 0)

    a = grams.alias("a")
    b = grams.alias("b")
    cond = F.col(f"a._id") < F.col("b._id")
    for c in block_cols or []:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    pairs = a.join(b, cond)
    # grams are distinct sets, so |A∪B| = |A| + |B| - |A∩B| — one array
    # pass per pair instead of two (the pair count is the quadratic term)
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    return (
        pairs.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            inter.alias("inter_size"),
            (F.col("a._sz") + F.col("b._sz") - inter).alias("union_size"),
        )
        .filter(
            F.col("inter_size") * den_threshold >= F.col("union_size") * num_threshold
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_perms: int = 16,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs: (id_a, id_b), id_a < id_b.

    shingle -> minhash -> band -> bucket-join.  At scale: signatures and
    band keys are computed per-row (no shuffle); posexplode to (band_key)
    rows; self-join shuffles on band_key only.  distinct() collapses pairs
    that collide in several bands.  ``max_bucket`` (strongly recommended at
    scale) drops band buckets larger than the cap before pair generation —
    a degenerate bucket of k docs otherwise emits k^2/2 pairs.
    """
    grams = df.select(
        F.col(id_col).alias("_id"),
        word_ngrams(tokens(F.col(text_col)), n).alias("grams"),
    ).filter(F.size("grams") > 0)
    return _lsh_candidates_from_grams(grams, num_perms, bands, max_bucket)


def _lsh_candidates_from_grams(
    grams: DataFrame, num_perms: int, bands: int, max_bucket: int | None = None
) -> DataFrame:
    from pyspark.sql import Window

    rows_per_band = num_perms // bands
    # Hash each gram ONCE into array<long> in its own projection, then build
    # the signature from the hashes (per-perm arithmetic only — no repeated
    # md5).  Materialize the (id, band_key) rows so the self-join does not
    # recompute the signature per side.
    hashed = grams.select("_id", F.transform("grams", hash32).alias("_hashes"))
    sig = hashed.select(
        "_id",
        F.explode(
            band_keys(
                minhash_signature(F.col("_hashes"), num_perms), bands, rows_per_band
            )
        ).alias("band_key"),
    )
    if max_bucket is not None:
        # one count-window over the band partitioning (same shuffle the
        # self-join needs anyway); degenerate buckets never reach the join
        bc = F.count("*").over(Window.partitionBy("band_key"))
        sig = sig.withColumn("_bc", bc).filter(F.col("_bc") <= max_bucket).drop("_bc")
    sig = sig.persist()
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_perms: int = 16,
    bands: int = 4,
    num_threshold: int = 1,
    den_threshold: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified by exact Jaccard.

    Verification joins the candidate pairs back to the gram sets — the
    quadratic check runs on candidates only (the 100 TB-safe shape).
    """
    grams = df.select(
        F.col(id_col).alias("_id"),
        word_ngrams(tokens(F.col(text_col)), n).alias("grams"),
    ).filter(F.size("grams") > 0).persist()
    cand = _lsh_candidates_from_grams(grams, num_perms, bands, max_bucket)
    ga = grams.select(F.col("_id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("_id").alias("id_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter_size"),
            union.alias("union_size"),
        )
        .filter(
            F.col("inter_size") * den_threshold >= F.col("union_size") * num_threshold
        )
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 60-bit SimHash per document, fully JVM-side.

    Token hashes are materialized in a first projection so the 60-bit fold
    reads them once, not once per bit position.
    """
    hashed = df.select(
        F.col(id_col).alias("_id"),
        F.transform(tokens(F.col(text_col)), hash60).alias("_hashes"),
    )
    return hashed.select("_id", simhash_from_hashes("_hashes").alias("simhash"))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs >= threshold (within optional block).

    The blocked join is the scale path: at 100 TB, `block_col` is a coarse
    quantizer (IVF cell / LSH bucket); unblocked all-pairs is test-only.
    """
    cols = [F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    v = df.select(*cols)
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cosine(F.col("a._vec"), F.col("b._vec")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
