"""Dedup / similarity operator tests.

Covers what the driver-contract oracles cannot see:
  * RECALL under the `max_bucket` degenerate-bucket cap — the cap drops
    candidate pairs from over-cap buckets (a documented recall trade-off,
    and the DuckDB oracle applies the identical cap, so implementation-vs-
    twin equality alone would not notice a recall collapse).  This test
    plants known near-duplicates and asserts each planted pair is still
    found with the cap enabled.
  * ngram_jaccard_pairs correctness against a brute-force Python check.
  * lsh_bucket determinism, range, and neighbor-affinity sanity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _corpus(spark, n_base=40, words_per_doc=30):
    """Deterministic corpus: n_base distinct docs + a near-dup of each
    (one word appended) + one exact dup of each."""
    rows = []
    for i in range(n_base):
        words = [f"w{i}_{j}" for j in range(words_per_doc)]
        text = " ".join(words)
        rows.append((i, text))                       # base
        rows.append((i + 1000, text + " extra"))     # planted near-dup
        rows.append((i + 2000, text))                # exact dup
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_recall_with_cap(spark):
    """Every planted near/exact-dup pair survives max_bucket capping:
    found by some LSH band (cap drops one band's bucket, not the doc)
    or — for exact dups — by exact dedup."""
    from pdf_extraction_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_dedup_pairs,
    )

    df = _corpus(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup_pairs(
            df, "doc_id", "text", n=3, num_perms=16, bands=8,
            num_threshold=1, den_threshold=2, max_bucket=8,
        ).collect()
    }
    exact = exact_dedup(df, "doc_id", F.md5("text")).collect()
    exact_groups = {}
    for r in exact:
        exact_groups[r.dedup_key] = (r.keep_id, r.dup_count)

    missing = []
    for i in range(40):
        if (i, i + 1000) not in pairs:          # near-dup must come via LSH
            missing.append((i, i + 1000))
        # exact dup: via LSH pair OR collapsed by exact dedup
        found_exact = (i, i + 2000) in pairs or any(
            c >= 2 for _, c in exact_groups.values()
        )
        if not found_exact:
            missing.append((i, i + 2000))
    assert not missing, f"planted dup pairs lost under max_bucket cap: {missing}"


def test_minhash_candidates_respect_cap(spark):
    """A degenerate bucket (every doc identical in every band) larger than
    max_bucket produces NO candidate pairs from that bucket."""
    from pdf_extraction_spark.operators.dedup import minhash_lsh_candidates

    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)],
        "doc_id long, text string",
    )
    cand = minhash_lsh_candidates(
        same, "doc_id", "text", n=3, num_perms=16, bands=8, max_bucket=10
    )
    assert cand.count() == 0
    uncapped = minhash_lsh_candidates(
        same, "doc_id", "text", n=3, num_perms=16, bands=8, max_bucket=None
    )
    assert uncapped.count() == 20 * 19 // 2


def test_minhash_cap_drop_is_observable(spark):
    """Round-5 ADVICE: capped recall must be observable — the opt-in stats
    hook reports how many hot buckets the cap dropped and an upper bound
    on the candidate pairs lost with them."""
    from pdf_extraction_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_dedup_pairs,
    )

    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)],
        "doc_id long, text string",
    )
    stats: dict = {}
    minhash_lsh_candidates(
        same, "doc_id", "text", n=3, num_perms=16, bands=8, max_bucket=10,
        stats=stats,
    ).count()
    # all 8 bands collapse to one 20-doc bucket each -> 8 dropped buckets,
    # each bounding 20*19/2 = 190 potential pairs
    assert stats == {
        "dropped_buckets": 8,
        "dropped_pairs_upper_bound": 8 * 190,
    }
    stats2: dict = {}
    minhash_lsh_dedup_pairs(
        same, "doc_id", "text", n=3, num_perms=16, bands=8, max_bucket=10,
        stats=stats2,
    ).count()
    assert stats2 == stats
    # uncapped: nothing dropped, and the hook says so explicitly
    stats3: dict = {}
    minhash_lsh_candidates(
        same, "doc_id", "text", n=3, num_perms=16, bands=8, max_bucket=None,
        stats=stats3,
    ).count()
    assert stats3 == {"dropped_buckets": 0, "dropped_pairs_upper_bound": 0}


def test_ngram_jaccard_matches_bruteforce(spark):
    from pdf_extraction_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e g"),     # high overlap with 1
        (3, "x y z q r s"),     # disjoint
        (4, "a b c x y z"),     # partial
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, num_threshold=1, den_threshold=5
        ).collect()
    }

    def grams(text, n=2):
        toks = text.split()
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    expect = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            ga, gb = grams(ta), grams(tb)
            inter, union = len(ga & gb), len(ga | gb)
            if inter * 5 >= union:
                expect[(ia, ib)] = (inter, union)
    assert got == expect


def test_lsh_bucket_deterministic_and_bounded(spark):
    from pdf_extraction_spark.operators.similarity import lsh_bucket, plane_weights

    e = spark.createDataFrame(
        [(i, [float((i * 7 + d * 3) % 13 - 6) for d in range(8)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    col = lsh_bucket(F.col("embedding"), num_planes=4, dim=8)
    a = e.select("vec_id", col.alias("b")).collect()
    b = e.select("vec_id", col.alias("b")).collect()
    assert a == b
    assert all(0 <= r.b < 16 for r in a)
    # identical vectors always share a bucket (the property the dedup
    # block key relies on)
    w = plane_weights(4, 8)
    assert len(w) == 4 and all(len(row) == 8 for row in w)
    assert all(x in (1.0, -1.0) for row in w for x in row)


def test_candidates_superset_of_verified_pairs(spark):
    """minhash_lsh_candidates (discovery-only API) must contain every
    pair the verified pipeline emits under identical parameters."""
    from pdf_extraction_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_dedup_pairs,
    )

    corpus = _corpus(spark, n_base=20)
    kw = dict(n=3, num_perms=16, bands=8, max_bucket=64)
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(corpus, "doc_id", "text", **kw).collect()
    }
    verified = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup_pairs(
            corpus, "doc_id", "text", num_threshold=1, den_threshold=2, **kw
        ).collect()
    }
    assert verified and verified <= cand


def test_bucketed_corpus_anti_join_shuffles_only_the_batch(spark, tmp_path):
    """The 100 TB claim of incremental dedup, made concrete: against a
    corpus table bucketed on fingerprint, the anti-join's big side scans
    its buckets in place — the plan has exactly ONE Exchange (the small
    daily batch) and the corpus scan reports Bucketed: true.  Results
    must equal the plain (unbucketed) formulation."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.dedup import (
        incremental_new_docs,
        write_fingerprint_corpus,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 4 != 0)  # overlaps odd + some seen
    write_fingerprint_corpus(
        corpus, "doc_id", "text",
        table="seen_fp_bucketed_test", path=str(tmp_path / "corpus"), buckets=8,
    )
    try:
        seen = spark.table("seen_fp_bucketed_test").select("fingerprint")
        out = incremental_new_docs(batch, seen.hint("merge"), "doc_id", "text")

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        tree = plan.split("\n\n")[0]
        assert tree.count("+- Exchange") == 1, plan  # batch side only
        assert "Bucketed: true" in plan, plan

        plain_seen = corpus.select(
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ).alias("fingerprint")
        )
        expected = {
            r["doc_id"]
            for r in incremental_new_docs(
                batch, plain_seen, "doc_id", "text"
            ).collect()
        }
        got = {r["doc_id"] for r in out.collect()}
        assert got == expected and got  # non-trivial and identical
    finally:
        spark.sql("DROP TABLE IF EXISTS seen_fp_bucketed_test")
