"""KMV distinct-count sketch: determinism, accuracy, small-set fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from capstone_etl_spark.operators.sketches import KMV_K, kmv_distinct_shingles
from capstone_etl_spark.session import release_caches

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def test_kmv_estimates_within_sketch_error(spark):
    rows = kmv_distinct_shingles(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_exact >= KMV_K:
            # KMV-k standard error ~ 1/sqrt(k-2) ≈ 6%; allow 5 sigma
            assert r.rel_error < 0.35, (r.source, r.n_exact, r.kmv_estimate)
        else:
            # fewer distincts than k: the sketch IS the exact set
            assert r.kmv_estimate == float(r.n_exact)
            assert r.rel_error == 0.0


def test_kmv_overlap_tracks_exact_jaccard(spark):
    from capstone_etl_spark.functions.hashing import md5_hash60
    from capstone_etl_spark.functions.text import token_ngrams, tokenize
    from capstone_etl_spark.operators import sketches
    from capstone_etl_spark.operators.sketches import kmv_source_overlap
    from capstone_etl_spark.sources.tables import load_table

    est = {
        (r.src_a, r.src_b): r.jaccard_est
        for r in kmv_source_overlap(spark, SF_DIR).collect()
    }
    assert est
    # exact pairwise Jaccard over the full distinct shingle-hash sets
    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select("source", tokenize("text").alias("toks"))
    hashed = (
        toks.select("source", F.explode(token_ngrams("toks", sketches.NGRAM_N)).alias("g"))
        .select("source", md5_hash60(F.col("g")).alias("h"))
        .distinct()
    )
    sets: dict[str, set] = {}
    for row in hashed.collect():
        sets.setdefault(row.source, set()).add(row.h)
    for (a, b), j_est in est.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j_exact = inter / union
        # KMV-256 jaccard standard error ~ sqrt(J(1-J)/k) ≈ 0.03; 5 sigma
        assert abs(j_est - j_exact) < 0.2, (a, b, j_est, j_exact)


def test_kmv_falls_back_exactly_on_tiny_groups(spark):
    # a corpus whose per-source shingle count is far below k must report
    # exact counts with zero error through the fallback branch
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon", "only_src") for i in range(3)],
        "doc_id long, text string, source string",
    )
    docs.createOrReplaceTempView("tiny_docs")
    from capstone_etl_spark.operators import sketches
    from capstone_etl_spark.functions.hashing import md5_hash60
    from capstone_etl_spark.functions.text import token_ngrams, tokenize

    toks = docs.select("source", tokenize("text").alias("toks"))
    grams = toks.select("source", F.explode(token_ngrams("toks", sketches.NGRAM_N)).alias("g"))
    n_distinct = grams.select("g").distinct().count()
    assert n_distinct < KMV_K  # precondition: fallback territory


def test_kmv_sketch_merge_equals_full_sketch(spark):
    """The mergeability property the streaming form relies on: bottom-k
    of (bottom-k(A) ∪ bottom-k(B)) == bottom-k(A ∪ B) — so sketches of
    shards merge into the corpus sketch without revisiting data."""
    from capstone_etl_spark.functions.hashing import md5_hash60
    from capstone_etl_spark.functions.text import token_ngrams, tokenize
    from capstone_etl_spark.operators import sketches
    from capstone_etl_spark.sources.tables import load_table

    hashed = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", tokenize("text").alias("toks"))
        .select("doc_id", F.explode(token_ngrams("toks", sketches.NGRAM_N)).alias("g"))
        .select("doc_id", md5_hash60(F.col("g")).alias("h"))
    )
    all_h = sorted({r.h for r in hashed.collect()})
    half_a = sorted({r.h for r in hashed.filter(F.col("doc_id") % 2 == 0).collect()})
    half_b = sorted({r.h for r in hashed.filter(F.col("doc_id") % 2 == 1).collect()})
    k = KMV_K
    merged = sorted(set(half_a[:k]) | set(half_b[:k]))[:k]
    assert merged == all_h[:k]
