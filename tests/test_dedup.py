"""Dedup operators on a tiny corpus with known near-duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.dedup import (
    connected_components,
    minhash_signatures,
    shingles,
    simhash,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota lambda"  # 1 token differs
FAR = "one two three four five six seven eight nine ten"

DOCS = [(0, BASE), (1, BASE), (2, NEAR), (3, FAR)]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_shingles_identical_docs_equal_sets(spark):
    sh = shingles(_docs(spark), max_df=None)
    sets = (
        sh.groupBy("doc_id").agg(F.sort_array(F.collect_list("sh")).alias("s")).collect()
    )
    by_id = {r.doc_id: r.s for r in sets}
    assert by_id[0] == by_id[1]          # identical docs → identical shingles
    assert by_id[0] != by_id[3]          # disjoint docs → different
    inter = set(by_id[0]) & set(by_id[2])
    assert len(inter) == 7               # 8 trigrams; only the last contains the differing token


def test_shingles_short_docs_yield_empty_not_crash(spark):
    # Regression: docs with < n tokens after cleaning used to crash
    # (sequence(1, 0) descends through 0 → slice(toks, 0, n) throws).
    docs = spark.createDataFrame(
        [(0, ""), (1, "..!!.."), (2, "one two"), (3, "one two three four")],
        "doc_id long, text string",
    )
    sh = shingles(docs, max_df=None)
    by_id = {r.doc_id: r.cnt for r in sh.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert 0 not in by_id and 1 not in by_id and 2 not in by_id
    assert by_id[3] == 2  # 4 tokens → 2 trigrams


def test_minhash_identical_docs_equal_signatures(spark):
    sig = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(_docs(spark)).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]


def test_connected_components_chain_and_islands(spark):
    # Chain 1-2-3-4 (transitivity pairs alone can't express: 1~4 only
    # through the chain), triangle 10-11-12, isolated edge 20-21.
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    p = spark.createDataFrame(pairs, "a long, b long")
    edges = p.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        p.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = {r.doc_id: r.label for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_simhash_hamming_properties(spark):
    sh = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert sh[0] == sh[1]                # identical text → identical simhash
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far            # near-dup closer than unrelated


def test_decontamination_is_bipartite(spark):
    # Flags must only pair train (id % 50 != 0) with bench (id % 50 == 0):
    # identical docs on both sides of the cut are caught, train-train
    # dups are NOT this operator's job.
    from capstone_etl_spark.operators.dedup import benchmark_decontamination

    rows = benchmark_decontamination(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert r.train_doc % 50 != 0
        assert r.bench_doc % 50 == 0
        assert r.jaccard >= 0.5 or r.containment >= 0.8


def test_repeated_ngram_spans_flags_planted_substring(spark, tmp_path):
    from capstone_etl_spark.operators.dedup import REPEAT_SPAN_N, repeated_ngram_spans

    shared = " ".join(f"w{i}" for i in range(REPEAT_SPAN_N + 4))   # 12-token shared run
    rows = [
        (0, shared + " alpha beta gamma delta epsilon zeta", "en", "s0", 0),
        (1, "one two three four five six seven " + shared, "en", "s0", 0),
        (2, "totally unrelated words here nothing repeats at all obviously", "en", "s0", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in repeated_ngram_spans(spark, str(tmp_path)).collect()}
    # the shared 12-token run is covered by repeated 8-grams in docs 0+1
    for d in (0, 1):
        assert got[d].n_spans == 1
        assert got[d].n_flagged == REPEAT_SPAN_N + 4
        assert abs(got[d].flagged_ratio - (REPEAT_SPAN_N + 4) / got[d].n_tokens) < 1e-12
    assert got[2].n_spans == 0 and got[2].n_flagged == 0


def test_dedup_incremental_agrees_with_batch_pairs(spark, sf_dir):
    """Every delta doc flagged is_dup must appear in the full batch
    pair relation with an admissible partner (base or earlier delta),
    and every delta doc with such a batch pair must be flagged — the
    incremental path finds exactly the batch answer restricted to the
    delta quadrants."""
    from capstone_etl_spark.operators.dedup import (
        _is_delta,
        dedup_incremental,
        ngram_jaccard_pairs,
    )

    verdicts = {r.doc_id: r for r in dedup_incremental(spark, sf_dir).collect()}
    pairs = ngram_jaccard_pairs(spark, sf_dir).collect()
    docs = spark.createDataFrame(
        [(d,) for d in verdicts], "doc_id long"
    ).select("doc_id", _is_delta(F.col("doc_id")).alias("d"))
    assert all(r.d for r in docs.collect())  # the verdict set IS the delta

    delta = set(verdicts)
    expect_dup: dict[int, set[int]] = {}
    for p in pairs:  # doc_a < doc_b in the batch relation
        if p.doc_b in delta:
            expect_dup.setdefault(p.doc_b, set()).add(p.doc_a)
        if p.doc_a in delta and p.doc_b not in delta:
            expect_dup.setdefault(p.doc_a, set()).add(p.doc_b)
    for doc_id, r in verdicts.items():
        partners = expect_dup.get(doc_id, set())
        assert r.is_dup == bool(partners), (doc_id, partners)
        if partners:
            assert r.dup_of == min(partners)
            assert r.n_dups == len(partners)
        else:
            assert r.dup_of == doc_id and r.n_dups == 0 and r.best_jaccard == 0.0


def test_dedup_incremental_never_probes_base_base(spark):
    """Structural contract: a base-only corpus yields ZERO verdict rows
    (no delta, no work) — the base×base quadrant is never compared."""
    from capstone_etl_spark.operators.dedup import _is_delta, dedup_incremental
    import pandas as pd

    # build a corpus whose every doc_id is OUTSIDE the delta bucket
    ids = (
        spark.range(0, 2000)
        .select(F.col("id").alias("doc_id"))
        .filter(~_is_delta(F.col("doc_id")))
        .limit(20)
        .collect()
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    pdf = pd.DataFrame(
        {
            "doc_id": [r.doc_id for r in ids],
            "text": [BASE for _ in ids],
            "lang": ["en"] * len(ids),
            "source": ["web"] * len(ids),
            "n_chars": [len(BASE)] * len(ids),
        }
    )
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    assert dedup_incremental(spark, d).count() == 0


def test_incremental_clusters_equal_rebuild(spark, sf_dir):
    """The incremental label-merge (committed base labels + contracted
    delta-edge CC) must reproduce the from-scratch batch clustering
    row-for-row — the invariant that lets a 100 TB pipeline maintain
    the near-dup graph instead of rebuilding it."""
    from capstone_etl_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_incremental,
    )

    got = {r.doc_id: r.asDict() for r in dedup_clusters_incremental(spark, sf_dir).collect()}
    want = {r.doc_id: r.asDict() for r in dedup_clusters(spark, sf_dir).collect()}
    assert got == want


def test_incremental_clusters_accept_precomputed_labels(spark, sf_dir):
    """The base_labels seam: passing the committed label relation in
    (the production shape — labels read from a table, base CC never
    re-run) yields the same answer as the self-contained form."""
    from capstone_etl_spark.operators.dedup import (
        _both_ways,
        _is_delta,
        cached,
        connected_components,
        dedup_clusters_incremental,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    base_pairs = pairs.filter(
        (~_is_delta(F.col("doc_a"))) & (~_is_delta(F.col("doc_b")))
    )
    committed = connected_components(cached(_both_ways(base_pairs)))
    got = {
        r.doc_id: r.asDict()
        for r in dedup_clusters_incremental(spark, sf_dir, base_labels=committed).collect()
    }
    want = {
        r.doc_id: r.asDict()
        for r in dedup_clusters_incremental(spark, sf_dir).collect()
    }
    assert got == want
