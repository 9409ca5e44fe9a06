"""Sessionization on crafted events + fingerprint order sensitivity."""

from __future__ import annotations

import datetime as dt

import pytest

from capstone_etl_spark.operators.textstats import doc_fingerprint_df
from capstone_etl_spark.operators.events import SESSION_GAP_SEC


def test_sessionize_gap_split(spark):
    from pyspark.sql import functions as F
    from capstone_etl_spark.operators import events as ev_ops

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "click", t0),
        (1, "view", t0 + dt.timedelta(minutes=10)),          # same session
        (1, "click", t0 + dt.timedelta(minutes=50)),         # gap 40min > 30 → new
        (2, "view", t0),                                     # other user
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    # reuse the operator's internals through a monkeypatched loader
    import capstone_etl_spark.operators.events as mod

    orig = mod._events
    mod._events = lambda spark, sf_dir: df
    try:
        out = {(r.user_id, r.session_seq): r for r in mod.sessionize(spark, "ignored").collect()}
    finally:
        mod._events = orig
    assert out[(1, 0)].n_events == 2
    assert out[(1, 1)].n_events == 1
    assert out[(2, 0)].n_events == 1
    assert out[(1, 0)].duration_sec == 600


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in doc_fingerprint_df(df).collect()}
    assert fps[0] == fps[1]      # same content+order → same fingerprint
    assert fps[0] != fps[2]      # reordered tokens → different fingerprint


def test_reservoir_sample_sized_and_deterministic(spark, sf_dir):
    """Exactly min(K, |source|) rows per source, ranks 1..k, identical
    across two runs (hash membership, no RNG)."""
    from capstone_etl_spark.operators.sampling import RESERVOIR_K, reservoir_sample
    from capstone_etl_spark.sources.tables import load_table

    out = reservoir_sample(spark, sf_dir).collect()
    per_src_n = {}
    for r in out:
        per_src_n.setdefault(r.source, []).append(r.rnk)
    src_sizes = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for src, rnks in per_src_n.items():
        assert sorted(rnks) == list(range(1, min(RESERVOIR_K, src_sizes[src]) + 1))
    again = reservoir_sample(spark, sf_dir).collect()
    assert sorted((r.source, r.doc_id, r.rnk) for r in again) == sorted(
        (r.source, r.doc_id, r.rnk) for r in out
    )


def test_length_histogram_conserves_and_bounds(spark, sf_dir):
    """Bucket bounds are powers of two, totals conserve the per-doc
    token counts, every doc's n_tokens falls inside its bucket."""
    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.operators.textstats import length_histogram
    from capstone_etl_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    hist = length_histogram(spark, sf_dir).collect()
    assert hist
    for r in hist:
        assert r.bucket_lo == 2**r.bucket
        assert r.bucket_hi == 2 ** (r.bucket + 1) - 1
        assert r.bucket_lo <= r.n_tokens / r.n_docs <= r.bucket_hi or r.n_docs > 1
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(tokenize("text")).alias("n")
    )
    total_docs = docs.filter(F.col("n") >= 1).count()
    total_toks = docs.filter(F.col("n") >= 1).agg(F.sum("n")).collect()[0][0]
    assert sum(r.n_docs for r in hist) == total_docs
    assert sum(r.n_tokens for r in hist) == total_toks


def test_tokenizer_fertility_matches_manual(spark, sf_dir):
    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.operators.textstats import tokenizer_fertility
    from capstone_etl_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    out = {r.source: r for r in tokenizer_fertility(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    manual = (
        docs.select("source", F.explode(tokenize("text")).alias("w"))
        .groupBy("source")
        .agg(F.count("*").alias("n_tokens"), F.countDistinct("w").alias("n_types"))
        .collect()
    )
    for m in manual:
        assert out[m.source].n_tokens == m.n_tokens
        assert out[m.source].n_types == m.n_types
        assert 0 < out[m.source].type_token_ratio <= 1.0
        assert out[m.source].chars_per_token > 0


def test_bigram_lm_nll_positive_and_complete(spark, sf_dir):
    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.operators.textstats import bigram_lm_perplexity
    from capstone_etl_spark.session import release_caches
    from capstone_etl_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    try:
        rows = bigram_lm_perplexity(spark, sf_dir).collect()
        docs_with_bigrams = (
            load_table(spark, sf_dir, "documents")
            .filter(F.size(tokenize("text")) >= 2)
            .count()
        )
        assert len(rows) == docs_with_bigrams
        for r in rows:
            # MLE probabilities ≤ 1 → nll ≥ 0; 0 only if every transition
            # is deterministic (possible for tiny docs, so allow equality)
            assert r.nll_nats >= 0.0
            assert r.n_bigrams >= 1
    finally:
        release_caches()


def test_bpe_apply_merge_hand_checked(spark, tmp_path):
    """On a corpus where 'ab' is the clear winner: greedy left-to-right
    merge counts (overlaps consumed) and length bookkeeping."""
    from capstone_etl_spark.operators.textstats import bpe_apply_merge
    from capstone_etl_spark.session import release_caches

    spark.createDataFrame(
        [(0, "abab abab ababab xyz", "en", "s", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    try:
        out = {r.token: r for r in bpe_apply_merge(spark, str(tmp_path)).collect()}
        # 'ab' occurs 2+2+3 (weighted by tf: abab tf=2 → 4, ababab tf=1 → 3)
        assert out["abab"].merge_pair == "ab"
        assert out["abab"].n_merges == 2 and out["abab"].len_after == 2
        assert out["ababab"].n_merges == 3 and out["ababab"].len_after == 3
        assert out["xyz"].n_merges == 0 and out["xyz"].len_after == 3
        for r in out.values():
            assert r.len_before - r.n_merges == r.len_after
    finally:
        release_caches()


def test_bm25_topk_matches_duckdb_and_ranks(spark):
    import duckdb

    from capstone_etl_spark.operators.doc_similarity import (
        BM25_QUERIES,
        BM25_TOP_K,
        BM25_TOPK_SQL,
        bm25_topk,
    )
    from capstone_etl_spark.session import release_caches

    sf = "/root/testdata/sf0.001"
    try:
        rows = bm25_topk(spark, sf).collect()
    finally:
        release_caches()
    got = {(r.query_id, r.rnk): (r.doc_id, r.bm25) for r in rows}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = {
        (int(q), int(k)): (int(d), float(s))
        for q, d, s, k in con.execute(BM25_TOPK_SQL).fetchall()
    }
    assert got == want
    # every query returns a full ranking (corpus-common terms), scores
    # are positive and non-increasing in rank
    qids = {q for q, _ in got}
    assert qids == {qid for qid, _ in BM25_QUERIES}
    for q in qids:
        scores = [got[(q, k)][1] for k in range(1, BM25_TOP_K + 1) if (q, k) in got]
        assert scores and all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


def test_cooccurrence_triangles_match_bruteforce(spark):
    """Degree-oriented wedge closing must enumerate exactly the brute
    -force triangle set of the support-thresholded edge list."""
    from itertools import combinations

    from capstone_etl_spark.operators.relational import (
        TRI_MIN_SUPPORT,
        cooccurrence_triangles,
    )
    from capstone_etl_spark.session import release_caches
    from capstone_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    try:
        got = sorted(
            (r.pa, r.pb, r.pc) for r in cooccurrence_triangles(spark, sf).collect()
        )
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
        rows = [(r.l_orderkey, r.l_partkey) for r in li.collect()]
    finally:
        release_caches()
    from collections import Counter, defaultdict

    by_order = defaultdict(set)
    for ok, pk in rows:
        by_order[ok].add(pk)
    support = Counter()
    for parts in by_order.values():
        for p1, p2 in combinations(sorted(parts), 2):
            support[(p1, p2)] += 1
    edges = {e for e, s in support.items() if s >= TRI_MIN_SUPPORT}
    adj = defaultdict(set)
    for p1, p2 in edges:
        adj[p1].add(p2)
    want = sorted(
        (a, b, c)
        for (a, b) in edges
        for c in adj[b]
        if c in adj[a]
    )
    assert got == want and len(got) > 0


def test_hybrid_rrf_matches_duckdb_and_fuses(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from capstone_etl_spark.operators.doc_similarity import RRF_K, hybrid_retrieval_rrf
    from capstone_etl_spark.session import release_caches

    sf = "/root/testdata/sf0.001"
    try:
        rows = hybrid_retrieval_rrf(spark, sf).collect()
    finally:
        release_caches()
    got = {(r.query_id, r.rnk): (r.doc, r.r_lex, r.r_vec, r.rrf) for r in rows}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    sql = entrymod.oracle_sql()["hybrid_retrieval_rrf"]
    want = {
        (int(q), int(k)): (
            int(d),
            None if rl is None else int(rl),
            None if rv is None else int(rv),
            float(s),
        )
        for q, d, rl, rv, s, k in con.execute(sql).fetchall()
    }
    assert got == want
    # a doc present in BOTH lists outranks the same-rank single-list
    # doc: score of (r, r) is 2/(K+r) > 1/(K+r)
    for (q, k), (doc, rl, rv, s) in got.items():
        terms = sum(1 for r in (rl, rv) if r is not None)
        assert terms >= 1
        expect = sum(1.0 / (RRF_K + r) for r in (rl, rv) if r is not None)
        assert abs(s - round(expect, 6)) < 1e-9


def test_ewma_daily_invariants(spark, sf_dir):
    """First observation's EWMA equals its daily value; every EWMA lies
    inside [min, max] of its trailing frame (convex weights); n_obs
    counts the frame and caps at EWMA_W."""
    from capstone_etl_spark.operators.events import EWMA_W, ewma_daily

    per_type: dict[str, list] = {}
    for r in ewma_daily(spark, sf_dir).collect():
        per_type.setdefault(r.event_type, []).append(r)
    assert per_type
    for rows in per_type.values():
        rows.sort(key=lambda r: r.day)
        assert rows[0].n_obs == 1
        assert rows[0].ewma == pytest.approx(rows[0].daily_value, abs=1e-6)
        for i, r in enumerate(rows):
            frame = [x.daily_value for x in rows[max(0, i - EWMA_W + 1) : i + 1]]
            assert r.n_obs == len(frame) and r.n_obs <= EWMA_W
            assert min(frame) - 1e-6 <= r.ewma <= max(frame) + 1e-6
