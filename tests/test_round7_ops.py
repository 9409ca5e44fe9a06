"""Invariant tests for the round-7 operators: the full BPE encode pass
and the streaming incremental-dedup admission query."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_bpe_encode_invariants(spark, sf_dir):
    from capstone_etl_spark.operators.textstats import bpe_encode

    rows = bpe_encode(spark, sf_dir).collect()
    assert rows, "every source with tokens must appear"
    for r in rows:
        # each word encodes to >= 1 symbol and <= its char count
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars
        assert r.fertility >= 1.0
        assert r.chars_per_bpe_token >= 1.0
        # merges actually fired somewhere: with BPE_MERGES learned
        # merges over a natural-language corpus the encoded stream is
        # strictly shorter than the char baseline
        assert r.n_bpe_tokens < r.n_chars


def test_bpe_encode_consistent_with_learned_merges(spark, sf_dir):
    """Σ tf·len(repr) under the complete merge table must equal the
    char total minus one char per merge occurrence — i.e. applying k
    merges to a word shortens its repr by exactly k."""
    from capstone_etl_spark.operators.textstats import bpe_encode

    agg = bpe_encode(spark, sf_dir).groupBy().sum("n_chars", "n_bpe_tokens").first()
    n_chars, n_bpe = agg
    assert 0 < n_bpe < n_chars


def test_stream_dedup_incremental_equals_batch(spark, sf_dir):
    """The ingest-time stream must verdict every delta doc exactly as
    the batch pass does (same oracle, but pinned Spark-vs-Spark too:
    the stream-static join + drained assembly is a different physical
    path than the batch self-join)."""
    from capstone_etl_spark.operators.dedup import dedup_incremental
    from capstone_etl_spark.operators.streaming_queries import (
        stream_dedup_incremental,
    )

    batch = {r.doc_id: r for r in dedup_incremental(spark, sf_dir).collect()}
    streamed = {r.doc_id: r for r in stream_dedup_incremental(spark, sf_dir).collect()}
    assert set(batch) == set(streamed)
    for doc_id, b in batch.items():
        s = streamed[doc_id]
        assert (s.is_dup, s.dup_of, s.n_dups, s.best_jaccard) == (
            b.is_dup,
            b.dup_of,
            b.n_dups,
            b.best_jaccard,
        ), f"stream/batch verdict mismatch for doc {doc_id}"
