"""Degenerate-input armor: every core operator must yield an EMPTY (or
well-defined) result on empty / pathological input, never crash — the
bug class behind the round-1 shingles sequence(1,0) crash."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.dedup import minhash_signatures, shingles, simhash
from capstone_etl_spark.operators.doc_similarity import doc_cosine_pairs
from capstone_etl_spark.operators.index import inverted_index, sparse_vectors
from capstone_etl_spark.operators.tokenize import doc_stats, term_frequencies
from capstone_etl_spark.operators.vocab import vocabulary, with_dense_ids


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _degenerate_docs(spark):
    # empty strings, whitespace, punctuation-only, single token
    return spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "!!! ??? ..."), (3, "one"), (4, None)],
        "doc_id long, text string",
    )


def test_text_pipeline_empty_relation(spark):
    docs = _empty_docs(spark)
    tf = term_frequencies(docs)
    assert tf.count() == 0
    assert doc_stats(tf).count() == 0
    assert vocabulary(tf).count() == 0
    assert inverted_index(tf).count() == 0
    assert sparse_vectors(tf, vocabulary(tf)).count() == 0


def test_text_pipeline_degenerate_rows(spark):
    docs = _degenerate_docs(spark)
    tf = term_frequencies(docs)
    got = {(r.doc_id, r.token): r.qty for r in tf.collect()}
    assert got == {(3, "one"): 1}        # only the real token survives


def test_dedup_operators_degenerate(spark):
    docs = _degenerate_docs(spark)
    assert shingles(docs, max_df=None).count() == 0   # all docs < 3 tokens
    assert minhash_signatures(docs).count() == 0
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sh.get(3, 0) != 0              # single-token doc still hashes
    assert 0 not in sh and 4 not in sh    # empty/null docs drop out


def test_doc_similarity_empty_and_single(spark):
    tf_empty = term_frequencies(_empty_docs(spark))
    assert doc_cosine_pairs(tf_empty).count() == 0
    one = spark.createDataFrame([(0, "solo token pair")], "doc_id long, text string")
    assert doc_cosine_pairs(term_frequencies(one)).count() == 0  # no pairs


def test_dense_ids_empty(spark):
    df = spark.createDataFrame([], "k string")
    assert with_dense_ids(df, "k").count() == 0


def test_session_and_windows_empty_events(spark):
    from capstone_etl_spark.streaming.windows import (
        stream_dedup_counts,
        stream_session_windows,
        stream_tumbling,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert stream_tumbling(ev).count() == 0
    assert stream_session_windows(ev).count() == 0
    assert stream_dedup_counts(ev).count() == 0
