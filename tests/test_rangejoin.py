"""Binned interval join: equivalence with the naive range join on
boundary-heavy synthetic data."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.rangejoin import binned_interval_join


def test_binned_join_matches_naive_range_join(spark):
    # Points at bin edges, interval edges, and interior; intervals that
    # span multiple bins, fit inside one bin, and touch bin boundaries.
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 99, 100, 150, 199, 200, 250, 300, 999, 1000])],
        "pid long, ts_sec long",
    )
    intervals = spark.createDataFrame(
        [
            (0, 100, 200),    # exactly one bin (bin width 100)
            (1, 150, 250),    # straddles a bin boundary
            (2, 0, 1000),     # many bins
            (3, 199, 200),    # single point wide
            (4, 500, 600),    # covers no points
        ],
        "iid long, win_start long, win_end long",
    )
    got = {
        (r.pid, r.iid)
        for r in binned_interval_join(points, intervals, bin_sec=100).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("ts_sec") >= F.col("win_start")) & (F.col("ts_sec") < F.col("win_end")))
        .collect()
    }
    assert got == naive
    # half-open semantics: ts == win_start in, ts == win_end out
    assert (2, 0) in got and (5, 0) not in got


def test_doc_chunks_partition_token_stream(spark):
    # Chunks tile the token stream: sizes are CHUNK_TOKENS except the
    # last, and per-doc chunk token counts sum to the doc's token count.
    from pyspark.sql import functions as F

    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.operators.corpus import CHUNK_TOKENS, doc_chunks

    sf = "/root/testdata/sf0.001"
    chunks = doc_chunks(spark, sf)
    bad = chunks.filter(
        (F.col("n_tokens") > CHUNK_TOKENS) | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0
    # non-final chunks are exactly full
    w_max = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last"))
    partial_non_final = (
        chunks.join(w_max, "doc_id")
        .filter((F.col("chunk_id") < F.col("last")) & (F.col("n_tokens") != CHUNK_TOKENS))
        .count()
    )
    assert partial_non_final == 0
    totals = {
        r.doc_id: r.s
        for r in chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.size(tokenize("text")).alias("n")
    )
    expect = {r.doc_id: r.n for r in docs.filter(F.col("n") > 0).collect()}
    assert totals == expect
