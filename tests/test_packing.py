"""Sequence-packing invariants (operators/packing.py).

The oracle gate proves Spark == DuckDB; these tests prove both engines
compute the *intended* packing semantics, which the gate alone cannot
(a shared bug would still hash-match).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from capstone_etl_spark.operators import packing


def test_concat_split_conserves_tokens(spark, sf_dir):
    """Every doc's straddle pieces sum back to its token count, and no
    sequence holds more than SEQ_LEN tokens."""
    df = packing.sequence_packing(spark, sf_dir).cache()
    try:
        bad_docs = (
            df.groupBy("source", "shard", "doc_id", "n_tokens")
            .agg(F.sum("tokens_in_seq").alias("got"))
            .filter(F.col("got") != F.col("n_tokens"))
            .count()
        )
        assert bad_docs == 0
        over = (
            df.groupBy("source", "shard", "seq_id")
            .agg(F.sum("tokens_in_seq").alias("fill"))
            .filter(F.col("fill") > packing.SEQ_LEN)
            .count()
        )
        assert over == 0
        # every sequence except each shard's last is exactly full
        fills = (
            df.groupBy("source", "shard", "seq_id")
            .agg(F.sum("tokens_in_seq").alias("fill"))
        )
        last = fills.groupBy("source", "shard").agg(F.max("seq_id").alias("last_seq"))
        partial_nonlast = (
            fills.join(last, ["source", "shard"])
            .filter((F.col("seq_id") != F.col("last_seq")) & (F.col("fill") != packing.SEQ_LEN))
            .count()
        )
        assert partial_nonlast == 0
    finally:
        df.unpersist()


def test_greedy_respects_budget_and_order(spark, sf_dir):
    pdf = packing.sequence_packing_greedy(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for (_, _), g in pdf.groupby(["source", "shard"]):
        g = g.sort_values("doc_id")
        # pack ids are contiguous and non-decreasing in doc order
        assert g["pack_id"].is_monotonic_increasing
        assert g["pack_id"].iloc[0] == 0
        diffs = g["pack_id"].diff().dropna()
        assert set(diffs.unique()) <= {0.0, 1.0}
        fills = g.groupby("pack_id")["n_tokens"].sum()
        sizes = g.groupby("pack_id")["n_tokens"].count()
        # a pack only exceeds the budget when a single long doc owns it
        for pid, fill in fills.items():
            assert fill <= packing.SEQ_LEN or sizes[pid] == 1
        # greedy is maximal: no pack could absorb its successor's head
        heads = g.groupby("pack_id")["n_tokens"].first()
        for pid in fills.index[:-1]:
            assert fills[pid] + heads[pid + 1] > packing.SEQ_LEN


def test_greedy_pack_shard_invariance(spark, sf_dir):
    """The output contract (VERDICT r4 perf note): pack ids are defined
    PER SHARDING CONFIG — re-sharding changes the ids but must preserve
    every config-independent invariant. Across shards=8 (default) and
    shards=16: each doc is packed exactly once with the same token
    count, total tokens are conserved, every pack respects the budget
    (lone oversized docs excepted), and each output records its own
    config in pack_shards."""
    runs = {}
    for shards in (8, 16):
        pdf = packing.sequence_packing_greedy(spark, sf_dir, shards=shards).toPandas()
        assert (pdf["pack_shards"] == shards).all()
        assert (pdf["shard"] < shards).all() and (pdf["shard"] >= 0).all()
        # coverage: each doc exactly once
        assert pdf["doc_id"].is_unique
        fills = pdf.groupby(["source", "shard", "pack_id"])["n_tokens"].agg(["sum", "count"])
        assert ((fills["sum"] <= packing.SEQ_LEN) | (fills["count"] == 1)).all()
        runs[shards] = pdf
    a, b = runs[8], runs[16]
    # same documents, same token counts, same grand total — only the
    # (shard, pack_id) labeling differs between configs
    ta = a.set_index("doc_id")["n_tokens"].sort_index()
    tb = b.set_index("doc_id")["n_tokens"].sort_index()
    assert ta.equals(tb)
    assert a["n_tokens"].sum() == b["n_tokens"].sum()
    keys_a = set(map(tuple, a[["doc_id", "shard", "pack_id"]].values))
    keys_b = set(map(tuple, b[["doc_id", "shard", "pack_id"]].values))
    assert keys_a != keys_b  # ids really are per-config


def test_empty_docs_excluded(spark, sf_dir):
    df = packing.sequence_packing(spark, sf_dir)
    assert df.filter(F.col("n_tokens") <= 0).count() == 0


def test_packing_window_is_partitioned(spark, sf_dir):
    """The cumulative-sum window must shuffle on (source, shard) — a
    single-partition window here would serialize the whole corpus."""
    plan = packing.sequence_packing(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec: No Partition Defined" not in plan


def test_attention_spans_are_consistent(spark, sf_dir):
    """First offset 0, offsets strictly increasing by predecessor
    token counts, boundary count == n_docs, total == pack tokens."""
    pdf = packing.pack_attention_spans(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    packs = packing.sequence_packing_greedy(spark, sf_dir).toPandas()
    sizes = packs.set_index(["source", "shard", "pack_id", "doc_id"])["n_tokens"]
    for _, row in pdf.iterrows():
        spans = [tuple(map(int, s.split(":"))) for s in row.spans.split(",")]
        assert len(spans) == row.n_docs
        assert spans[0][0] == 0
        running = 0
        for off, doc_id in spans:
            assert off == running
            running += sizes[(row.source, row.shard, row.pack_id, doc_id)]
        assert running == row.n_tokens
