"""Incremental maintenance of the inverted index — the materialized-
view pattern at the heart of a production corpus index: when new
documents arrive, merge their postings into the existing index WITHOUT
re-scanning the already-indexed corpus.

Because a document's postings are wholly contained in its own rows, a
batch of NEW doc_ids contributes disjoint (token, doc_id) postings —
so the merge is a full-outer join on token + array concat (the cheap
path: existing posting arrays are never exploded), followed by one
sort for determinism. The test pins merge(half₁, half₂) == rebuild(all)
exactly — the invariant that makes index maintenance incremental at
100 TB (cost ∝ delta, not corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.index import inverted_index
from capstone_etl_spark.operators.tokenize import term_frequencies
from capstone_etl_spark.sinks.writers import read_back, write_parquet
from capstone_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
SPLIT_AT = 25


def _tf(docs):
    return term_frequencies(docs)


def merge_postings(existing, delta):
    """Full-outer join on token; concat posting arrays (disjoint doc
    sets by contract); one sort_array for canonical order."""
    e = existing.select("token", F.col("references").alias("old_refs"))
    d = delta.select("token", F.col("references").alias("new_refs"))
    empty = F.array().cast(existing.schema["references"].dataType)
    return e.join(d, "token", "full_outer").select(
        "token",
        F.sort_array(
            F.concat(F.coalesce("old_refs", empty), F.coalesce("new_refs", empty))
        ).alias("references"),
    )


def test_incremental_merge_equals_rebuild(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    first = docs.filter(F.col("doc_id") < SPLIT_AT)
    rest = docs.filter(F.col("doc_id") >= SPLIT_AT)

    # initial build, persisted through the S4 sink (the realistic path:
    # the index lives in storage between ingest batches)
    path = str(tmp_path / "index_v1")
    write_parquet(inverted_index(_tf(first)), path)

    merged = merge_postings(read_back(spark, path), inverted_index(_tf(rest)))
    rebuilt = inverted_index(_tf(docs))

    got = {r.token: [(p.doc_id, p.qty) for p in r.references] for r in merged.collect()}
    want = {r.token: [(p.doc_id, p.qty) for p in r.references] for r in rebuilt.collect()}
    assert got == want
    assert len(want) > 0


def test_incremental_merge_is_delta_sized(spark, tmp_path):
    """The merge plan must not re-tokenize the already-indexed corpus:
    its only parquet scans are the persisted index and the delta docs."""
    docs = load_table(spark, SF_DIR, "documents")
    first = docs.filter(F.col("doc_id") < SPLIT_AT)
    rest = docs.filter(F.col("doc_id") >= SPLIT_AT)
    path = str(tmp_path / "index_v1")
    write_parquet(inverted_index(_tf(first)), path)

    merged = merge_postings(read_back(spark, path), inverted_index(_tf(rest)))
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    # exactly two leaf relations: the delta docs scan (the only node
    # carrying the raw text column) and the persisted index (references)
    assert plan.count("Relation [") == 2
    assert plan.count(",text#") == 1
    assert plan.count("references#") >= 1
