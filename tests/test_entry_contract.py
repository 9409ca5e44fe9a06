"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree on
keys, and a sample of queries matches the DuckDB oracle at sf0.001."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from tools.check_correctness import compare

SAMPLE = ["tf_per_doc", "doc_stats", "vocab_ids", "pricing_summary", "top_customers"]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "doc_id" in df.columns and "euclidian_norm" in df.columns


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark_pdf = qs[name](spark, sf_dir).toPandas()
    duck_pdf = con.execute(oracles[name]).df()
    assert compare(name, spark_pdf, duck_pdf) == []
