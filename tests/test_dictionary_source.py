"""S2 file-scan dictionary source: normalization, gating, broadcast plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.text_pipeline import dictionary_file_gate
from capstone_etl_spark.operators.tokenize import doc_tokens
from capstone_etl_spark.sources.dictionary import load_dictionary

SF_DIR = "/root/testdata/sf0.001"


def test_load_dictionary_normalizes(spark, tmp_path):
    p = tmp_path / "words.txt"
    p.write_text("Apple\nAPPLE\n  apple  \nbanana\n\n \ncherry\n")
    words = sorted(r.word for r in load_dictionary(spark, str(p)).collect())
    assert words == ["apple", "banana", "cherry"]


def test_fixture_gate_keeps_and_drops(spark):
    out = dictionary_file_gate(spark, SF_DIR)
    toks = {r.token for r in out.select("token").distinct().collect()}
    assert "table" in toks and "scan" in toks          # in the wordlist
    assert "spark" not in toks and "vector" not in toks  # deliberately absent


def test_gate_is_broadcast_semi_join(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    gated = doc_tokens(docs, dictionary=load_dictionary(spark))
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
