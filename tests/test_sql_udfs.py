"""SQL scalar UDF surface: every registered engine_* function must
equal its functions/text.py / hashing.py builder on the real corpus,
including the degenerate rows, and must stay expression-inlined (no
python UDF node in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.functions.hashing import md5_hash60
from capstone_etl_spark.functions.sql_udfs import register_sql_functions
from capstone_etl_spark.functions.text import (
    clean_text,
    count_substring,
    page_loc,
    parent_path,
    tokenize,
)
from capstone_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

EDGE_TEXTS = [
    "",
    "   ",
    "Hello, World! 42",
    "tabs\tand\nnewlines",
    "café 日本語 unicode",
    "a/b/c/page",
]


def _edge_df(spark):
    return spark.createDataFrame([(t,) for t in EDGE_TEXTS], "t string")


def test_register_and_parity_on_corpus(spark):
    names = register_sql_functions(spark)
    assert "engine_tokenize" in names and "engine_hash60" in names
    docs = load_table(spark, SF, "documents")
    docs.createOrReplaceTempView("docs_udf_v")
    got = spark.sql(
        "SELECT doc_id, engine_tokenize(text) AS toks, engine_hash60(text) AS h "
        "FROM docs_udf_v"
    )
    want = docs.select(
        "doc_id", tokenize("text").alias("toks"), md5_hash60("text").alias("h")
    )
    g = {r.doc_id: (r.toks, r.h) for r in got.collect()}
    w = {r.doc_id: (r.toks, r.h) for r in want.collect()}
    assert g == w


def test_edge_semantics_match_builders(spark):
    register_sql_functions(spark)
    df = _edge_df(spark)
    df.createOrReplaceTempView("edge_udf_v")
    got = spark.sql(
        """
        SELECT t, engine_clean(t) AS c, engine_tokenize(t) AS toks,
               engine_count_substring(t, 'a') AS n_a,
               engine_page_loc(t, 'a/') AS loc,
               engine_parent_path(t) AS par
        FROM edge_udf_v
        """
    ).collect()
    want = df.select(
        "t",
        clean_text("t").alias("c"),
        tokenize("t").alias("toks"),
        count_substring("t", "a").cast("long").alias("n_a"),
        page_loc("t", "a/").alias("loc"),
        parent_path("t").alias("par"),
    ).collect()
    gm = {r.t: (r.c, r.toks, r.n_a, r.loc, r.par) for r in got}
    wm = {r.t: (r.c, r.toks, r.n_a, r.loc, r.par) for r in want}
    assert gm == wm


def test_count_substring_regex_metachar_needles(spark):
    """Needles that are regex-hostile must count as LITERAL substrings
    in both surfaces — including the quoting-breaker \\E (a raw
    needle containing \\E would terminate the \\Q...\\E quote and the
    tail would be interpreted as regex; ADVICE r5 #3)."""
    register_sql_functions(spark)
    rows = [
        ("x\\Ey x\\Ey z", "x\\Ey", 2),  # embedded \E — the breakout case
        ("a.c abc a.c", "a.c", 2),  # dot must not match 'b'
        ("q\\Qr q\\Qr", "q\\Qr", 2),  # embedded \Q is inert inside quote
        ("[a] [a]", "[a]", 2),  # char-class metachars
        ("back\\slash back\\slash", "back\\slash", 2),
    ]
    df = spark.createDataFrame([(t, n) for t, n, _ in rows], "t string, needle string")
    df.createOrReplaceTempView("needle_v")
    got = {
        (r.t, r.needle): r.n
        for r in spark.sql(
            "SELECT t, needle, engine_count_substring(t, needle) AS n FROM needle_v"
        ).collect()
    }
    for t, needle, expect in rows:
        assert got[(t, needle)] == expect, (t, needle, got[(t, needle)])
        # python builder parity (needle is a plan-time literal there)
        one = spark.createDataFrame([(t,)], "t string").select(
            count_substring("t", needle).cast("long").alias("n")
        )
        assert one.collect()[0].n == expect, (t, needle, "builder")


def test_sql_udfs_stay_expression_inlined(spark):
    """The SQL function must inline to Catalyst expressions — a
    BatchEvalPython / ArrowEvalPython node would mean the slow path."""
    register_sql_functions(spark)
    load_table(spark, SF, "documents").createOrReplaceTempView("docs_udf_v")
    plan = spark.sql(
        "SELECT engine_tokenize(text) FROM docs_udf_v"
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Scan parquet" in plan or "FileScan" in plan
