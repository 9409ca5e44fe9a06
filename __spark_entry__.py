"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001 (smoke).
queries()     — name → (spark, sf_dir) -> DataFrame, one per operator
                from SURVEY.md §2 (+ extension layer).
oracle_sql()  — name → DuckDB SQL over the same parquet views; the
                driver hash-compares both sides at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's semantic heart (clean → tokenize →
    stopword gate → TF → per-doc stats, SURVEY.md §7.2 slice 0) joined
    back to document metadata."""
    from pyspark.sql import functions as F

    from capstone_etl_spark.operators.tokenize import doc_stats, term_frequencies
    from capstone_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    stats = doc_stats(term_frequencies(docs))
    return (
        docs.select("doc_id", "lang", "source", "n_chars")
        .join(stats, "doc_id", "left")
        .orderBy("doc_id")
    )


def _registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from capstone_etl_spark.operators import (
        dedup,
        doc_similarity,
        events,
        multimodal,
        outputs,
        relational,
        similarity,
        streaming_queries,
        text_pipeline,
        textstats,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (
        text_pipeline,
        relational,
        events,
        dedup,
        similarity,
        textstats,
        outputs,
        streaming_queries,
        multimodal,
        doc_similarity,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLE_SQL)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
