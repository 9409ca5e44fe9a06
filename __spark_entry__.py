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
    """Flagship: the reference's composed output document — one row per
    page carrying hierarchy + counts + tokens + L2 norm together (the
    `wikibooks` collection, SURVEY.md §1.4.1), canonicalized. This is
    the full pipeline end-to-end: scan → clean/tokenize → stopword
    gate → TF → stats → token arrays → path derivation → hierarchy
    self-join → child aggregates → substring counts → assembly."""
    from capstone_etl_spark.operators.outputs import wikibooks_docs

    return wikibooks_docs(spark, "/root/testdata/sf0.001").orderBy("doc_id")


def _registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from capstone_etl_spark.operators import (
        corpus,
        dedup,
        doc_similarity,
        events,
        multimodal,
        outputs,
        rangejoin,
        relational,
        sampling,
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
        rangejoin,
        sampling,
        corpus,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLE_SQL)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
