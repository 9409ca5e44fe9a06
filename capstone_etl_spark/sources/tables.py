"""Table sources (SURVEY.md §2.1 S1).

The reference scans one SQLite table with a hand-written projection
(reference main.go:130); here every table is a columnar parquet scan and
Catalyst does projection/predicate pushdown. At cluster scale the same
call reads a partitioned directory tree; nothing below is local-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated star schema + text/embedding/event tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Pushdown-friendly: callers select/filter
    on the returned frame and Catalyst prunes at the parquet reader."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can be written in
    either DataFrame or SQL form against the same names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
