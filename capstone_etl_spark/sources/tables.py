"""Table sources (SURVEY.md §2.1 S1).

The reference scans one SQLite table with a hand-written projection
(reference main.go:130); here every table is a columnar parquet scan and
Catalyst does projection/predicate pushdown. At cluster scale the same
call reads a partitioned directory tree; nothing below is local-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    on the returned frame and Catalyst prunes at the parquet reader.

    events.ts normalizes to session-zone TimestampType whatever the
    writer emitted, so downstream `ts.cast("long")` (epoch seconds)
    always resolves and matches DuckDB's epoch(ts):
    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it — read as
      a nanos LONG (legacy conf, runtime-settable) and truncate to
      micros, matching DuckDB's own nanos→micros truncation.
    - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
      TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ.enabled
      defaults true), and NTZ→BIGINT is not a legal cast — convert to
      TIMESTAMP, which interprets the wall-clock in the session zone
      (pinned UTC in session.py), exactly how DuckDB treats the same
      naive micros."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div keeps exactness (double division drifts at 1e18)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can be written in
    either DataFrame or SQL form against the same names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
