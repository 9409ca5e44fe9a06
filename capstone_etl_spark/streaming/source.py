"""File-stream source for the events table.

Structured Streaming's file source monitors a directory and processes
newly-listed files per micro-batch — the open-source stand-in for a
Kafka topic. `stage_events` materializes the (ts-normalized) events
table into a staging directory through the S4 parquet sink;
`events_stream` attaches a readStream to it. `max_files_per_trigger=1`
forces one staged file per micro-batch, so tests exercise genuine
multi-batch incremental state, not a single-batch degenerate run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from capstone_etl_spark.sinks.writers import write_parquet
from capstone_etl_spark.sources.tables import load_table


def stage_events(
    spark: SparkSession, sf_dir: str, staging_dir: str, n_files: int = 4
) -> DataFrame:
    """Write events as n_files parquet files into staging_dir; returns
    the staged batch frame (schema donor for the stream)."""
    ev = load_table(spark, sf_dir, "events").repartition(n_files)
    write_parquet(ev, staging_dir)
    return spark.read.parquet(staging_dir)


def events_stream(
    spark: SparkSession, staging_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """readStream over a staged events directory (schema inferred from
    the staged files — file streams require an explicit schema)."""
    schema = spark.read.parquet(staging_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(staging_dir)
