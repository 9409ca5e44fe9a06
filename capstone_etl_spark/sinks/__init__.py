"""Batch sinks (SURVEY.md §2.1 S4) — the engine's output side."""

from capstone_etl_spark.sinks.writers import (  # noqa: F401
    merge_upsert,
    read_back,
    write_bucketed,
    write_csv,
    write_json,
    write_outputs,
    write_parquet,
)
