"""CSV / JSON-lines file sources (engine completeness beyond parquet).

A user migrating from the reference may hold CSV or JSON data; these
readers are the ingestion counterparts of the sinks in sinks/writers.py
(write_json/write_csv ↔ read_json/read_csv round-trip, tested).

Scale notes: always pass an explicit schema in production — schema
inference is a full extra pass over the data. CSV/JSON are row-oriented
and non-splittable-when-compressed; land them into parquet (via the S4
sink) as the first pipeline step and query the columnar copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC source — the other splittable columnar format (schema rides
    in the footer like parquet; pass one only to enforce a contract)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
