"""Run a streaming query to completion and hand back its result.

`Trigger.AvailableNow` processes everything currently in the source
(respecting maxFilesPerTrigger batching) and stops — the streaming
analogue of a batch run, with real incremental state underneath. The
memory sink holds the sink table in the driver; fine for test/driver
scales, swapped for a parquet/Kafka sink in production (the writers in
sinks/writers.py are the batch halves of that story).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

_COUNTER = itertools.count()


def run_to_memory(
    sdf: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
    name: str | None = None,
    timeout_sec: int = 300,
    once: bool = False,
) -> DataFrame:
    """Start sdf → memory sink, await termination, return the sink
    table. output_mode: 'complete' for aggregations, 'append' for
    dedup/map-only streams. Default trigger is availableNow (drain a
    BOUNDED source and stop); pass once=True for UNBOUNDED sources
    (rate/Kafka) where "everything available" never ends — one
    micro-batch, then stop."""
    spark: SparkSession = sdf.sparkSession
    qname = name or f"mem_sink_{next(_COUNTER)}"
    writer = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    writer = writer.trigger(once=True) if once else writer.trigger(availableNow=True)
    q = writer.start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(f"streaming query {qname} exceeded {timeout_sec}s")
    finally:
        if q.isActive:
            q.stop()
    return spark.table(qname)
