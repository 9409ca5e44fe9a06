"""SparkSession factory.

Local-mode defaults are tuned for the driver harness (local[N] with a
shared driver JVM); the same conf names are the ones to tune on a real
cluster. Everything here is stock Spark conf — no custom extensions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "capstone-etl-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on: runtime partition coalescing + skew-join splitting, so a
      plan sized for 100 TB doesn't over-shuffle at test scale.
    - shuffle partitions sized to cores locally (the 200 default is
      wrong at both ends of the scale range; at cluster scale AQE
      coalesces from a deliberately-high initial number).
    - UTC session timezone so timestamp semantics match the DuckDB
      oracle exactly.
    - Arrow enabled for the few pandas-backed operators (stateful
      streaming via applyInPandasWithState, multimodal decode stubs
      via mapInPandas) — everything else is JVM-side.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(min(int(cpus), 32))))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
