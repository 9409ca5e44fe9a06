"""Vocabulary + dense id assignment (SURVEY.md §2 A5, O3, O4).

The reference collects every kept token into a channel-serialized
concurrent map, drains it, sorts lexicographically, and uses the sorted
position as the token id (main.go:143-153, concurrentMap.go). In Spark
the entire 122-line ConcurrentMap is one `distinct()` shuffle, and the
dense id is a rank over the sorted vocabulary.

Dense sequential ids are the one operation that fights distribution
(SURVEY.md §7.5). Two strategies:

- `vocabulary`: row_number over an unpartitioned window. Correct and
  simple; the single-partition window only sees the *distinct vocab*
  (≈ hundreds of thousands of rows even at corpus scale — token
  vocabulary grows ~ Heaps' law, not linearly with corpus), so this is
  fine even at 100 TB of documents.
- `with_dense_ids`: sort + per-partition local rank + broadcast
  cumulative partition offsets. Fully distributed and fully
  DataFrame-native (no RDD/Python-row path): the sort is a range
  exchange; each partition ranks locally; the offset table is
  #partitions rows. Use for dense ids over *document-scale* relations
  where a global window would be a real bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vocabulary(tf: DataFrame, token_col: str = "token") -> DataFrame:
    """(token, token_id) with 0-based dense ids in lexicographic order
    (binary collation — matches Go's byte-wise sort, main.go:147)."""
    w = Window.orderBy(token_col)
    return (
        tf.select(token_col)
        .distinct()
        .select(F.col(token_col), (F.row_number().over(w) - 1).cast("long").alias("token_id"))
    )


def with_dense_ids(df: DataFrame, order_col: str, id_name: str = "id") -> DataFrame:
    """Distributed dense-id assignment without a single-partition window
    and without routing rows through Python (O2 at scale, SURVEY §7.5).

    Plan shape:
      1. range-partitioned global sort on order_col (partition p holds a
         contiguous, ascending key range — RangePartitioner assigns
         ranges to partition ids in order);
      2. local row_number within each partition (window partitioned by
         spark_partition_id — no cross-partition exchange);
      3. per-partition counts (#partitions rows) → running-sum offsets
         on the driver-sized relation → broadcast join back;
      4. id = offset + local rank.

    The sorted+ranked relation is cached: it feeds both the count
    aggregation and the final join, and caching also pins the
    partition-id assignment so both consumers see the same layout.
    Semantics identical to row_number()-1 over orderBy(order_col) for
    unique order keys."""
    local_w = Window.partitionBy("_pid").orderBy(order_col)
    ranked = (
        df.orderBy(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_local", F.row_number().over(local_w) - 1)
    ).cache()
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranked.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .select("_pid", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"))
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(id_name, (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_off")
    )


# Backwards-compatible alias (the zipWithIndex implementation was
# replaced — it pickled every row through Python workers).
with_dense_ids_zipindex = with_dense_ids
