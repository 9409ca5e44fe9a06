"""Vocabulary + dense id assignment (SURVEY.md §2 A5, O3, O4).

The reference collects every kept token into a channel-serialized
concurrent map, drains it, sorts lexicographically, and uses the sorted
position as the token id (main.go:143-153, concurrentMap.go). In Spark
the entire 122-line ConcurrentMap is one `distinct()` shuffle, and the
dense id is a rank over the sorted vocabulary.

Dense sequential ids are the one operation that fights distribution
(SURVEY.md §7.5). `with_dense_ids` solves it once — sort + per-partition
local rank + broadcast cumulative partition offsets, fully distributed
and fully DataFrame-native (no RDD/Python-row path): the sort is a range
exchange; each partition ranks locally; the offset table is #partitions
rows. `vocabulary` (and every rank/ntile/percent_rank derivation in
operators/) builds on it, so no registered query carries an
unpartitioned window over an unbounded relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from capstone_etl_spark.functions.windows import bounded_window_key
from capstone_etl_spark.session import cached


def vocabulary(tf: DataFrame, token_col: str = "token") -> DataFrame:
    """(token, token_id) with 0-based dense ids in lexicographic order
    (binary collation — matches Go's byte-wise sort, main.go:147).

    Ids come from the fully distributed `with_dense_ids` (range sort +
    partition-offset rank), so even a vocabulary far past the Heaps-law
    expectation never funnels through a single-partition window."""
    return with_dense_ids(tf.select(token_col).distinct(), token_col, "token_id").select(
        token_col, "token_id"
    )


def with_dense_ids(df: DataFrame, order_col, id_name: str = "id") -> DataFrame:
    """Distributed dense-id assignment without a single-partition window
    and without routing rows through Python (O2 at scale, SURVEY §7.5).

    order_col: one column (name or Column, possibly .desc()) or a list
    of them — the total order the ids follow.

    Plan shape:
      1. range-partitioned global sort on the order cols (partition p
         holds a contiguous key range — RangePartitioner assigns
         ranges to partition ids in order);
      2. local row_number within each partition (window partitioned by
         spark_partition_id — no cross-partition exchange);
      3. per-partition counts (#partitions rows) → running-sum offsets
         on the driver-sized relation → broadcast join back;
      4. id = offset + local rank.

    The offsets window is pinned to a single explicit partition
    (`bounded_window_key`): its input is at most
    spark.sql.shuffle.partitions rows (one per partition of the sorted
    relation) at ANY data scale, so the single-partition stage is
    bounded by construction, and the explicit key keeps the plan free
    of unpartitioned-window stages.

    The sorted+ranked relation is cached: it feeds both the count
    aggregation and the final join, and caching also pins the
    partition-id assignment so both consumers see the same layout.
    Semantics identical to row_number()-1 over orderBy(order_col) for
    unique order keys."""
    cols = list(order_col) if isinstance(order_col, (list, tuple)) else [order_col]
    local_w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = (
        df.orderBy(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_local", F.row_number().over(local_w) - 1)
    ).transform(cached)
    off_w = (
        # bound: ≤ spark.sql.shuffle.partitions rows (one per _pid)
        Window.partitionBy(bounded_window_key("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
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
