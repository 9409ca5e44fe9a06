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
- `with_dense_ids_zipindex`: sort-then-zipWithIndex. Fully distributed
  (the sort is a range-partitioned exchange; index assignment is
  per-partition offset + local position, metadata-only). Use for dense
  ids over *document-scale* relations where a global window would be a
  real bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def vocabulary(tf: DataFrame, token_col: str = "token") -> DataFrame:
    """(token, token_id) with 0-based dense ids in lexicographic order
    (binary collation — matches Go's byte-wise sort, main.go:147)."""
    w = Window.orderBy(token_col)
    return (
        tf.select(token_col)
        .distinct()
        .select(F.col(token_col), (F.row_number().over(w) - 1).cast("long").alias("token_id"))
    )


def with_dense_ids_zipindex(df: DataFrame, order_col: str, id_name: str = "id") -> DataFrame:
    """Distributed dense-id assignment: global sort (range exchange) then
    zipWithIndex (two passes over partition sizes; no single-partition
    stage). Semantics identical to row_number()-1 over orderBy(order_col)
    for unique order keys."""
    sorted_df = df.orderBy(order_col)
    schema = T.StructType(sorted_df.schema.fields + [T.StructField(id_name, T.LongType(), False)])
    indexed = sorted_df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    return sorted_df.sparkSession.createDataFrame(indexed, schema)
