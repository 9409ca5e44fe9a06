"""Window helpers for provably bounded inputs.

Spark's WindowExec warns ("No Partition Defined … Moving all data to a
single partition") whenever a window's partition spec is EMPTY — the
right warning when the window input grows with the data, pure noise
when the input is bounded by construction (a per-partition offset table
capped at spark.sql.shuffle.partitions rows, a top-K slice capped by
the constant K, a per-calendar-month rollup).

`bounded_window_key` gives those windows an explicit single-partition
key: a constant-valued (hash(col) mod 1 == 0) but NON-FOLDABLE
expression, so Catalyst keeps it in the partition spec (a literal would
be constant-folded away and the plan would regress to the
empty-partition-spec shape). The plan then shows a real hash partition
spec and the single-partition stage is a stated, audited decision —
enforced by tests/test_plans.py::test_no_unpartitioned_windows_in_registered_queries.

Use ONLY when the window input is bounded by a constant or a config,
never by data volume; unbounded global orderings belong in
operators.vocab.with_dense_ids (distributed range-sort + offset rank).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bounded_window_key(col: str | Column) -> Column:
    """Constant-valued, non-foldable partition key (always 0)."""
    return F.pmod(F.xxhash64(col), F.lit(1))
