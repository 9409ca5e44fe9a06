"""Skew mitigation for heavy-hitter join keys (100 TB design tool).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew by splitting oversized partitions of a sort-merge join. Salting is
the explicit, planner-independent fallback when one key dominates so
hard that even split partitions bottleneck, or when the skewed side
must hash-join: the skewed (large) side scatters each key across
`n_salt` sub-keys; the other side is replicated n_salt×, so every
sub-partition carries ~1/n_salt of the hot key's rows.

Cost model: replication multiplies the small side by n_salt — use only
when |small| · n_salt ≪ |large-side hot key|, and keep n_salt near the
cluster's parallelism for the hot key's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(n_salt: int) -> Column:
    """Round-robin salt in [0, n_salt) from the per-row id — uniform
    scatter even when every row of the hot key is byte-identical
    (content hashes collapse duplicates into one bucket)."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed ⋈ other` on column `on`, scattering the skewed
    side over n_salt sub-keys and replicating `other` to match.

    The salt is derived from a per-ROW id (monotonically_increasing_id:
    partition ordinal + row position), not from row content — hashing
    content degenerates when the hot key's rows are duplicates: every
    copy lands in ONE salt bucket and the skew survives (ADVICE r3).
    Consecutive rows cycle round-robin through the n_salt sub-keys, so
    scatter is uniform regardless of content. Stable for a given
    partitioning of `skewed` (ids are per-partition deterministic, so
    task retries re-derive the same salt). Supported `how`: inner /
    left (semantics preserved because every skewed row keeps exactly
    its original match set within its salt bucket)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = salt_column(n_salt)
    lhs = skewed.withColumn("_salt", salt)
    rhs = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return lhs.join(rhs, [on, "_salt"], how).drop("_salt")
