"""Dense-vector column functions over array<float|double> columns.

All JVM-side higher-order functions (`zip_with` + `aggregate`) — no
Python in the hot path. Used by the similarity / dedup extension
operators (SURVEY.md §7.8); the reference only ever computes the L2
norm of a sparse TF vector (main.go:272-281) "for use later with
similarities" — these complete that intent for dense embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen'd)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column | str) -> Column:
    """L2 norm of a dense vector."""
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(None))
