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


def dot_long(a: Column | str, b: Column | str) -> Column:
    """Exact BIGINT dot over two array<long> columns. Every product and
    the fold are integer ops, so the result is identical under ANY
    summation order — immune to the SIMD-width / codegen reassociation
    that makes chained double folds host-dependent (a chained IEEE
    double sum is only reproducible if every engine adds in the same
    order; DuckDB's vectorized list_sum and Spark's codegen'd aggregate
    make no such promise across builds/CPUs)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_cosine(
    qa: Column | str, qb: Column | str, n2a: Column | str, n2b: Column | str
) -> Column:
    """Cross-engine-stable cosine RANK KEY over fixed-point vectors
    (quantize_fp's floor(v·S + 0.5) grid): the dot and both squared
    norms are exact integers (order-free in any engine), and the only
    float ops are two sqrts, one multiply and one divide — each an
    IEEE-754 correctly-rounded op on bit-identical inputs, hence
    bit-identical outputs on every engine/host. No ROUND is needed (or
    wanted) on top: the double itself is reproducible by construction.
    NULL-safe on zero (all-quantized-to-0) vectors. `n2a`/`n2b` are the
    precomputed dot_long(q, q) columns — the norm-precompute
    discipline, one fold per pair instead of three."""
    return F.when(
        (_c(n2a) > 0) & (_c(n2b) > 0),
        dot_long(qa, qb).cast("double")
        / (F.sqrt(_c(n2a).cast("double")) * F.sqrt(_c(n2b).cast("double"))),
    ).otherwise(F.lit(None))
