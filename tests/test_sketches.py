"""Approximate-aggregate toolkit: the sketches that replace exact
distinct/percentile/top-k at 100 TB, pinned against their exact
counterparts with the error bounds Spark documents.

These are deliberately NOT driver queries: a sketch estimate has no
cross-engine hash-exact oracle (DuckDB's HLL is a different sketch).
What IS checkable — and what matters for the scale story — is that
each estimate lands inside its advertised error envelope and that the
sketch is mergeable/deterministic (HLL registers combine by max, so
the estimate is partitioning-independent; that property is the whole
reason it scales)."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def test_approx_count_distinct_within_rsd(spark):
    ev = _events(spark)
    exact = ev.select(F.countDistinct("user_id").alias("d")).collect()[0].d
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02).alias("d")).collect()[0].d
    # 2% rsd → allow 4 sigma
    assert abs(approx - exact) <= max(1, 0.08 * exact)


def test_approx_count_distinct_partitioning_independent(spark):
    """HLL registers merge by max — the estimate must not depend on how
    the data is partitioned (the property that makes it a one-pass
    distributed sketch rather than a shuffle)."""
    ev = _events(spark).select("props")
    a = ev.repartition(1).select(F.approx_count_distinct("props", 0.05).alias("d")).collect()[0].d
    b = ev.repartition(32).select(F.approx_count_distinct("props", 0.05).alias("d")).collect()[0].d
    assert a == b


def test_approx_percentile_within_rank_error(spark):
    """percentile_approx with accuracy N guarantees rank error ≤ 1/N:
    the estimate must sit between the exact values at ranks
    (q ± 1/N)·n."""
    ev = _events(spark)
    acc = 100
    got = ev.select(F.percentile_approx("value", 0.9, acc).alias("p")).collect()[0].p
    vals = sorted(r.value for r in ev.select("value").collect())
    n = len(vals)
    lo = vals[max(0, int((0.9 - 1.0 / acc) * n) - 1)]
    hi = vals[min(n - 1, int((0.9 + 1.0 / acc) * n))]
    assert lo <= got <= hi


def test_hll_sketch_agg_merge_equals_direct(spark):
    """The resumable form: hll_sketch_agg produces a binary sketch that
    hll_union_agg can merge across slices — estimate from merged
    per-type sketches == estimate over the whole table (same registers
    either way). This is the incremental/cube pattern: persist tiny
    sketches per partition, merge at query time, never rescan."""
    ev = _events(spark)
    whole = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d")
    ).collect()[0].d
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("d"))
        .collect()[0]
        .d
    )
    assert whole == merged


def test_bloom_membership_no_false_negatives_and_sane_fp(spark, sf_dir):
    """Positives all flag (defining Bloom property); the negative-probe
    flag rate sits in the ballpark of the theoretical
    (1 - e^(-kn/m))^k for the measured vocabulary size."""
    import math

    from capstone_etl_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_membership,
    )

    rows = {r.probe_set: r for r in bloom_membership(spark, sf_dir).collect()}
    pos, neg = rows["positive"], rows["negative"]
    assert pos.n_flagged == pos.n_probes and pos.flag_rate == 1.0
    n = pos.n_probes
    theo = (1 - math.exp(-BLOOM_K * n / BLOOM_BITS)) ** BLOOM_K
    assert neg.n_probes == n * 10
    # generous band: the filter is tiny, so variance is real
    assert 0.0 <= neg.flag_rate <= min(1.0, 4 * theo + 0.05)
