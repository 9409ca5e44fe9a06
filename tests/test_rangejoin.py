"""Binned interval join: equivalence with the naive range join on
boundary-heavy synthetic data."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.rangejoin import binned_interval_join


def test_binned_join_matches_naive_range_join(spark):
    # Points at bin edges, interval edges, and interior; intervals that
    # span multiple bins, fit inside one bin, and touch bin boundaries.
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 99, 100, 150, 199, 200, 250, 300, 999, 1000])],
        "pid long, ts_sec long",
    )
    intervals = spark.createDataFrame(
        [
            (0, 100, 200),    # exactly one bin (bin width 100)
            (1, 150, 250),    # straddles a bin boundary
            (2, 0, 1000),     # many bins
            (3, 199, 200),    # single point wide
            (4, 500, 600),    # covers no points
        ],
        "iid long, win_start long, win_end long",
    )
    got = {
        (r.pid, r.iid)
        for r in binned_interval_join(points, intervals, bin_sec=100).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("ts_sec") >= F.col("win_start")) & (F.col("ts_sec") < F.col("win_end")))
        .collect()
    }
    assert got == naive
    # half-open semantics: ts == win_start in, ts == win_end out
    assert (2, 0) in got and (5, 0) not in got
