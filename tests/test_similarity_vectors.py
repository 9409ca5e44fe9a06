"""Vector functions + LSH bucket determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capstone_etl_spark.functions.vectors import cosine, dot, norm2
from capstone_etl_spark.operators.similarity import DIM, lsh_buckets


def test_dot_norm_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 4.0, 4.0]), ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        dot("a", "b").alias("d"), norm2("a").alias("na"), cosine("a", "b").alias("c")
    ).collect()
    assert rows[0].d == 18.0 and rows[0].na == 3.0 and math.isclose(rows[0].c, 1.0)
    assert rows[1].d == 0.0 and math.isclose(rows[1].c, 0.0)


def test_cosine_zero_vector_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>")
    assert df.select(cosine("a", "b").alias("c")).collect()[0].c is None


def test_lsh_buckets_identical_vectors_collide(spark):
    v = [float(i % 7) / 7 - 0.4 for i in range(DIM)]
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, [-x for x in v])], "vec_id long, embedding array<float>"
    )
    b = lsh_buckets(df).collect()
    by_vec = {}
    for r in b:
        by_vec.setdefault(r.vec_id, {})[r.tbl] = r.bucket
    assert by_vec[0] == by_vec[1]                      # same vector → same buckets
    # negated vector flips every sign bit → complement bucket in each table
    for t, bucket in by_vec[0].items():
        assert by_vec[2][t] == (~bucket) & 0xFF
