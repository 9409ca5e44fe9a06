"""checkpoint_truncate must track ONLY its own persisted RDD. A lazy
shared SQL cache that happens to materialize during the checkpoint job
must NOT be claimed — releasing the checkpoint would silently unpersist
a cache other consumers still rely on (ADVICE r3, medium). Also pins
the reliable-checkpoint release contract: checkpoint FILES are deleted,
not left to accumulate on disk."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from capstone_etl_spark.session import (
    checkpoint_truncate,
    release_caches,
    release_checkpoint,
)


def _persisted_ids(spark) -> set[int]:
    ids = set()
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        ids.add(it.next().getKey())
    return ids


def test_release_checkpoint_spares_shared_cache(spark):
    spark.catalog.clearCache()
    release_caches()
    base = spark.range(0, 1000).select("id", (F.col("id") % 7).alias("k"))
    shared = base.groupBy("k").agg(F.count("*").alias("n")).cache()  # LAZY
    derived = shared.withColumn("x", F.col("n") * 2)

    before = _persisted_ids(spark)
    out = checkpoint_truncate(derived)  # materializes `shared` mid-job
    assert out.count() == 7
    release_checkpoint(out)

    # the shared cache materialized during the checkpoint job and must
    # still be persisted after the checkpoint is released
    still = _persisted_ids(spark) - before
    assert len(still) == 1, "shared cache was unpersisted with the checkpoint"
    assert shared.storageLevel.useMemory
    shared.unpersist()


def test_reliable_checkpoint_files_deleted_on_release(spark, tmp_path):
    sc = spark.sparkContext
    ckpt_dir = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt_dir)
    try:
        out = checkpoint_truncate(spark.range(0, 100).select("id"))
        assert out.count() == 100
        files_before = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
        assert files_before > 0, "reliable checkpoint wrote nothing?"
        release_checkpoint(out)
        files_after = sum(len(fs) for _, _, fs in os.walk(ckpt_dir))
        assert files_after == 0, "checkpoint files survived release"
    finally:
        # unset so later tests take the localCheckpoint path again
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_user_value_rank_profile_single_user_matches_percent_rank(spark, tmp_path):
    # n == 1: PERCENT_RANK is defined as 0.0; _rid/(n-1) alone is 0/0.
    from capstone_etl_spark.operators.events import user_value_rank_profile

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5, "purchase", 10.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(f"{tmp_path}/events.parquet")
    row = user_value_rank_profile(spark, str(tmp_path)).collect()[0]
    assert row["pct_rank"] == 0.0
    assert row["cume"] == 1.0
    assert row["p50ish_value"] == 10.0
