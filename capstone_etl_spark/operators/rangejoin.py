"""Binned range (interval-overlap) join — the equi-join decomposition
of a range predicate, for when BOTH sides are too big to broadcast.

Spark has no native range-join optimization: `e JOIN i ON e.ts BETWEEN
i.start AND i.end` plans as a BroadcastNestedLoopJoin (fine only while
one side is small). The scale pattern is to coarsen the range key into
fixed-width bins: points get their containing bin, intervals EXPLODE
into every bin they cover, the join becomes an equi-join on bin (hash
shuffle, AQE-skew-splittable), and the exact range predicate runs as a
residual filter. A point has exactly ONE bin, so each (point, interval)
pair can match at most once — no post-join dedup. Cost is
|intervals| × (len/bin + 1) replicated rows, tunable via bin width.

The reference has no range join (SURVEY.md §2.3 "not present"); this is
extension-layer, same family as the as-of join (events.py:231).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from capstone_etl_spark.sources.tables import load_table

BIN_SEC = 3600
TOP_HOURS_PER_TYPE = 3
WIN_BACK_SEC = 1800          # campaign window: hour start − 30 min …
WIN_FWD_SEC = 5400           # … hour start + 90 min (2 h, bin-UNaligned)


def binned_interval_join(
    points: DataFrame, intervals: DataFrame, bin_sec: int = BIN_SEC
) -> DataFrame:
    """Join point rows (col `ts_sec`) to interval rows (cols `win_start`,
    `win_end`, half-open [start, end)) via bin equi-join + residual
    range filter. Both inputs may be arbitrarily large."""
    p = points.withColumn("bin", F.floor(F.col("ts_sec") / bin_sec))
    iv = intervals.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("win_start") / bin_sec),
                F.floor((F.col("win_end") - 1) / bin_sec),
            )
        ),
    )
    return (
        p.join(iv, "bin")
        .filter((F.col("ts_sec") >= F.col("win_start")) & (F.col("ts_sec") < F.col("win_end")))
        .drop("bin")
    )


def campaign_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive 'campaign' intervals — per event_type, the top-3 revenue
    hours, widened to a bin-unaligned 2 h window — then range-join ALL
    events into them and aggregate. Interval ranking compares the exact
    DECIMAL sums (a double conversion could collapse near-ties in one
    engine and not the other); the join is the binned equi-join above,
    never a nested loop."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_sec"),
        "value",
    )
    hourly = ev.groupBy(
        "event_type", (F.floor(F.col("ts_sec") / BIN_SEC) * BIN_SEC).alias("hour_start")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("hour_value"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("hour_value").desc(), F.col("hour_start")
    )
    intervals = (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_HOURS_PER_TYPE)
        .select(
            F.col("event_type").alias("campaign_type"),
            (F.col("hour_start") - WIN_BACK_SEC).alias("win_start"),
            (F.col("hour_start") + WIN_FWD_SEC).alias("win_end"),
        )
    )
    joined = binned_interval_join(ev.drop("event_type"), intervals)
    return joined.groupBy("campaign_type", "win_start").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


CAMPAIGN_WINDOW_STATS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, FLOOR(epoch(ts))::BIGINT AS ts_sec, value FROM events
), hourly AS (
  SELECT event_type, (ts_sec // {BIN_SEC}) * {BIN_SEC} AS hour_start,
         SUM(CAST(value AS DECIMAL(18,2))) AS hour_value
  FROM ev GROUP BY 1, 2
), top_hours AS (
  SELECT event_type, hour_start FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY hour_value DESC, hour_start) AS rnk
    FROM hourly
  ) WHERE rnk <= {TOP_HOURS_PER_TYPE}
), ivs AS (
  SELECT event_type AS campaign_type,
         hour_start - {WIN_BACK_SEC} AS win_start,
         hour_start + {WIN_FWD_SEC} AS win_end
  FROM top_hours
)
SELECT i.campaign_type, i.win_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM ev e JOIN ivs i ON e.ts_sec >= i.win_start AND e.ts_sec < i.win_end
GROUP BY 1, 2
"""


QUERIES = {
    "campaign_window_stats": campaign_window_stats,
}

ORACLE_SQL = {
    "campaign_window_stats": CAMPAIGN_WINDOW_STATS_SQL,
}
