"""Pairwise-preference ranking over corpus sources (LLM-pipeline
extension; no reference analogue — the reference stops at per-doc
stats, main.go:247-283).

RLHF / data-curation pipelines constantly answer "which source wins
head-to-head?" from pairwise judgments (human prefs, LLM-judge votes,
quality duels). This module synthesizes a deterministic duel table
from the corpus itself — per hash-bucket champions fight across
sources — and fits a Bradley-Terry strength per source by fixed
unrolled minorization-maximization (MM) iterations:

    r_i  <-  w_i / Σ_j  n_ij / (r_i + r_j)

(w_i = total wins of i, n_ij = games between i and j), anchored each
round so max r = 1. Elo is the online approximation of this model;
the batch MM fit is the right shape for a distributed engine.

Scale (100 TB): the ONLY corpus-sized work is one groupBy((bucket,
source)) champion aggregation — everything downstream is bounded by
BT_BUCKETS·|sources| duel rows and |sources| rating rows regardless
of corpus size, so the five unrolled iterations run on single-task
relations (pca_power_iteration's recipe). No windows, no driver
actions; the per-round max anchor is a 1-row broadcast (allowlisted
cartesian).

Exactness: champions are chosen by min(md5, doc_id) — pure integer
comparison; duel winners by (n_chars, source) — pure integer/string
comparison; ratings live in int64 BT_SCALE fixed-point with every
division floor(x + 0.5)-snapped in DOUBLE on identical int64 operands
(hierarchy_pagerank's recipe), so both engines agree to the unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capstone_etl_spark.functions.hashing import md5_hash60, md5_hash60_sql
from capstone_etl_spark.session import cached, checkpoint_truncate
from capstone_etl_spark.sources.tables import load_table

BT_BUCKETS = 128     # duel arenas; champions per (bucket, source)
BT_SCALE = 100_000   # fixed-point rating units (max anchor = BT_SCALE)
BT_ITERS = 5         # unrolled MM rounds
_S2 = float(BT_SCALE) * float(BT_SCALE)  # 1e10 — exact in double


def _champions(docs: DataFrame) -> DataFrame:
    """One champion doc per (bucket, source): min (h, doc_id, n_chars)
    with h an md5 of the doc id — deterministic, order-free, and the
    only corpus-sized aggregation in the query."""
    sid = F.col("doc_id").cast("string")
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            (md5_hash60(F.concat(F.lit("duel:"), sid)) % BT_BUCKETS).alias("bucket"),
            md5_hash60(F.concat(F.lit("rep:"), sid)).alias("h"),
        )
        .groupBy("bucket", "source")
        .agg(F.min(F.struct("h", "doc_id", "n_chars")).alias("c"))
        .select("bucket", "source", F.col("c.doc_id").alias("doc_id"), F.col("c.n_chars").alias("n_chars"))
    )


def bt_source_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_games, n_wins, bt_rating) — Bradley-Terry strength of
    every source that played ≥ 1 duel (sources whose champions never
    share a bucket with another source have no evidence and are
    absent, exactly like dsir's no-feature docs).

    Duel rule: within a bucket every cross-source champion pair plays
    once; the champion with more n_chars wins, ties to the
    lexicographically smaller source. The rule is arbitrary but FIXED —
    the operator under test is the BT fit, and a real deployment feeds
    its own (prompt, a, b, winner) table into the same shape."""
    docs = load_table(spark, sf_dir, "documents")
    reps = _champions(docs)
    a = reps.select(
        "bucket",
        F.col("source").alias("s_a"),
        F.col("n_chars").alias("c_a"),
    )
    b = reps.select(
        "bucket",
        F.col("source").alias("s_b"),
        F.col("n_chars").alias("c_b"),
    )
    win_a = (F.col("c_a") >= F.col("c_b")).cast("long")  # tie -> s_a (s_a < s_b)
    # pairs is bounded by |sources|² rows — single-partition the MM loop
    # so five unrolled rounds run one task apiece (pca's recipe)
    pairs = cached(
        a.join(b, "bucket")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count("*").alias("n"), F.sum(win_a).alias("w_a"))
        .repartition(1)
    )
    totals = cached(
        pairs.select(F.col("s_a").alias("source"), F.col("n"), F.col("w_a").alias("w"))
        .unionByName(
            pairs.select(
                F.col("s_b").alias("source"), F.col("n"), (F.col("n") - F.col("w_a")).alias("w")
            )
        )
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_games"), F.sum("w").cast("long").alias("n_wins"))
        .repartition(1)
    )
    r = totals.select("source", F.lit(BT_SCALE).cast("long").alias("r"))
    for _ in range(BT_ITERS):
        t = (
            pairs.join(r.select(F.col("source").alias("s_a"), F.col("r").alias("r_a")), "s_a")
            .join(r.select(F.col("source").alias("s_b"), F.col("r").alias("r_b")), "s_b")
            .select(
                "s_a",
                "s_b",
                F.floor(
                    F.col("n").cast("double")
                    * F.lit(_S2)
                    / (F.col("r_a") + F.col("r_b")).cast("double")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("t"),
            )
        )
        # both roles exploded from one pass — a union of two selects
        # would embed t's join subtree twice per round (the
        # dedup_containment plan lesson)
        d = (
            t.select(
                F.explode(
                    F.array(
                        F.struct(F.col("s_a").alias("source"), F.col("t").alias("t")),
                        F.struct(F.col("s_b").alias("source"), F.col("t").alias("t")),
                    )
                ).alias("e")
            )
            .select("e.*")
            .groupBy("source")
            .agg(F.sum("t").alias("d"))
        )
        # clamp to >= 1 fixed-point unit: a winless source's MM update
        # floors to 0, and a 0 rating can reach the (r_a + r_b) divisor
        # next round — under this session's ANSI mode Spark's x/0
        # throws DIVIDE_BY_ZERO mid-job where DuckDB (IEEE) quietly
        # yields inf, i.e. one engine crashes and the other silently
        # diverges (ADVICE r6). The clamp makes the divisor provably
        # positive on both. GREATEST mirror in the oracle.
        u = totals.join(d, "source").select(
            "source",
            F.greatest(
                F.floor(
                    F.col("n_wins").cast("double") * F.lit(_S2) / F.col("d").cast("double")
                    + F.lit(0.5)
                ).cast("long"),
                F.lit(1).cast("long"),
            ).alias("r"),
        )
        # cut lineage BEFORE u is referenced twice (once by the max
        # anchor, once by the rescale): each MM round otherwise embeds
        # the previous round's plan 4-6x over and Catalyst analysis
        # goes exponential — the CC-loop lesson (dedup.py)
        u = checkpoint_truncate(u)
        mx = u.agg(F.max("r").alias("m"))
        r = u.crossJoin(F.broadcast(mx)).select(
            "source",
            F.greatest(
                F.floor(
                    F.col("r").cast("double") * F.lit(float(BT_SCALE)) / F.col("m").cast("double")
                    + F.lit(0.5)
                ).cast("long"),
                F.lit(1).cast("long"),
            ).alias("r"),
        )
    return totals.join(r, "source").select(
        "source",
        "n_games",
        "n_wins",
        (F.col("r").cast("double") / F.lit(float(BT_SCALE))).alias("bt_rating"),
    )


def _bt_sql() -> str:
    champ_h = md5_hash60_sql("'rep:' || CAST(doc_id AS VARCHAR)")
    duel_h = md5_hash60_sql("'duel:' || CAST(doc_id AS VARCHAR)")
    bucket = f"{duel_h} % {BT_BUCKETS}"
    iters = []
    prev = "b0"
    for i in range(1, BT_ITERS + 1):
        iters.append(
            f"""
t{i} AS MATERIALIZED (
  SELECT p.s_a, p.s_b,
         CAST(floor(p.n * {_S2} / (ra.r + rb.r) + 0.5) AS BIGINT) AS t
  FROM pairs p
  JOIN {prev} ra ON ra.source = p.s_a
  JOIN {prev} rb ON rb.source = p.s_b
),
d{i} AS MATERIALIZED (
  SELECT source, CAST(SUM(t) AS BIGINT) AS d FROM (
    SELECT s_a AS source, t FROM t{i}
    UNION ALL
    SELECT s_b AS source, t FROM t{i}
  ) GROUP BY source
),
u{i} AS MATERIALIZED (
  SELECT tt.source,
         GREATEST(CAST(floor(tt.n_wins * {_S2} / d.d + 0.5) AS BIGINT), 1) AS r
  FROM totals tt JOIN d{i} d USING (source)
),
b{i} AS MATERIALIZED (
  SELECT u.source,
         GREATEST(CAST(floor(u.r * {float(BT_SCALE)} / m.m + 0.5) AS BIGINT), 1) AS r
  FROM u{i} u CROSS JOIN (SELECT MAX(r) AS m FROM u{i}) m
)"""
        )
        prev = f"b{i}"
    return f"""
WITH hashed AS MATERIALIZED (
  SELECT source, doc_id, n_chars,
         {bucket} AS bucket,
         {champ_h} AS h
  FROM documents
),
reps AS MATERIALIZED (
  SELECT bucket, source, doc_id, n_chars FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY bucket, source ORDER BY h, doc_id, n_chars
    ) AS rn
    FROM hashed
  ) WHERE rn = 1
),
pairs AS MATERIALIZED (
  SELECT a.source AS s_a, b.source AS s_b,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN a.n_chars >= b.n_chars THEN 1 ELSE 0 END) AS BIGINT) AS w_a
  FROM reps a JOIN reps b ON a.bucket = b.bucket AND a.source < b.source
  GROUP BY 1, 2
),
totals AS MATERIALIZED (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_games, CAST(SUM(w) AS BIGINT) AS n_wins FROM (
    SELECT s_a AS source, n, w_a AS w FROM pairs
    UNION ALL
    SELECT s_b AS source, n, n - w_a AS w FROM pairs
  ) GROUP BY source
),
b0 AS MATERIALIZED (SELECT source, CAST({BT_SCALE} AS BIGINT) AS r FROM totals),{",".join(iters)}
SELECT t.source, t.n_games, t.n_wins,
       CAST(f.r AS DOUBLE) / {float(BT_SCALE)} AS bt_rating
FROM totals t JOIN {prev} f USING (source)
"""


BT_SOURCE_RATINGS_SQL = _bt_sql()


QUERIES = {
    "bt_source_ratings": bt_source_ratings,
}

ORACLE_SQL = {
    "bt_source_ratings": BT_SOURCE_RATINGS_SQL,
}
