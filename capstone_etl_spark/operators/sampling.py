"""Deterministic sampling / dataset-split operators for training-data
pipelines.

Random sampling is wrong for reproducible corpus construction — resifting
on every run, impossible to oracle, and unstable under retries at 100 TB.
The standard fix is SALTED-HASH bucketing: bucket = h(salt || stable_id)
mod 100; membership is a pure per-row expression (no shuffle, no state,
trivially re-runnable on any subset of the data), and changing the salt
re-draws the sample without touching the data. The same md5-derived hash
as the dedup/LSH layer (functions/hashing.py) keeps it engine-portable,
so both assignments are DuckDB-oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from capstone_etl_spark.functions.hashing import md5_hash60, md5_hash60_sql
from capstone_etl_spark.sources.tables import load_table

SPLIT_SALT = "split:v1:"
TRAIN_PCT = 90
VAL_PCT = 5            # val = [90, 95), test = [95, 100)

SAMPLE_SALT = "sample:v1:"
# Per-language keep percentages: downsample the head language, keep the
# low-resource tail (the classic corpus-balancing move).
STRATUM_PCT: dict[str, int] = {"en": 10, "de": 50, "es": 50, "fr": 50, "zh": 50}
# Languages outside the configured strata keep at this explicit default.
# A NULL rate would make `bucket < rate` silently FALSE and drop every
# unknown language — a data-loss trap when a new language lands in the
# corpus (ADVICE r3).
DEFAULT_STRATUM_PCT = 50


def _bucket(salt: str, id_col: Column) -> Column:
    return md5_hash60(F.concat(F.lit(salt), id_col.cast("string"))) % 100


def _bucket_sql(salt: str, id_expr: str) -> str:
    inner = f"'{salt}' || CAST({id_expr} AS VARCHAR)"
    return f"({md5_hash60_sql(inner)} % 100)"


def split_column(id_col: Column) -> Column:
    """'train'/'val'/'test' from the salted hash bucket of a stable id."""
    b = _bucket(SPLIT_SALT, id_col)
    return (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


def split_sql_case(id_expr: str) -> str:
    """DuckDB mirror of split_column."""
    b = _bucket_sql(SPLIT_SALT, id_expr)
    return (
        f"CASE WHEN {b} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {b} < {TRAIN_PCT + VAL_PCT} THEN 'val' ELSE 'test' END"
    )


def doc_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment per document — stable under reruns,
    data reorderings, and partial recomputation, because membership
    depends only on (salt, doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", split_column(F.col("doc_id")).alias("split"))


DOC_SPLITS_SQL = f"""
SELECT doc_id, lang, {split_sql_case('doc_id')} AS split
FROM documents
"""


def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep rates via the same hash-bucket trick: keep iff
    bucket < rate(lang), unknown languages at DEFAULT_STRATUM_PCT (never
    silently dropped). Pure per-row predicate — pushes straight into
    the scan, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(SAMPLE_SALT, F.col("doc_id"))
    rate = F.lit(DEFAULT_STRATUM_PCT)
    for lang, pct in sorted(STRATUM_PCT.items()):
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return docs.filter(b < rate).select("doc_id", "lang", "n_chars")


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in sorted(STRATUM_PCT.items())
)

DOC_SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_bucket_sql(SAMPLE_SALT, 'doc_id')} < (CASE {_RATE_CASE} ELSE {DEFAULT_STRATUM_PCT} END)
"""


RESERVOIR_K = 50
RESERVOIR_SALT = "reservoir:v1:"


def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-group sample: the K documents with the smallest
    salted hash within each source — the distributed, deterministic
    equivalent of reservoir sampling (uniform over the group, exactly
    min(K, |group|) rows, stable under reruns/reorder/retry because
    membership depends only on (salt, doc_id); a different salt redraws
    the sample without touching the data).

    Scale: bottom-K-by-hash per group is the KMV selection shape — at
    true 100 TB the rank window drops to a per-partition bottom-K merge
    (K rows per group per partition are all that ever cross the wire);
    here the window partitions per source, sized for the test SFs
    (same justification as sketches.kmv_distinct_shingles)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash60(F.concat(F.lit(RESERVOIR_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.select("source", "doc_id", "lang", h.alias("h"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= RESERVOIR_K)
        .select("source", "doc_id", "lang", "rnk")
    )


_RES_HASH = md5_hash60_sql(f"'{RESERVOIR_SALT}' || CAST(doc_id AS VARCHAR)")

RESERVOIR_SAMPLE_SQL = f"""
SELECT source, doc_id, lang, rnk FROM (
  SELECT source, doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY {_RES_HASH}, doc_id) AS rnk
  FROM documents
) t WHERE rnk <= {RESERVOIR_K}
"""


SHUFFLE_SALT = "shuffle:v1:"
N_SHARDS = 16


def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment —
    the step that turns a curated corpus into the epoch-stable read
    order a trainer consumes: shard = h % N_SHARDS, position within
    the shard (and globally) by ascending salted hash. Re-running on
    any subset, any partitioning, any day yields the same order;
    changing the salt is a fresh epoch permutation.

    Scale: the hash and shard are per-row expressions; positions come
    from the fully distributed dense-id machinery (vocab.with_dense_ids
    — range sort + per-partition rank + broadcast offsets; no
    single-partition window, SURVEY §7.5) over the total order
    (shard, h, doc_id). Per-shard positions are then global_pos minus
    the shard's first global_pos — an N_SHARDS-row aggregate broadcast
    back, so shard_pos never needs its own window over a 1/N_SHARDS
    slice of the corpus."""
    from capstone_etl_spark.operators.vocab import with_dense_ids

    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash60(F.concat(F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string")))
    base = docs.select("doc_id", h.alias("h"), (h % N_SHARDS).alias("shard"))
    ids = with_dense_ids(base, ["shard", "h", "doc_id"], "global_pos")
    offs = ids.groupBy("shard").agg(F.min("global_pos").alias("_s0"))
    return ids.join(F.broadcast(offs), "shard").select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        (F.col("global_pos") - F.col("_s0")).cast("long").alias("shard_pos"),
        F.col("global_pos").cast("long").alias("global_pos"),
    )


_SHUF_HASH = md5_hash60_sql(f"'{SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)")

TRAINING_SHUFFLE_SQL = f"""
WITH base AS (
  SELECT doc_id, {_SHUF_HASH} AS h, {_SHUF_HASH} % {N_SHARDS} AS shard
  FROM documents
)
SELECT doc_id,
       CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS shard_pos,
       CAST(ROW_NUMBER() OVER (ORDER BY shard, h, doc_id) - 1 AS BIGINT) AS global_pos
FROM base
"""


WEIGHTED_K = 100
WEIGHTED_SALT = "wsample:v1:"


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis A-ES scheme: draw u_i ~ Uniform(0,1] per row,
    keep the K rows with the SMALLEST -ln(u_i)/w_i (an Exp(w_i) draw,
    so inclusion probability is proportional to weight). Here the
    weight is n_chars — the "sample by token mass, not by document
    count" move that keeps a length-weighted eval slice honest.

    Determinism: u_i = (h_i + 1)/2^60 from the salted portable hash,
    so the draw depends only on (salt, doc_id) — rerun/reorder/retry
    stable, and a new salt redraws. The sort key snaps to
    DECIMAL(28,12) with a doc_id tiebreak, so both engines select the
    identical K.

    Scale: the key is a per-row expression; global bottom-K is
    Spark's distributed TakeOrdered (per-partition top-K, K rows per
    partition merge at the driver) — no global window, no shuffle of
    the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash60(F.concat(F.lit(WEIGHTED_SALT), F.col("doc_id").cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    key = (-F.log(u) / w).cast("decimal(28,12)")
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("skey"))
        .orderBy(F.asc("skey"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
        .select("doc_id", "lang", "n_chars", F.round(F.col("skey").cast("double"), 9).alias("skey"))
    )


_WS_HASH = md5_hash60_sql(f"'{WEIGHTED_SALT}' || CAST(doc_id AS VARCHAR)")

WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars, ROUND(CAST(skey AS DOUBLE), 9) AS skey FROM (
  SELECT doc_id, lang, n_chars,
         CAST(-ln(({_WS_HASH} + 1) / CAST({2**60} AS DOUBLE))
              / GREATEST(n_chars, 1) AS DECIMAL(28,12)) AS skey
  FROM documents
) t ORDER BY skey, doc_id LIMIT {WEIGHTED_K}
"""


QUERIES = {
    "doc_splits": doc_splits,
    "doc_sample_stratified": doc_sample_stratified,
    "reservoir_sample": reservoir_sample,
    "training_shuffle": training_shuffle,
    "weighted_sample": weighted_sample,
}

ORACLE_SQL = {
    "doc_splits": DOC_SPLITS_SQL,
    "doc_sample_stratified": DOC_SAMPLE_STRATIFIED_SQL,
    "reservoir_sample": RESERVOIR_SAMPLE_SQL,
    "training_shuffle": TRAINING_SHUFFLE_SQL,
    "weighted_sample": WEIGHTED_SAMPLE_SQL,
}
