"""Deterministic distinct-count sketching: KMV (k-minimum values).

Extension layer — approximate counting is how a 100 TB pipeline audits
cardinalities (distinct n-grams per source, vocabulary growth, URL
spaces) without paying an exact count-distinct shuffle of the full key
stream. Spark's native approx_count_distinct (HLL++) is
engine-specific, so it can never be oracle-checked value-for-value;
the KMV estimator (Bar-Yossef et al. 2002) over the repo's portable
60-bit md5 hash is fully deterministic: both engines find the SAME
k-th smallest hash and therefore the SAME estimate — an approximate
algorithm under an exact cross-engine test (test_sketches.py covers
the native HLL path's accuracy separately).

Estimator: with k minima over a hash space of size M = 2^60,
D̂ = (k−1)·M / h_(k). When a group has fewer than k distinct hashes
the sketch IS the exact set — fall back to the exact count (standard
KMV behavior). K=256 ⇒ ~1/√(k−2) ≈ 6% relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from capstone_etl_spark.functions.hashing import md5_hash60, md5_hash60_sql
from capstone_etl_spark.functions.text import token_ngrams, tokenize
from capstone_etl_spark.session import cached
from capstone_etl_spark.sources.tables import load_table

KMV_K = 256
NGRAM_N = 3
HASH_SPACE = float(2**60)   # md5_hash60 range; exact power of two in double


def kmv_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle cardinality: exact count, KMV-256
    estimate, and the estimate's relative error (the audit row a
    corpus-accounting job emits per source).

    Plan: one tokenize+n-gram pass → distinct (source, hash) — the only
    corpus-scale shuffle, shared via cache by the exact count and the
    k-th-minimum selection. The rank window partitions per source over
    its DISTINCT hash set (vocabulary-bounded, like corpus_drift — not
    corpus-bounded); at true 100 TB the same selection drops to a
    per-partition bottom-k merge, the sketch's defining property (k
    values per group are all that ever cross the wire). The estimate is
    pure double arithmetic on the identical integer h_k, so DuckDB
    reproduces it bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", tokenize("text").alias("toks"))
    grams = toks.select("source", F.explode(token_ngrams("toks", NGRAM_N)).alias("shingle"))
    hashed = cached(
        grams.select("source", md5_hash60(F.col("shingle")).alias("h")).distinct()
    )
    counts = hashed.groupBy("source").agg(F.count("*").alias("n_exact"))
    w = Window.partitionBy("source").orderBy("h")
    kth = (
        hashed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == KMV_K)
        .select("source", F.col("h").alias("hk"))
    )
    est_raw = F.lit(float(KMV_K - 1)) * F.lit(HASH_SPACE) / F.col("hk")
    est = F.when(F.col("hk").isNull(), F.col("n_exact").cast("double")).otherwise(est_raw)
    return counts.join(kth, "source", "left").select(
        "source",
        "n_exact",
        F.round(est, 6).alias("kmv_estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
    )


KMV_DISTINCT_SHINGLES_SQL = f"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), ' +'),
                     t -> t <> '') AS t
  FROM documents
), grams AS (
  SELECT source, array_to_string(t[i : i + {NGRAM_N} - 1], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {NGRAM_N} + 2)) AS i) r
  WHERE len(t) >= {NGRAM_N}
), hashed AS (
  SELECT DISTINCT source, {md5_hash60_sql('shingle')} AS h FROM grams
), counts AS (
  SELECT source, COUNT(*) AS n_exact FROM hashed GROUP BY source
), kth AS (
  SELECT source, h AS hk FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rnk FROM hashed
  ) t WHERE rnk = {KMV_K}
), est AS (
  SELECT c.source, c.n_exact,
         CASE WHEN k.hk IS NULL THEN CAST(c.n_exact AS DOUBLE)
              ELSE CAST({float(KMV_K - 1)} AS DOUBLE) * CAST({HASH_SPACE!r} AS DOUBLE) / k.hk
         END AS e
  FROM counts c LEFT JOIN kth k USING (source)
)
SELECT source, n_exact,
       ROUND(e, 6) AS kmv_estimate,
       ROUND(ABS(e - n_exact) / n_exact, 6) AS rel_error
FROM est
"""


QUERIES = {
    "kmv_distinct_shingles": kmv_distinct_shingles,
}

ORACLE_SQL = {
    "kmv_distinct_shingles": KMV_DISTINCT_SHINGLES_SQL,
}
