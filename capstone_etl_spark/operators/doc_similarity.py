"""Sparse document-to-document cosine similarity over TF vectors.

The reference computes per-doc `EuclidianNorm` "for use later with
similarities" (main.go:62, :272-281) but never finishes the job — this
operator completes the intent: cosine over the SPARSE term-frequency
vectors, computed relationally through the inverted index, never
through dense vectors.

Plan shape (the classic sparse-similarity join):
    tf(doc, token, qty)  — cached, one tokenize pass
    dot(a,b)  = Σ_token qty_a · qty_b   via self-join on token
    ‖doc‖²    = Σ qty²                  (the reference's norm, exact)
    cos(a,b)  = dot / (‖a‖·‖b‖)
    top-k     = row_number over each query doc's scored neighbors

Exactness: qty are integers, so dot and norm² are EXACT int64 sums —
order-independent, hash-identical across engines; the only floats are
two sqrts and one divide at the end (IEEE-deterministic), rounded 6dp.

Scale design (100 TB):
- the token self-join is the inverted-index join: cost Σ_token df² —
  bounded by capping document frequency (drop tokens in > max_df docs;
  they carry no discrimination). The stopword gate already removed the
  Zipf head; max_df is the long-tail guard. The cap is OFF at driver
  test scale (29-token synthetic vocab — every token is hot) and the
  knob is part of the operator contract.
- shuffle keys: token (join), then (doc_a, doc_b) (agg), then doc_a
  (rank) — all high-cardinality, unskewed after the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from capstone_etl_spark.operators.tokenize import term_frequencies
from capstone_etl_spark.operators.text_pipeline import _TF_CTE
from capstone_etl_spark.sources.tables import load_table
from capstone_etl_spark.session import cached

TOP_K = 5


def doc_cosine_pairs(tf: DataFrame, max_df: int | None = None) -> DataFrame:
    """(doc_a, doc_b, cos) for doc_a < doc_b over shared tokens."""
    if max_df is not None:
        keep = tf.groupBy("token").agg(F.count("*").alias("df")).filter(
            F.col("df") <= max_df
        )
        tf = tf.join(keep.select("token"), "token", "left_semi")
    norms = tf.groupBy("doc_id").agg(F.sum(F.col("qty") * F.col("qty")).alias("n2"))
    a = tf.select(F.col("doc_id").alias("doc_a"), "token", F.col("qty").alias("qa"))
    b = tf.select(F.col("doc_id").alias("doc_b"), "token", F.col("qty").alias("qb"))
    dots = (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2_b"))
    cos = F.col("dot") / (
        F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double"))
    )
    return (
        dots.join(na, "doc_a").join(nb, "doc_b").select(
            "doc_a", "doc_b", F.round(cos, 6).alias("cos")
        )
    )


def doc_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most TF-cosine-similar documents per document."""
    tf = term_frequencies(load_table(spark, sf_dir, "documents")).transform(cached)
    pairs = doc_cosine_pairs(tf)
    directed = pairs.select(
        F.col("doc_a").alias("query_doc"), F.col("doc_b").alias("neighbor_doc"), "cos"
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("query_doc"), F.col("doc_a").alias("neighbor_doc"), "cos"
        )
    )
    w = Window.partitionBy("query_doc").orderBy(F.desc("cos"), F.asc("neighbor_doc"))
    return (
        directed.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_doc", "neighbor_doc", "cos", "rnk")
    )


DOC_SIMILARITY_TOPK_SQL = _TF_CTE + f"""
, norms AS (
  SELECT doc_id, CAST(SUM(qty * qty) AS BIGINT) AS n2 FROM tf GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.qty * b.qty) AS BIGINT) AS dot
  FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b,
         ROUND(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos
  FROM dots
  JOIN norms na ON na.doc_id = doc_a
  JOIN norms nb ON nb.doc_id = doc_b
), directed AS (
  SELECT doc_a AS query_doc, doc_b AS neighbor_doc, cos FROM pairs
  UNION ALL
  SELECT doc_b AS query_doc, doc_a AS neighbor_doc, cos FROM pairs
)
SELECT query_doc, neighbor_doc, cos, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc ORDER BY cos DESC, neighbor_doc) AS rnk
  FROM directed
) t WHERE rnk <= {TOP_K}
"""


QUERIES = {"doc_similarity_topk": doc_similarity_topk}
ORACLE_SQL = {"doc_similarity_topk": DOC_SIMILARITY_TOPK_SQL}
