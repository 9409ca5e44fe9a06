"""Text analysis operators for training-data pipelines (north-star set):
language-ID, quality scoring, token counting, document fingerprinting.

All expression-native (no UDFs): per-document column math over the
tokenizer building blocks — embarrassingly parallel, no shuffle except
the explode+argmax in language scoring. Each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from capstone_etl_spark.functions.hashing import MERSENNE_P, md5_hash60_sql
from capstone_etl_spark.functions.stopwords import STOPWORDS, stopwords_sql_in_list
from capstone_etl_spark.functions.text import tokenize
from capstone_etl_spark.sources.tables import load_table

FP_BASE = 1_000_003  # rolling-hash base; acc·B + h stays < 2^52 (exact)

# Marker tokens per language for the n-gram/stopword-hit heuristic.
# (Real corpora: character n-gram profiles; the *operator shape* —
# score against K profiles, argmax with deterministic tiebreak — is
# identical.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por", "para", "y"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "et"),
    "zh": ("de", "shi", "bu", "le", "wo", "ni", "ta", "men", "zai", "you"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score panel per document: lengths, alpha/digit/space
    ratios, stopword ratio, mean token length — the classic heuristic
    filter stack (C4/Gopher-style) as pure column math."""
    docs = _docs(spark, sf_dir)
    toks = tokenize("text")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(list(STOPWORDS))))
    text_len = F.length("text")
    alpha_len = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    digit_len = F.length(F.regexp_replace("text", "[^0-9]", ""))
    space_len = F.length(F.regexp_replace("text", "[^ ]", ""))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        text_len.cast("long").alias("text_len"),
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(None)).alias("stopword_ratio"),
        F.when(text_len > 0, alpha_len.cast("double") / text_len).otherwise(F.lit(None)).alias("alpha_ratio"),
        F.when(text_len > 0, digit_len.cast("double") / text_len).otherwise(F.lit(None)).alias("digit_ratio"),
        F.when(text_len > 0, space_len.cast("double") / text_len).otherwise(F.lit(None)).alias("space_ratio"),
        F.when(n_tok > 0, tok_chars.cast("double") / n_tok).otherwise(F.lit(None)).alias("mean_token_len"),
    )


TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), ' +'),
                     t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id,
       length(text) AS text_len,
       len(toks) AS n_tokens,
       len(list_filter(toks, t -> t IN ({stopwords_sql_in_list(STOPWORDS)}))) AS n_stopwords,
       CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> t IN ({stopwords_sql_in_list(STOPWORDS)}))) AS DOUBLE) / len(toks) END AS stopword_ratio,
       CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
       CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio,
       CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / length(text) END AS space_ratio,
       CASE WHEN len(toks) > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) END AS mean_token_len
FROM base
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace fields vs a BPE-ish regex
    segmentation (letter runs | digit runs | single other-glyphs) —
    the standard pre-tokenizer shape."""
    docs = _docs(spark, sf_dir)
    ws = F.size(tokenize("text"))
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        (F.length("text") / F.greatest(bpe, F.lit(1))).alias("chars_per_token"),
    )


TOKEN_COUNTS_SQL = """
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), ' +'),
                         t -> t <> '')) AS ws,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe
  FROM documents
)
SELECT doc_id, ws AS n_ws_tokens, bpe AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE) / greatest(bpe, 1) AS chars_per_token
FROM base
"""


def doc_fingerprint_df(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the token-hash stream, fp = fold((acc·B + h) mod p) — content AND
    order sensitive, constant memory, exact int64 on both engines."""
    toks = tokenize("text")
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % MERSENNE_P
    )
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_BASE + h) % MERSENNE_P,
    )
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.size(toks).cast("long").alias("n_tokens")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint_df(_docs(spark, sf_dir))


DOC_FINGERPRINT_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), ' +'),
                     t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT, list_transform(toks, t -> {md5_hash60_sql('t')} % {MERSENNE_P})),
         (acc, h) -> (acc * {FP_BASE} + h) % {MERSENNE_P}
       ) AS fingerprint,
       len(toks) AS n_tokens
FROM base
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: score each doc's token set against K
    language marker profiles; argmax with lexicographic tiebreak;
    'und' when no profile hits. Compared against the corpus's labeled
    lang column for an accuracy readout downstream."""
    docs = _docs(spark, sf_dir)
    toks = tokenize("text")
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(list(words)))).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)  # lexicographic-stable tiebreak: the
    # alphabetically-first language among ties wins (mirrored in the SQL
    # CASE below, which iterates the same sorted order)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("long").alias("best_score"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


_LANG_CASE = " ".join(
    f"WHEN {_lang_score_sql(lg)} = best THEN '{lg}'" for lg in sorted(LANG_MARKERS)
)

LANGUAGE_ID_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))), ' +'),
                     t -> t <> '') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang, toks,
         greatest({", ".join(_lang_score_sql(lg) for lg in LANG_MARKERS)}) AS best
  FROM base
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN best = 0 THEN 'und' {_LANG_CASE} END AS predicted_lang,
       best AS best_score
FROM scored
"""


QUERIES = {
    "text_quality": text_quality,
    "token_counts": token_counts,
    "doc_fingerprint": doc_fingerprint,
    "language_id": language_id,
}

ORACLE_SQL = {
    "text_quality": TEXT_QUALITY_SQL,
    "token_counts": TOKEN_COUNTS_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "language_id": LANGUAGE_ID_SQL,
}
