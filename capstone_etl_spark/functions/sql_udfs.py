"""SQL-surface registration of the engine's core column functions.

The reference user programs against Go helpers (`clean` main.go:285,
`strings.Fields` tokenize main.go:247, the URL derivations
main.go:194-195); the engine's DataFrame users get them from
functions/text.py. This module closes the loop for the SQL-ONLY user:
`register_sql_functions(spark)` creates Spark 4 SQL scalar UDFs
(`CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>`) so the
identical semantics are callable from `spark.sql(...)` with no Python
round-trip — a SQL UDF is inlined into the Catalyst plan at resolution
time, so it stays inside whole-stage codegen exactly like the
DataFrame form (NOT a slow-path UDF; test_sql_udfs pins plan parity).

Names are prefixed `engine_` to keep the session catalog unambiguous.
Each body is the Column expression from functions/text.py /
functions/hashing.py transcribed to SQL — equivalence is test-pinned
per function against the Python builder on the real corpus.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# (name, signature, return type, body) — bodies mirror functions/text.py
# and functions/hashing.py expression-for-expression.
_FUNCTIONS: tuple[tuple[str, str, str, str], ...] = (
    (
        "engine_clean",
        "(t STRING)",
        "STRING",
        "regexp_replace(t, '[^a-zA-Z0-9 ]', '')",
    ),
    (
        "engine_clean_spaced",
        "(t STRING)",
        "STRING",
        "regexp_replace(t, '[^a-zA-Z0-9 ]', ' ')",
    ),
    (
        "engine_tokenize",
        "(t STRING)",
        "ARRAY<STRING>",
        "CASE WHEN trim(lower(regexp_replace(t, '[^a-zA-Z0-9 ]', ''))) = '' "
        "THEN CAST(array() AS ARRAY<STRING>) "
        "ELSE split(trim(lower(regexp_replace(t, '[^a-zA-Z0-9 ]', ''))), ' +') END",
    ),
    (
        "engine_hash60",
        "(s STRING)",
        "BIGINT",
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)",
    ),
    (
        "engine_count_substring",
        "(t STRING, needle STRING)",
        "BIGINT",
        # literal-substring count via the same split(-1) identity as
        # count_substring; the needle is regex-quoted with \Q...\E.
        # A needle containing the literal \E is split-and-rejoined
        # (Pattern.quote's recipe, matching count_substring); an empty
        # needle yields length-based counts — pinned engine semantics.
        r"CAST(size(split(t, concat('\\Q', replace(needle, '\\E', '\\E\\\\E\\Q'), '\\E'), -1)) - 1 AS BIGINT)",
    ),
    (
        "engine_page_loc",
        "(url STRING, prefix STRING)",
        "STRING",
        "CASE WHEN startswith(url, prefix) "
        "THEN substring(url, length(prefix) + 1, length(url)) "
        "ELSE CAST(NULL AS STRING) END",
    ),
    (
        "engine_parent_path",
        "(loc STRING)",
        "STRING",
        "CASE WHEN loc IS NULL THEN CAST(NULL AS STRING) "
        "WHEN size(split(loc, '/')) <= 1 THEN '' "
        "ELSE array_join(slice(split(loc, '/'), 1, size(split(loc, '/')) - 1), '/') END",
    ),
)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create (or replace) every engine SQL function in the current
    session; returns the registered names."""
    names = []
    for name, sig, ret, body in _FUNCTIONS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
