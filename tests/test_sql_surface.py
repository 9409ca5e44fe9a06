"""The engine's SQL surface: the same queries users write through
`spark.sql(...)` over registered views must equal the DataFrame forms.
The reference has no SQL parser at all (hard-coded pipeline); this
engine inherits Spark SQL — these tests pin that the inherited surface
actually reproduces the DataFrame operators (same Catalyst plans, same
results), so a SQL-only user gets the documented semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from capstone_etl_spark.operators.relational import pricing_summary
from capstone_etl_spark.operators.tokenize import term_frequencies
from capstone_etl_spark.functions.stopwords import STOPWORDS
from capstone_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pdf(df) -> pd.DataFrame:
    return df.toPandas().sort_values(list(df.columns), ignore_index=True)


def test_sql_pricing_summary_equals_dataframe(spark):
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem_v")
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem_v
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    want = pricing_summary(spark, SF_DIR)
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))


def test_sql_term_frequencies_equals_dataframe(spark):
    """The text pipeline through pure SQL (regexp clean, split,
    explode via LATERAL VIEW, stopword NOT IN, hash agg)."""
    load_table(spark, SF_DIR, "documents").createOrReplaceTempView("documents_v")
    stop_list = ", ".join("'" + w + "'" for w in sorted(STOPWORDS))
    got = spark.sql(
        f"""
        SELECT doc_id, token, COUNT(*) AS qty
        FROM documents_v
        LATERAL VIEW explode(
          filter(split(trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))), ' +'),
                 t -> t != '')
        ) AS token
        WHERE token NOT IN ({stop_list})
        GROUP BY doc_id, token
        """
    )
    want = term_frequencies(load_table(spark, SF_DIR, "documents"))
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))
