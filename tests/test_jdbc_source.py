"""S1 source parity: the reference's actual source is a SQLite SQL scan
with a hand-written 5-column projection (main.go:97-106, 130). These
tests cover the engine's three source branches: the pure JDBC option
contract (always), the stdlib-sqlite ingestion fallback end-to-end
(always — this container ships no JDBC driver jar), and the real
spark.read.format("jdbc") path (skipped unless a sqlite-jdbc jar is on
the classpath)."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from capstone_etl_spark.sources.tables import (
    DOCUMENT_COLUMNS,
    jdbc_options,
    load_table_jdbc,
    load_table_sqlite,
)

ROWS = [
    (
        "Cooking",
        "https://en.wikibooks.org/wiki/Cooking",
        "A cookbook",
        "Stir the pot gently",
        '<a href="https://x">link</a>',
    ),
    (
        "Cooking/Soup",
        "https://en.wikibooks.org/wiki/Cooking/Soup",
        "Soup chapter",
        "Simmer the soup slowly",
        "",
    ),
    (
        "Math",
        "https://en.wikibooks.org/wiki/Math",
        "Numbers & more",
        "Add the numbers; carry the one!",
        '<a href="https://y">y</a><a href="https://z">z</a>',
    ),
]


@pytest.fixture
def sqlite_db(tmp_path):
    path = str(tmp_path / "en_wikibooks.sqlite")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE en (title TEXT, url TEXT, abstract TEXT, "
        "body_text TEXT, body_html TEXT, unused_extra TEXT)"
    )
    con.executemany(
        "INSERT INTO en (title, url, abstract, body_text, body_html) "
        "VALUES (?, ?, ?, ?, ?)",
        ROWS,
    )
    con.commit()
    con.close()
    return path


def test_jdbc_options_pushdown_projection():
    """Unpartitioned reads push the exact 5-column projection into the
    database via the `query` option — the database never materializes
    unused columns."""
    opts = jdbc_options("jdbc:sqlite:/tmp/x.db", "en", columns=DOCUMENT_COLUMNS)
    assert opts["query"] == (
        "SELECT title, url, abstract, body_text, body_html FROM en"
    )
    assert "dbtable" not in opts


def test_jdbc_options_partitioned_subquery():
    """Partitioned reads keep the projection database-side as a
    subquery dbtable and carry the range-split contract Spark turns
    into num_partitions concurrent queries."""
    opts = jdbc_options(
        "jdbc:postgresql://h/db",
        "en",
        columns=("rowid", "url"),
        partition_column="rowid",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["dbtable"] == "(SELECT rowid, url FROM en) spark_src"
    assert opts["partitionColumn"] == "rowid"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")
    assert opts["numPartitions"] == "16"
    assert "query" not in opts


def test_sqlite_local_ingestion_and_downstream(spark, sqlite_db):
    """The jar-less path: stdlib-sqlite batched ingestion produces the
    reference's exact 5-column relation, and the engine's downstream
    operators run green on it (clean → tokenize → TF — the semantic
    heart of the reference pipeline)."""
    from capstone_etl_spark.operators.tokenize import term_frequencies

    docs = load_table_sqlite(spark, sqlite_db, "en", columns=DOCUMENT_COLUMNS)
    assert docs.columns == list(DOCUMENT_COLUMNS)
    got = {r.url: r for r in docs.collect()}
    assert len(got) == len(ROWS)
    assert got[ROWS[0][1]].body_text == "Stir the pot gently"
    # projection excluded the unused column
    assert "unused_extra" not in docs.columns

    tf = term_frequencies(docs, id_col="url", text_col="body_text")
    counts = {(r.doc_id, r.token): r.qty for r in tf.collect()}
    # 'the' is a stopword in the reference's 667-entry table → gated
    assert not any(tok == "the" for _, tok in counts)
    assert counts[(ROWS[1][1], "soup")] == 1


def _sqlite_jdbc_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.sqlite.JDBC")
        return True
    except Exception:
        return False


def test_jdbc_read_sqlite(spark, sqlite_db):
    """The real JDBC scan against the reference-shaped SQLite file —
    runs wherever a sqlite-jdbc jar is on the Spark classpath."""
    if not _sqlite_jdbc_available(spark):
        pytest.skip("no org.sqlite.JDBC driver jar on the classpath")
    docs = load_table_jdbc(
        spark,
        f"jdbc:sqlite:{sqlite_db}",
        "en",
        columns=DOCUMENT_COLUMNS,
        driver="org.sqlite.JDBC",
    )
    assert docs.columns == list(DOCUMENT_COLUMNS)
    assert sorted(r.url for r in docs.collect()) == sorted(r[1] for r in ROWS)
    # order matches the reference's ORDER BY url when applied engine-side
    ordered = [r.title for r in docs.orderBy("url").collect()]
    assert ordered == [r[0] for r in sorted(ROWS, key=lambda t: t[1])]
