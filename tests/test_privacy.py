"""PII scan/redaction and boilerplate-line dedup: cross-engine parity
on a corpus that actually CONTAINS PII and shared lines (the main
synthetic corpus is word-soup with neither), plus the semantic
invariants — exact expected counts, redaction idempotence, and the
boilerplate flags really meaning "shared by ≥ MIN_DF documents"."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from capstone_etl_spark.operators.privacy import BOILERPLATE_MIN_DF
from tools.check_correctness import compare

FOOTER = "contact support@example.com | all rights reserved"
ROWS = [
    (0, "write to alice.smith+spam@mail.example.org for details", "en", "web", 54),
    (1, "server at 192.168.10.7 answered\n" + FOOTER, "en", "web", 80),
    (2, "call 555-123-4567 or 555 987 6543 today", "en", "web", 40),
    (3, "order id 123456789012 confirmed", "en", "shop", 31),
    (4, "bob@example.com pinged 10.0.0.1 from 4155550000123", "en", "web", 51),
    (5, "no personal data here at all", "en", "books", 28),
    (6, "ratio 3.14 and version 1.2.3 are not addresses", "en", "books", 46),
    (7, "Unique first line\n" + FOOTER + "\n" + FOOTER, "en", "web", 110),
    (8, "", "en", "web", 0),
    (9, "   \n\t\n", "en", "web", 6),
]
NAMES = ["pii_scan", "pii_redaction", "boilerplate_lines"]


@pytest.fixture(scope="module")
def pii_sf(tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("pii")
    pdf = pd.DataFrame(
        ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(pii_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pii_sf}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", NAMES)
def test_privacy_matches_oracle_on_pii_corpus(spark, pii_sf, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark_pdf = qs[name](spark, pii_sf).toPandas()
    duck_pdf = duck.execute(oracles[name]).df()
    assert compare(name, spark_pdf, duck_pdf) == []


def test_pii_scan_exact_counts(spark, pii_sf):
    from capstone_etl_spark.operators.privacy import pii_scan

    by_src = {r.source: r for r in pii_scan(spark, pii_sf).collect()}
    web = by_src["web"]
    # emails: doc0 (1), doc1 footer (1), doc4 (1), doc7 footer ×2 = 5
    assert web.emails == 5
    # ipv4s: doc1 (1), doc4 (1); doc6's 1.2.3 / 3.14 must NOT match
    assert web.ipv4s == 2
    # phones: doc2 has two (dash- and space-separated)
    assert web.phones == 2
    # idnums: doc4's 13-digit run (doc3 is source=shop)
    assert web.idnums == 1
    assert by_src["shop"].idnums == 1 and by_src["shop"].docs_with_pii == 1
    assert by_src["books"].docs_with_pii == 0
    assert web.docs_with_pii == 5  # docs 0,1,2,4,7


def test_pii_redaction_masks_and_is_idempotent(spark, pii_sf):
    from capstone_etl_spark.operators.privacy import PII_CLASSES, pii_redaction

    import re

    rows = {r.doc_id: r for r in pii_redaction(spark, pii_sf).collect()}
    assert rows[0].text_redacted == "write to <email> for details"
    assert rows[4].text_redacted == "<email> pinged <ipv4> from <idnum>"
    assert rows[2].n_redacted == 2 and "<phone>" in rows[2].text_redacted
    assert rows[5].n_redacted == 0 and rows[5].text_redacted == ROWS[5][1]
    # idempotence: nothing PII-shaped survives a redaction pass
    for r in rows.values():
        for _n, pat, _m in PII_CLASSES:
            assert not re.search(pat, r.text_redacted), (r.doc_id, pat)


def test_boilerplate_flags_mean_shared_lines(spark, pii_sf):
    from capstone_etl_spark.operators.privacy import boilerplate_lines

    rows = {r.doc_id: r for r in boilerplate_lines(spark, pii_sf).collect()}
    assert set(rows) == set(range(10))
    # the footer is in docs 1 and 7 → flagged everywhere it occurs,
    # including BOTH copies inside doc 7
    assert rows[1].n_lines == 2 and rows[1].n_boilerplate == 1
    assert rows[7].n_lines == 3 and rows[7].n_boilerplate == 2
    assert rows[7].kept_ratio == pytest.approx(1 / 3)
    # unique single-line docs keep everything
    assert rows[0].n_boilerplate == 0 and rows[0].kept_ratio == 1.0
    # line-less docs (empty / whitespace-only) keep ratio 1.0
    for d in (8, 9):
        assert rows[d].n_lines == 0 and rows[d].kept_ratio == 1.0
    assert BOILERPLATE_MIN_DF == 2
